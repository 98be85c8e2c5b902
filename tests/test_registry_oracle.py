"""Every registry query vs its DuckDB oracle at sf0.001 — the same
comparison the driver's correctness gate performs at sf0.01."""

from __future__ import annotations

import pytest

from dataflow_opinion_analysis_spark import entry_queries
from tests.conftest import SF_DIR, assert_frames_match

_REG = entry_queries.registry()
# indexer_* covered by test_indexer_oracle.py (kept separate: slowest)
_NAMES = [n for n in _REG if not n.startswith("indexer_")]


@pytest.mark.parametrize("name", _NAMES)
def test_registry_query_matches_oracle(spark, duck, name):
    fn, sql = _REG[name]
    sdf = fn(spark, SF_DIR)
    if sql is None:
        assert sdf.count() >= 0
        return
    assert_frames_match(sdf, duck.execute(sql).df())
