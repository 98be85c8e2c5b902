"""Semantic + plan tests for operators/curation.py (decontamination,
repetition rules, shard assignment, per-source caps). Oracle parity at
sf0.001 is covered by test_registry_oracle.py; these pin the semantics
the oracle comparison alone can't (injection detection, shard
contiguity, salted-vs-plain equality, physical write layout)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataflow_opinion_analysis_spark.operators import curation
from tests.conftest import SF_DIR
from tests.test_plan_guards import assert_clean, plan_of


@pytest.fixture(scope="module")
def decon(spark):
    return curation.decontaminate(spark, SF_DIR).toPandas()


def test_decontaminate_flags_injected(decon):
    n_eval = len([i for i in range(500) if i % curation.DECON_EVAL_MOD == curation.DECON_EVAL_REM])
    assert len(decon) == 500 - n_eval
    # eval docs are excluded from the scored corpus
    assert not (decon.doc_id % curation.DECON_EVAL_MOD == curation.DECON_EVAL_REM).any()
    inj = decon[decon.doc_id % curation.DECON_INJECT_MOD == curation.DECON_INJECT_REM]
    assert len(inj) > 0 and bool(inj.contaminated.all()), (
        "every snippet-injected doc must be flagged"
    )
    # the flag is not vacuous: most non-injected docs are clean
    clean = decon[decon.doc_id % curation.DECON_INJECT_MOD != curation.DECON_INJECT_REM]
    assert float(clean.contaminated.mean()) < 0.05


def test_decontaminate_plan_broadcasts_eval(spark):
    curation._docs(spark, SF_DIR)
    df = spark.sql(curation.decontaminate_sql_spark())
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, (
        "the eval n-gram index must broadcast — the corpus side never "
        "shuffles for the probe\n" + plan[:3000]
    )
    # ONE corpus explode + ONE eval explode: a second reference to the
    # corpus-shingle CTE (or to agg) would inline and tokenize the corpus
    # twice (the round-4 sigs-CTE plan smell). GROUPING SETS + the struct
    # -max top-eval fold keep it to one pass per relation.
    import re

    n_generates = len(re.findall(r"\(\d+\) Generate", plan))
    assert n_generates == 2, f"expected 2 Generate nodes, got {n_generates}\n{plan[:2000]}"
    assert_clean(df, "decontaminate")


def test_quality_repetition_separates(spark):
    df = curation.quality_repetition(spark, SF_DIR).toPandas()
    assert len(df) == 500
    inj = df[df.doc_id % curation.REP_INJECT_MOD == curation.REP_INJECT_REM]
    clean = df[df.doc_id % curation.REP_INJECT_MOD != curation.REP_INJECT_REM]
    assert (inj.dup4_frac > curation.REP_DUP4_MAX).all(), "injected repetition must fail"
    assert (clean.dup4_frac <= curation.REP_DUP4_MAX).all(), (
        "clean fixture docs have dup4 <= 0.032 — threshold regression"
    )
    assert not inj.passes_repetition.any()
    assert ((df.dup4_frac >= 0) & (df.dup4_frac <= 1)).all()
    assert ((df.distinct_ratio > 0) & (df.distinct_ratio <= 1)).all()


def test_shard_assignment_contiguous(spark):
    df = curation.shard_for_training(spark, SF_DIR).toPandas()
    assert len(df) == 500 and df.doc_id.nunique() == 500
    assert set(df.shard.unique()) <= set(range(curation.N_SHARDS))
    for shard, g in df.groupby("shard"):
        assert sorted(g.pos) == list(range(1, len(g) + 1)), f"shard {shard} gaps"
        assert (g.shard_size == len(g)).all()
    # hash sharding balances: no shard more than 2x the mean
    sizes = df.groupby("shard").size()
    assert sizes.max() <= 2 * sizes.mean()


def test_write_training_shards_layout(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "shards")
    curation.write_training_shards(docs, path)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.select("shard").distinct().count() == curation.N_SHARDS
    # logical assignment matches the physical layout: same doc->shard map
    logical = curation.shard_for_training(spark, SF_DIR).select("doc_id", "shard")
    phys = back.select("doc_id", F.col("shard").cast("bigint").alias("shard"))
    assert logical.exceptAll(phys).count() == 0
    assert phys.exceptAll(logical).count() == 0


def test_cap_per_source_equals_plain_window(spark):
    """The salted two-phase top-k returns exactly the plain-window rows."""
    from pyspark.sql import Window

    out = curation.cap_per_source(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pr = F.expr(curation._hash_u("concat(cast(doc_id AS string), '|cap')"))
    w = Window.partitionBy("source").orderBy(pr.asc(), F.col("doc_id").asc())
    plain = (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= curation.CAP_PER_SOURCE_K)
    )
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0
    per_src = out.groupBy("source").count().toPandas()
    assert (per_src["count"] <= curation.CAP_PER_SOURCE_K).all()


def test_dataprep_optional_curation_stages(spark):
    """build_dataprep(repetition_filter=True, eval_docs=...) composes the
    curation stages between quality_lang and exact dedup: row counts are
    monotone, verbatim eval docs are decontaminated away, and the packed
    output contains only full-chain survivors."""
    from dataflow_opinion_analysis_spark.operators.dataprep_pipeline import (
        build_dataprep,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    eval_docs = docs.filter("doc_id % 100 = 11").select("doc_id", "text")
    st = build_dataprep(spark, docs, repetition_filter=True, eval_docs=eval_docs)
    n_q = st.quality.count()
    n_rep = st.post_repetition.count()
    n_dec = st.post_decontam.count()
    assert n_q >= n_rep >= n_dec
    # a verbatim eval doc in the corpus shares every n-gram with itself
    assert (
        st.post_decontam.join(eval_docs.select("doc_id"), "doc_id", "left_semi")
        .count() == 0
    )
    assert n_dec > 0, "decontamination must not wipe the corpus"
    # composition: every packed doc survived every stage
    assert (
        st.packed.join(st.post_decontam.select("doc_id"), "doc_id", "left_anti")
        .count() == 0
    )


def test_curation_plans_clean(spark):
    curation._docs(spark, SF_DIR)
    assert_clean(spark.sql(curation.quality_repetition_sql_spark()), "quality_repetition")
    assert_clean(spark.sql(curation.shard_sql_spark()), "shard_for_training")
    assert_clean(curation.cap_per_source(spark, SF_DIR), "cap_per_source")


def test_sample_mixture_balances_sources(spark):
    """Temperature (alpha=0.5) mixture sampling: small sources keep a
    LARGER fraction of their docs than big sources, totals land near
    MIX_TARGET, and the keep test is integer-exact deterministic."""
    import pandas as pd

    out = curation.sample_mixture(spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    n_by_src = docs.groupby("source").size()
    kept_by_src = out.groupby("source").size().reindex(n_by_src.index).fillna(0)
    frac = (kept_by_src / n_by_src).sort_index()
    # keep rate per source must be non-increasing in source size
    # (w_s/n_s = floor(sqrt(n))/n decreases in n); compare extremes
    big, small = n_by_src.idxmax(), n_by_src.idxmin()
    if n_by_src[big] > n_by_src[small]:
        assert frac[small] >= frac[big], (n_by_src.to_dict(), frac.to_dict())
    # sampling, not selection-of-everything / nothing
    assert 0 < len(out) < len(docs)
    # deterministic: a second run returns the identical doc set
    out2 = curation.sample_mixture(spark, SF_DIR).toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)
    assert_clean(curation.sample_mixture(spark, SF_DIR), "sample_mixture")
