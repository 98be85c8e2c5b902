"""Property test: the Catalyst soft-dedupe operator is equivalent to the
pandas reference spec (_soft_dedupe_group) on randomized groups, and
dedupe never loses a unique content (FIXTURES.md §5 property list)."""

from __future__ import annotations

import random

import pandas as pd
import pyspark.sql.functions as F

from dataflow_opinion_analysis_spark.operators import dedupe

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _random_rows(rng: random.Random, n_groups=8, max_group=12):
    rows = []
    for g in range(n_groups):
        for i in range(rng.randint(1, max_group)):
            n_tags = rng.randint(0, 5)
            tags = rng.sample(VOCAB, n_tags) if n_tags else []
            rows.append(
                {
                    "expected_document_hash": f"h{g}_{i}",
                    "conv_id": f"c{rng.randint(0, 5)}",
                    "turn_idx": i,
                    "title": f"title-{g % 4}" if g % 3 else None,
                    "text": "x" * rng.randint(10, 3000),
                    "tag_names": tags,
                }
            )
    return rows


def _spec_verdict(rows) -> pd.DataFrame:
    pdf = pd.DataFrame(rows)
    pdf["soft_title"] = pdf["title"].fillna("No Title")
    pdf["len_bucket"] = (pdf["text"].str.len() / 1000.0 + 0.5).astype(int)
    pdf["text_len"] = pdf["text"].str.len()
    pdf = pdf.rename(columns={"expected_document_hash": "document_hash"})
    outs = []
    for _, grp in pdf.groupby(["soft_title", "len_bucket"]):
        outs.append(dedupe._soft_dedupe_group(grp.reset_index(drop=True)))
    return (
        pd.concat(outs, ignore_index=True)
        .sort_values("document_hash")
        .reset_index(drop=True)[["document_hash", "is_dupe", "winner_document_hash"]]
    )


def test_sql_soft_dedupe_matches_pandas_spec(spark):
    rng = random.Random(1234)
    for trial in range(3):
        rows = _random_rows(rng)
        df = spark.createDataFrame(
            [
                (
                    r["expected_document_hash"], r["conv_id"], r["turn_idx"],
                    r["title"], r["text"], r["tag_names"],
                )
                for r in rows
            ],
            "expected_document_hash string, conv_id string, turn_idx int, "
            "title string, text string, tag_names array<string>",
        )
        got = (
            dedupe.soft_dedupe(df)
            .select("document_hash", "is_dupe", "winner_document_hash")
            .toPandas()
            .sort_values("document_hash")
            .reset_index(drop=True)
        )
        want = _spec_verdict(rows)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedupe_never_loses_unique_content(spark):
    """Every distinct content hash survives exact dedupe exactly once."""
    rng = random.Random(7)
    rows = []
    for i in range(200):
        text = f"text variant {rng.randint(0, 50)} is great"
        rows.append((f"c{i % 20}", i // 20, "user", text, None,
                     pd.Timestamp("2024-01-01").to_pydatetime()))
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    from dataflow_opinion_analysis_spark.operators import ingest

    ic = ingest.derive_input_content(t)
    winners, dupes = dedupe.exact_dedupe(ic)
    n_unique = ic.select("content_hash").distinct().count()
    assert winners.count() == n_unique
    assert winners.count() + dupes.count() == ic.count()
    # winners' hashes are exactly the distinct set
    assert winners.select("content_hash").distinct().count() == n_unique
