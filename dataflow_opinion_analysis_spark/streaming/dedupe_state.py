"""Stateful streaming near-duplicate detection — MinHash fingerprints in
a keyed state store (north_star: "simhash/MinHash fingerprints held in a
keyed state store (flatMapGroupsWithState-style applyInPandasWithState)").

Key   : (soft_title, len_bucket) — the reference's soft-dedupe composite
        key (IndexerPipeline.java:1599-1610).
State : up to MAX_FPRINTS (signature, winner_hash, text_len) fingerprints
        per key, LRU by last-seen micro-batch (bounded state at
        10^12-turn scale; eviction is deliberate recall decay, the same
        trade-off every streaming dedupe makes).
Emit  : (document_hash, is_dupe, winner_document_hash) — a doc is a dupe
        when its MinHash signature matches a stored fingerprint with
        estimated Jaccard >= threshold; otherwise its own fingerprint is
        stored and it becomes a potential winner for later turns.

This catches near-dupes ACROSS micro-batches — the within-batch vote rule
(operators/dedupe.py) cannot. The two are complementary: the batch vote
rule reproduces the reference's semantics; this operator adds the
streaming-native fingerprint memory the reference lacks.

MinHash math is numpy-vectorized over the whole group batch: shingling is
pandas groupby-shift string concat, hashing is one pd.util.hash_array call
over all distinct (row, shingle) pairs of the batch, signatures come from
one np.minimum.at grouped min, and batch-vs-state / batch-vs-batch
similarity are two broadcast equality means. The only remaining loop is
the per-row DECISION (admit vs dupe), which is sequential by nature
(earlier batch rows become candidate winners for later ones) and does no
hashing or string work — O(batch + state) numpy indexing per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

K = 32  # minhash permutations
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5
MAX_FPRINTS = 256
P = 2147483647

_A = (2 * np.arange(K, dtype=np.int64) + 1).reshape(1, K)
_B = (np.arange(K, dtype=np.int64) ** 2 + 7).reshape(1, K)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("document_hash", T.StringType()),
        T.StructField("soft_title", T.StringType()),
        T.StructField("len_bucket", T.IntegerType()),
        T.StructField("is_dupe", T.BooleanType()),
        T.StructField("winner_document_hash", T.StringType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("sigs", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("hashes", T.ArrayType(T.StringType())),
        T.StructField("last_seen", T.ArrayType(T.IntegerType())),
        T.StructField("clock", T.IntegerType()),
    ]
)


def batch_signatures(texts: pd.Series) -> np.ndarray:
    """MinHash signatures for a WHOLE batch, no per-row Python:

    tokenize (vectorized str.findall) -> explode -> 3-gram shingles via
    groupby-shift string concat -> one pd.util.hash_array over all
    distinct (row, shingle) pairs (deterministic, C-level) -> grouped
    column-min via np.minimum.at. Rows with no shingles keep the all-P
    sentinel signature."""
    n = len(texts)
    sigs = np.full((n, K), P, dtype=np.int64)
    toks = texts.fillna("").str.lower().str.findall(r"[a-z0-9']+")
    e = toks.explode().dropna()
    if e.empty:
        return sigs
    df = pd.DataFrame({"row": e.index.to_numpy(), "tok": e.to_numpy(dtype=object)})
    g = df.groupby("row")["tok"]
    t1, t2 = g.shift(-1), g.shift(-2)
    full_mask = t2.notna().to_numpy()
    sh_rows = df["row"].to_numpy()[full_mask]
    sh_vals = (
        df["tok"].to_numpy(dtype=object)[full_mask]
        + " " + t1.to_numpy(dtype=object)[full_mask]
        + " " + t2.to_numpy(dtype=object)[full_mask]
    )
    # rows with < SHINGLE_N tokens fall back to one whole-text shingle
    counts = df.groupby("row").size()
    short = counts[counts < SHINGLE_N]
    if len(short):
        short_sh = df[df["row"].isin(short.index)].groupby("row")["tok"].agg(" ".join)
        sh_rows = np.concatenate([sh_rows, short_sh.index.to_numpy()])
        sh_vals = np.concatenate([sh_vals, short_sh.to_numpy(dtype=object)])
    pairs = pd.DataFrame({"row": sh_rows, "sh": sh_vals}).drop_duplicates()
    h = (
        pd.util.hash_array(pairs["sh"].to_numpy(dtype=object)).astype(np.int64)
        & 0xFFFFFFFF
    ).reshape(-1, 1)
    perms = (h * _A + _B) % P  # (n_shingles, K)
    np.minimum.at(sigs, pairs["row"].to_numpy(), perms)
    return sigs


def minhash_signature(text: str) -> np.ndarray:
    """Single-text convenience wrapper (tests); batches use batch_signatures."""
    return batch_signatures(pd.Series([text]))[0]


def dedupe_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    soft_title, len_bucket = key
    if state.exists:
        sigs_l, hashes, last_seen, clock = state.get
        sigs = np.array([list(s) for s in sigs_l], dtype=np.int64) if sigs_l else np.zeros((0, K), np.int64)
        hashes = list(hashes)
        last_seen = list(last_seen)
        clock = int(clock)
    else:
        sigs = np.zeros((0, K), dtype=np.int64)
        hashes, last_seen, clock = [], [], 0
    clock += 1

    out_frames = []
    if not state.hasTimedOut:
        for pdf in pdfs:
            if not len(pdf):
                continue
            b = len(pdf)
            batch_sigs = batch_signatures(pdf["text"].reset_index(drop=True))
            doc_hashes = pdf["document_hash"].to_numpy(dtype=object)
            # all similarity math up front, two broadcast equality-means:
            # batch x stored-state and batch x batch (earlier-row winners)
            if sigs.shape[0]:
                sim_state = (batch_sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
            else:
                sim_state = np.zeros((b, 0))
            sim_batch = (batch_sigs[:, None, :] == batch_sigs[None, :, :]).mean(axis=2)
            # decision pass: sequential by construction (an admitted row
            # becomes a candidate winner for later rows) but does only
            # O(state + batch) numpy indexing per row — no hashing, no
            # string work, no pandas calls
            admitted = np.zeros(b, dtype=bool)
            is_dupe = np.zeros(b, dtype=bool)
            winner = np.empty(b, dtype=object)
            est = np.zeros(b, dtype=np.float64)
            new_idx: list[int] = []
            for i in range(b):
                best_s = float(sim_state[i].max()) if sim_state.shape[1] else 0.0
                row_prior = sim_batch[i, :i] * admitted[:i]
                best_b = float(row_prior.max()) if i else 0.0
                best = max(best_s, best_b)
                est[i] = best
                if best >= JACCARD_THRESHOLD:
                    is_dupe[i] = True
                    if best_s >= best_b:  # ties resolve to stored state (older)
                        j = int(sim_state[i].argmax())
                        winner[i] = hashes[j]
                        last_seen[j] = clock
                    else:
                        winner[i] = doc_hashes[int(row_prior.argmax())]
                else:
                    admitted[i] = True
                    winner[i] = doc_hashes[i]
                    new_idx.append(i)
            if new_idx:
                sigs = np.vstack([sigs, batch_sigs[new_idx]])
                hashes.extend(doc_hashes[new_idx].tolist())
                last_seen.extend([clock] * len(new_idx))
            out = pdf[["document_hash"]].copy()
            out["soft_title"] = soft_title
            out["len_bucket"] = np.int32(len_bucket)
            out["is_dupe"] = is_dupe
            out["winner_document_hash"] = winner
            out["est_jaccard"] = est
            out_frames.append(out)

    # LRU eviction to bound state
    if len(hashes) > MAX_FPRINTS:
        order = np.argsort(last_seen)[::-1][:MAX_FPRINTS]
        keep = sorted(order.tolist())
        sigs = sigs[keep]
        hashes = [hashes[i] for i in keep]
        last_seen = [last_seen[i] for i in keep]

    if hashes:
        state.update(
            ([s.tolist() for s in sigs], hashes, [int(x) for x in last_seen], clock)
        )
    else:
        state.remove()

    for f in out_frames:
        yield f


def stateful_near_dedupe(stream: DataFrame) -> DataFrame:
    """Streaming near-dup verdicts: input needs (document_hash, title,
    text) columns; keys by the reference soft key."""
    from dataflow_opinion_analysis_spark.operators.dedupe import with_soft_key

    keyed = with_soft_key(stream).select(
        F.col("document_hash"), "soft_title", "len_bucket", "text"
    )
    # NoTimeout: with ProcessingTimeTimeout the engine runs continuous
    # no-data micro-batches to evaluate timeouts (processAllAvailable never
    # settles). State growth is bounded by the LRU cap per key instead; a
    # watermarked production stream can use EventTimeTimeout like the
    # thread assembler.
    return keyed.groupBy("soft_title", "len_bucket").applyInPandasWithState(
        dedupe_state_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
