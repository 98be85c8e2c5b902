"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Seeded numpy, fully vectorized — generates millions of turns per second,
no Spark needed. Used for pytest micro-fixtures and for the bench runs
(2M+ turns at local[8] vs local[32]).

Properties (all deterministic under the seed):
- Zipf(s~1.2)-skewed turns-per-conversation so a few conversations are hot
  (skew / salting tests);
- texts from sentence templates mixing positive/negative/neutral lexicon
  words so the scorer produces nonzero SentimentTotalScore;
- ~2% exact-duplicate texts and ~2% near-duplicates (suffix noise);
- roles cycle user/assistant/tool; role='tool' rows carry a tool name
  (-> skip_indexing=1 path, reference IndexerPipeline.java:1634-1643);
- ~1% of turns out-of-order in ts, ~0.5% later than the watermark.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

EPOCH_2024 = pd.Timestamp("2024-01-01 00:00:00").value // 1_000_000_000  # epoch secs

_POS = ["fast", "great", "excellent", "happy", "love", "win", "improve", "best"]
_NEG = ["slow", "terrible", "fail", "hate", "broken", "worst", "error", "sad"]
_NEU = [
    "join", "merge", "scan", "table", "query", "batch", "stream", "filter",
    "window", "column", "row", "hash", "sort", "group", "data", "spark",
]
_EMO = ["joy", "fear", "anger", "surprise", "trust", "disgust", "guilt", "interest"]


def generate_transcripts(
    n_convs: int = 2000,
    avg_turns: int = 10,
    seed: int = 42,
    zipf_s: float = 1.2,
    start_epoch: int = EPOCH_2024,
    gap_seconds: int = 60,
    session_every: int = 25,
    late_frac: float = 0.005,
    out_of_order_frac: float = 0.01,
    dup_frac: float = 0.02,
    near_dup_frac: float = 0.02,
) -> pd.DataFrame:
    """Return a pandas DataFrame with the transcripts schema."""
    rng = np.random.default_rng(seed)

    # Zipf-ish turn counts, clipped, rescaled to hit ~n_convs*avg_turns total
    raw = rng.zipf(zipf_s, size=n_convs).astype(np.int64)
    raw = np.clip(raw, 1, 50 * avg_turns)
    # rescale (up OR down) toward the requested total, preserving the Zipf
    # shape; min 1 turn per conversation
    scale = (n_convs * avg_turns) / max(1, raw.sum())
    turns_per_conv = np.maximum(1, (raw * scale).astype(np.int64))

    conv_num = np.repeat(np.arange(n_convs), turns_per_conv)
    n = conv_num.size
    # dense turn_idx per conversation
    starts = np.zeros(n_convs + 1, dtype=np.int64)
    np.cumsum(turns_per_conv, out=starts[1:])
    turn_idx = (np.arange(n) - starts[conv_num]).astype(np.int32)

    # roles cycle; tool name on 'tool' turns
    role_cycle = np.array(["user", "assistant", "tool"])
    role = role_cycle[turn_idx % 3]
    tool_names = np.char.add("tool-", (conv_num % 5).astype("U1"))
    tool = np.where(role == "tool", tool_names, None)

    # texts: 3 template slots from seeded choices
    pos = pd.Series(rng.choice(_POS, size=n), dtype=object)
    neg = pd.Series(rng.choice(_NEG, size=n), dtype=object)
    neu1 = pd.Series(rng.choice(_NEU, size=n), dtype=object)
    neu2 = pd.Series(rng.choice(_NEU, size=n), dtype=object)
    emo = pd.Series(rng.choice(_EMO, size=n), dtype=object)
    flavor = rng.integers(0, 3, size=n)
    t0 = "the " + neu1 + " " + neu2 + " is " + pos + " and shows " + emo
    t1 = "this " + neu1 + " was " + neg + " during the " + neu2 + " run"
    t2 = "we saw the " + neu1 + " " + neu2 + " behave with " + emo + " today"
    # a per-row suffix keeps texts unique (real corpora rarely collide), so
    # only the *injected* dups below collapse in dedupe and the scorer sees
    # a realistic document count
    uniq = pd.Series(
        np.char.add(
            np.char.add(" case", conv_num.astype("U8")),
            np.char.add(" step", turn_idx.astype("U6")),
        ),
        dtype=object,
    )
    text = (t0.where(flavor == 0, t1.where(flavor == 1, t2)) + uniq).to_numpy(dtype=object)

    # exact duplicates: copy text of the previous row
    r = rng.random(n)
    dup_mask = (r < dup_frac) & (np.arange(n) > 0)
    text[dup_mask] = text[np.flatnonzero(dup_mask) - 1]
    near_mask = (r >= dup_frac) & (r < dup_frac + near_dup_frac) & (np.arange(n) > 0)
    idx = np.flatnonzero(near_mask)
    text[idx] = text[idx - 1] + " via feed"

    # timestamps: conv start staggered, turns gap_seconds apart, occasional
    # session break (gap far above the session gap) every `session_every`
    # turns. The break is CUMULATIVE within the conversation — every turn
    # after a break shifts by +3600s — so the gap persists and later turns
    # never travel back in time.
    conv_start = start_epoch + conv_num * 7  # stagger 7s per conversation
    session_breaks = (turn_idx > 0) & (turn_idx % session_every == 0)
    brk_total = session_breaks.astype(np.int64).cumsum()
    # per-conversation cumulative count: subtract the running total at the
    # conversation's first turn (turn_idx==0 is never a break, so the value
    # AT the first turn counts only earlier conversations' breaks)
    brk_in_conv = brk_total - brk_total[starts[conv_num]]
    offsets = turn_idx.astype(np.int64) * gap_seconds + brk_in_conv * 3600
    ts_sec = conv_start + offsets

    # out-of-order: swap ts with previous turn
    ooo = (rng.random(n) < out_of_order_frac) & (turn_idx > 0)
    j = np.flatnonzero(ooo)
    ts_sec[j], ts_sec[j - 1] = ts_sec[j - 1].copy(), ts_sec[j].copy()
    # late: push some turns far into the past relative to their conv
    late = rng.random(n) < late_frac
    ts_sec = np.where(late, ts_sec - 86_400, ts_sec)

    return pd.DataFrame(
        {
            "conv_id": pd.Series(conv_num).map(lambda k: f"conv-{k:08d}").astype("string[pyarrow]"),
            "turn_idx": turn_idx,
            "role": pd.Series(role, dtype="string[pyarrow]"),
            "text": pd.Series(text, dtype="string[pyarrow]"),
            "tool": pd.Series(tool, dtype="string[pyarrow]"),
            # tz-aware UTC so parquet marks isAdjustedToUTC and Spark 4
            # reads TIMESTAMP (not TIMESTAMP_NTZ)
            "ts": pd.to_datetime(ts_sec, unit="s", utc=True),
        }
    )


def write_transcripts_parquet(
    out_dir: str,
    n_convs: int = 2000,
    avg_turns: int = 10,
    seed: int = 42,
    n_files: int = 8,
    **kw,
) -> str:
    """Write the generated table as `n_files` parquet files (so the
    file-stream source can replay it as micro-batches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pdf = generate_transcripts(n_convs=n_convs, avg_turns=avg_turns, seed=seed, **kw)
    # arrival order ~= event-time order (how a real stream lands); the
    # injected out-of-order/late rows keep their perturbed ts, so they stay
    # genuinely out of order relative to their neighbors
    pdf = pdf.sort_values("ts", kind="stable").reset_index(drop=True)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    # cast to the exact physical schema (int32 turn_idx, us timestamps)
    tbl = tbl.cast(
        pa.schema(
            [
                pa.field("conv_id", pa.string(), nullable=False),
                pa.field("turn_idx", pa.int32(), nullable=False),
                pa.field("role", pa.string()),
                pa.field("text", pa.string()),
                pa.field("tool", pa.string()),
                pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=False),
            ]
        )
    )
    n = tbl.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = tbl.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"part-{i:04d}.parquet"))
    return out_dir
