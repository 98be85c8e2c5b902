#!/usr/bin/env python3
"""Deterministic 10x scale-up of /root/testdata/sf0.1 for LOCAL measurement only.

The driver generates its own large-scale data (BENCH_r05 ran at sf1.0:
1M events / 50k documents / 20k embeddings / 6M lineitem). That directory
is not present between sessions, so this script synthesizes a same-shape
dataset by replicating sf0.1 K times with consistent id remapping:

- foreign keys stay consistent per copy (customer/orders/lineitem/part/
  supplier offsets move together); nation/region stay fixed (constant at
  every sf, like TPC-H).
- events: user_id space scales with the copy (1500 -> 15000 users, same
  one-month ts span, 10x density) matching the driver's observed shape.
- documents: each copy's texts are deterministic word-level SHUFFLES with
  ~25% vocabulary substitution of the originals — the same marginal word
  distribution but NOT near-dups of their source (the driver's sf1.0 docs
  are independent draws from one distribution: pair counts grow
  quadratically from vocabulary overlap, 724k simhash pairs at sf0.1 ->
  73.3M at sf1.0, while dedupe group sizes stay sf-independent; naive
  identical copies instead create 10-member near-dup groups that blow up
  the indexer/stats family ~6x beyond the driver's measured workload).
- embeddings: tiny deterministic jitter (1e-4 scale) so copies are near-
  but not exactly identical.

Output is for bench-only use (never an oracle input): /root/bench_data/sfN.
"""
import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "shuffle", "join",
]


def copy_table(name: str, tab: pa.Table, k: int, counts: dict) -> pa.Table:
    if k == 0:
        return tab
    cols = {}
    for field in tab.schema:
        col = tab[field.name]
        off = None
        if field.name in ("c_custkey", "o_custkey"):
            off = counts["customer"] * k
        elif field.name in ("o_orderkey", "l_orderkey"):
            off = counts["orders"] * k
        elif field.name in ("l_partkey", "p_partkey"):
            off = counts["part"] * k
        elif field.name in ("l_suppkey", "s_suppkey"):
            off = counts["supplier"] * k
        elif field.name == "event_id":
            off = counts["events"] * k
        elif field.name == "user_id":
            off = 1500 * k
        elif field.name == "doc_id":
            off = counts["documents"] * k
        elif field.name == "vec_id":
            off = counts["embeddings"] * k
        if off is not None:
            col = pc.add(col, pa.scalar(off, type=field.type))
        cols[field.name] = col
    out = pa.table(cols)

    if name == "documents":
        # shuffle each doc's tokens + substitute ~25% from the corpus
        # vocabulary, seeded by (doc_id, copy): same word distribution,
        # but the copy is no longer a near-dup of its source
        ids = out["doc_id"].to_numpy()
        txt = out["text"].to_pandas()
        vocab = counts["_vocab"]
        new_texts = []
        for doc_id, s in zip(ids, txt):
            rng = np.random.Generator(np.random.PCG64(int(doc_id) * 97 + k))
            toks = s.split(" ")
            rng.shuffle(toks)
            sub = rng.random(len(toks)) < 0.25
            repl = rng.integers(0, len(vocab), size=len(toks))
            toks = [vocab[r] if m else t for t, m, r in zip(toks, sub, repl)]
            new_texts.append(" ".join(toks))
        new_txt = np.array(new_texts, dtype=object)
        out = out.set_column(out.schema.get_field_index("text"), "text",
                             pa.array(new_txt, type=pa.string()))
        out = out.set_column(out.schema.get_field_index("n_chars"), "n_chars",
                             pa.array([len(t) for t in new_texts], type=pa.int64()))
    elif name == "embeddings":
        emb = out["embedding"].combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False).copy()
        n = len(out)
        dim = len(vals) // n
        ids = np.repeat(out["vec_id"].to_numpy(), dim)
        idx = np.tile(np.arange(dim), n)
        vals += (((ids * 31 + idx * 7 + k) % 13).astype("float32") - 6.0) * 1e-4
        new = pa.ListArray.from_arrays(emb.offsets, pa.array(vals, type=pa.float32()))
        out = out.set_column(out.schema.get_field_index("embedding"),
                             "embedding", new.cast(emb.type))
    elif name == "events":
        # break exact ts ties across copies (keep the one-month span)
        ts = out["ts"].cast(pa.int64())
        ts = pc.add(ts, pa.scalar(k, type=pa.int64()))
        out = out.set_column(out.schema.get_field_index("ts"), "ts",
                             ts.cast(tab.schema.field("ts").type))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/root/bench_data/sf1.0")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    names = ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"]
    base = {n: pq.read_table(os.path.join(SRC, f"{n}.parquet")) for n in names}
    counts = {n: base[n].num_rows for n in names}
    # corpus vocabulary for the substitution draw (sorted: deterministic)
    vocab = sorted({
        w for s in base["documents"]["text"].to_pylist() for w in s.split(" ") if w
    })
    counts["_vocab"] = vocab

    for n in names:
        if n in ("region", "nation"):
            pq.write_table(base[n], os.path.join(args.out, f"{n}.parquet"))
            continue
        parts = [copy_table(n, base[n], k, counts) for k in range(args.copies)]
        big = pa.concat_tables(parts)
        pq.write_table(big, os.path.join(args.out, f"{n}.parquet"))
        print(n, big.num_rows)
    with open(os.path.join(args.out, "_DONE"), "w") as f:
        f.write("ok\n")


if __name__ == "__main__":
    main()
