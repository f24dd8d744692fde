"""Generate a scaled MEASUREMENT dataset from /root/testdata/sf0.1.

The driver benchmarks this round at a driver-generated sf (BENCH_r07: 1.0)
that is not on disk; this tool builds a comparable-scale dataset by
replicating sf0.1 N times with key offsets that preserve referential
integrity (custkey/orderkey/partkey/suppkey/user_id/doc_id/vec_id spaces
stay disjoint per copy; nation/region stay fixed).  Output layout matches
the source worst case: ONE file, ONE row group per table, so scan-split
behaviour (the single-row-group pin that fan_out addresses) is reproduced.

MEASUREMENT ONLY — never used by bench.py/oracles; correctness stays on the
driver-generated sf0.01.  Usage:

    python tools/gen_scaled_sf.py /tmp/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# per-table integer key columns to offset by copy_i * (max+1) of that key space
OFFSETS = {
    "customer.parquet": ["c_custkey"],
    "orders.parquet": ["o_orderkey", "o_custkey"],
    "lineitem.parquet": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part.parquet": ["p_partkey"],
    "supplier.parquet": ["s_suppkey"],
    "events.parquet": ["event_id", "user_id"],
    "documents.parquet": ["doc_id"],
    "embeddings.parquet": ["vec_id"],
    "nation.parquet": [],
    "region.parquet": [],
}
# dimension tables that stay fixed (joined by every copy)
FIXED = {"nation.parquet", "region.parquet"}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    for fname, keys in OFFSETS.items():
        t = pq.read_table(os.path.join(SRC, fname))
        if fname in FIXED or n_copies == 1:
            out = t
        else:
            spans = {k: int(pc.max(t[k]).as_py()) + 1 for k in keys}
            copies = [t]
            for i in range(1, n_copies):
                cols = []
                for name in t.column_names:
                    col = t[name]
                    if name in spans:
                        col = pc.add(col, pa.scalar(i * spans[name], type=col.type))
                    cols.append(col)
                copies.append(pa.table(cols, names=t.column_names))
            out = pa.concat_tables(copies)
        # default (1Mi-row) row groups — matches the source generator's layout:
        # sf0.1's 600k-row lineitem is one group, a 6M-row sf1.0 gets ~6, so
        # scan parallelism scales the same way the driver's data does
        pq.write_table(out, os.path.join(out_dir, fname), compression="zstd")
        print(f"{fname}: {out.num_rows} rows", file=sys.stderr)
    permute_documents(out_dir, n_copies)
    # bench-style completion marker (matches testdata layout)
    open(os.path.join(out_dir, "_DONE"), "w").close()


def permute_documents(out_dir: str, n_copies: int) -> None:
    """Replace the replicated documents table with per-copy word-permuted
    text (deterministic Fisher-Yates per copy) so cross-copy near-duplicate
    pairs vanish and the LSH/dedup candidate structure stays realistic at
    the scaled size (token multisets are preserved)."""
    import numpy as np

    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = src.num_rows
    ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    langs = src["lang"].to_pylist()
    sources = src["source"].to_pylist()
    span = max(ids) + 1
    out_rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(n_copies):
        rng = np.random.RandomState(12345 + i)
        for j in range(n):
            t = texts[j]
            if i > 0:
                words = t.split()
                rng.shuffle(words)
                t = " ".join(words)
            out_rows["doc_id"].append(ids[j] + i * span)
            out_rows["text"].append(t)
            out_rows["lang"].append(langs[j])
            out_rows["source"].append(sources[j])
            out_rows["n_chars"].append(len(t))
    t = pa.table(out_rows)
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"), compression="zstd")
    print(f"documents (permuted): {t.num_rows} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
