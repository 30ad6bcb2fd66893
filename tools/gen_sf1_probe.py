"""Generate an sf1.0-EQUIVALENT probe dataset for round-6 perf measurement.

The driver generates its own sf1.0 for measurement and removes it afterwards;
this tool recreates a distributionally equivalent 10x dataset from the
committed sf0.1 tables so optimization probes run at driver scale.  It is a
MEASUREMENT tool only — correctness oracles always run against the committed
driver SFs (sf0.001/0.01/0.1), never against this.

Construction (deterministic, seed 42):
- documents: fresh 50k docs from the observed sf0.1 generator shape —
  30-word uniform vocab, 10-100 words/doc, 5% near-dup twins (copy of an
  earlier doc with " dup" appended), lang ~ {en .41, zh .15, es .15,
  fr .15, de .14}, source = src{doc_id % 20}.
- TPC-H tables + events: 10 copies with key offsets (lon/lat in every
  query derive from ids via mod arithmetic, so offsets preserve the
  spatial lattice); nation/region copied as-is.
- embeddings: 10 copies with vec_id offsets (queries pin vec_id < 5).

Written with pyarrow defaults (one file, ~1Mi-row row groups) which
reproduces the driver layout noted in OPTIMIZATION_r06.md: every table
single-row-group except lineitem (6) and orders (2).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1.0"
FACTOR = 10

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    n_orig = int(n * 0.95)
    texts: list[str] = []
    for _ in range(n_orig):
        k = int(rng.integers(10, 101))
        texts.append(" ".join(rng.choice(VOCAB, size=k)))
    # near-dup twins: copy an earlier doc, append " dup"
    for _ in range(n - n_orig):
        texts.append(texts[int(rng.integers(0, n_orig))] + " dup")
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    doc_id = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_id,
            "text": texts,
            "lang": langs,
            "source": np.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def replicate(name: str, key_cols: list[str]) -> pa.Table:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    offs = {c: int(pa.compute.max(t[c]).as_py()) + 1 for c in key_cols}
    parts = []
    for k in range(FACTOR):
        cols = {}
        for field in t.schema.names:
            col = t[field]
            if field in key_cols and k > 0:
                col = pa.compute.add(col, k * offs[field])
            cols[field] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts).combine_chunks()


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    rng = np.random.default_rng(42)
    jobs = {
        "documents": lambda: gen_documents(5000 * FACTOR, rng),
        "lineitem": lambda: replicate("lineitem", ["l_orderkey"]),
        "orders": lambda: replicate("orders", ["o_orderkey", "o_custkey"]),
        "customer": lambda: replicate("customer", ["c_custkey"]),
        "part": lambda: replicate("part", ["p_partkey"]),
        "supplier": lambda: replicate("supplier", ["s_suppkey"]),
        "events": lambda: replicate("events", ["event_id", "user_id"]),
        "embeddings": lambda: replicate("embeddings", ["vec_id"]),
        "nation": lambda: pq.read_table(f"{SRC}/nation.parquet"),
        "region": lambda: pq.read_table(f"{SRC}/region.parquet"),
    }
    for name, fn in jobs.items():
        out = f"{DST}/{name}.parquet"
        if os.path.exists(out):
            continue
        tbl = fn()
        pq.write_table(tbl, out)
        f = pq.ParquetFile(out)
        print(name, f.metadata.num_rows, "rows,", f.metadata.num_row_groups, "rg")


if __name__ == "__main__":
    main()
