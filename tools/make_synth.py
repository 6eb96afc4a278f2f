"""Synthesize the weak-scaling ladder corpora from sf0.1 (SCALE.md's
sf1synth / sf3synth rungs), reproducibly and without Spark.

Construction (the r10 recipe, previously uncommitted): region/nation stay
fixed (TPC-H semantics — 25 nations at any SF); every fact/corpus table is
replicated N× with KEY-CONSISTENT offsets so referential joins keep
working (orders/lineitem share the shifted orderkey space, events.user_id
follows customer keys, etc.); each replicated document carries a
" synthetic copy <i>" text suffix so copies are near- (not exact-)
duplicates — adversarial for pair-finders, whose OUTPUT then grows
~C(N,2)/C(1,2) per copy cluster. Embedding copies keep identical vectors
(exact-duplicate clusters for the ANN/semantic families, same as r10).

Each copy is written as its own parquet row group: the file is coarse
(N row groups), which deliberately exercises the narrow-input spread path
(`_spread_if_narrow`) the same way the single-row-group driver corpus
does.

Usage:
    python tools/make_synth.py 10 /tmp/sf1synth     # 10x  -> "sf1"
    python tools/make_synth.py 30 /tmp/sf3synth     # 30x  -> "sf3"
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# one offset unit per key family, far above any sf0.1 key value
OFF = 10_000_000

# table -> {column: key-family}; key families shift together so joins
# (l_orderkey = o_orderkey, o_custkey = c_custkey, user_id = c_custkey...)
# stay consistent within a copy and never match across copies.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "ev", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FAMILY_OFF = {f: (i + 1) * OFF for i, f in enumerate(
    ["cust", "ord", "part", "supp", "ev", "doc", "vec"])}
FIXED = ["nation", "region"]


def synth_table(name: str, n_copies: int, out_dir: str) -> None:
    src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    out_path = os.path.join(out_dir, f"{name}.parquet")
    writer = pq.ParquetWriter(out_path, src.schema)
    for i in range(n_copies):
        t = src
        for col, fam in KEYED.get(name, {}).items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), i * FAMILY_OFF[fam]).cast(
                t.schema.field(col).type
            )
            t = t.set_column(idx, t.schema.field(col), shifted)
        if name == "documents" and i > 0:
            idx = t.schema.get_field_index("text")
            suffixed = pc.binary_join_element_wise(
                t.column(idx).cast(pa.string()), f" synthetic copy {i}", ""
            )
            t = t.set_column(idx, t.schema.field(idx), suffixed)
            nidx = t.schema.get_field_index("n_chars")
            t = t.set_column(
                nidx, t.schema.field(nidx),
                pc.utf8_length(t.column(idx)).cast(pa.int64()),
            )
        writer.write_table(t, row_group_size=len(t))
    writer.close()


def main() -> None:
    n = int(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for name in FIXED:
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{name}.parquet"))
    for name in KEYED:
        synth_table(name, n, out_dir)
        print(f"{name}: x{n} written", flush=True)


if __name__ == "__main__":
    main()
