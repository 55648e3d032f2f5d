"""Generate a synthetic sf1-scale PERFORMANCE dataset by replicating
sf0.1 ten times with shared key-domain offsets (VERDICT r17 item 8:
make the core-scaling signal usable — at sf0.1 the bench is
floor-dominated and 28/29 queries show 8-vs-32-core ratios ≈ 1).

    python tools/make_sf1synth.py [src_dir] [dst_dir] [replicas]

Defaults: /root/testdata/sf0.1 -> /root/testdata_synth/sf1synth, 10x.

Properties preserved: referential integrity (each key domain gets ONE
offset, applied to every table referencing it), schemas, timestamp
layouts.  Document text gets a per-replica suffix token so the corpus
is not 10x exact duplicates (which would trip the dedup df/bucket
caps and misrepresent the workload); embeddings are replicated
verbatim (seed rows vec_id < k stay replica-0).

This is a PERF profile input only: the DuckDB oracles are defined on
the driver's deterministic fixtures, so correctness claims never use
this data.  Results: artifacts/scaling_grid_r18.json.
"""
from __future__ import annotations

import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_synth/sf1synth"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os

    os.makedirs(dst, exist_ok=True)

    def dom_max(t: str, c: str) -> int:
        col = pq.read_table(f"{src}/{t}.parquet", columns=[c]).column(c)
        return int(pc.max(col).as_py()) + 1

    off = {
        "custkey": dom_max("customer", "c_custkey"),
        "suppkey": dom_max("supplier", "s_suppkey"),
        "partkey": dom_max("part", "p_partkey"),
        "orderkey": dom_max("orders", "o_orderkey"),
        "event_id": dom_max("events", "event_id"),
        "user_id": dom_max("events", "user_id"),
        "doc_id": dom_max("documents", "doc_id"),
        "vec_id": dom_max("embeddings", "vec_id"),
    }
    domain = {
        "c_custkey": "custkey", "o_custkey": "custkey",
        "s_suppkey": "suppkey", "l_suppkey": "suppkey",
        "p_partkey": "partkey", "l_partkey": "partkey",
        "o_orderkey": "orderkey", "l_orderkey": "orderkey",
        "event_id": "event_id", "user_id": "user_id",
        "doc_id": "doc_id", "vec_id": "vec_id",
    }

    def repl(t: str, keycols: list[str], text_col: str | None = None) -> None:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        parts = []
        for i in range(reps):
            cols = []
            for name in tbl.column_names:
                col = tbl.column(name)
                if name in keycols:
                    col = pc.add(col, pa.scalar(off[domain[name]] * i, type=col.type))
                elif name == text_col and i > 0:
                    col = pc.binary_join_element_wise(col, pa.scalar(f" rep{i}"), "")
                cols.append(col)
            parts.append(pa.table(dict(zip(tbl.column_names, cols))))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{t}.parquet", row_group_size=200_000)
        print(t, out.num_rows)

    for t in ("region", "nation"):
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    repl("customer", ["c_custkey"])
    repl("supplier", ["s_suppkey"])
    repl("part", ["p_partkey"])
    repl("orders", ["o_orderkey", "o_custkey"])
    repl("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    repl("events", ["event_id", "user_id"])
    repl("documents", ["doc_id"], text_col="text")
    repl("embeddings", ["vec_id"])
    print("offsets:", off)
    return 0


if __name__ == "__main__":
    sys.exit(main())
