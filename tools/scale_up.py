#!/usr/bin/env python3
"""Derive an N×-scaled dataset from a driver-generated sf directory.

Usage: python3 tools/scale_up.py [srcDir] [dstDir] [copies]

Replicates every fact table `copies` times, shifting each surrogate-key
column by i*OFFSET per copy so referential integrity is preserved
(orders.o_custkey follows customer.c_custkey, lineitem.l_orderkey
follows orders.o_orderkey, ...). Dimension tables (region, nation) are
copied unscaled, exactly like a real star schema growing 10× in facts.
Text/embedding payloads are replicated verbatim, so every document
gains copies-1 exact duplicates — deliberately: at 100 TB the dedup
pipeline's work IS dominated by replica clusters, and this makes the
10× run a stress test of exactly that (pair counts grow ~copies² per
duplicate group).

Schemas are preserved bit-for-bit via pyarrow (including events.ts
TIMESTAMP(NANOS), which a Spark rewrite would downgrade), so both the
Spark library and the DuckDB oracle read the derived directory exactly
like a driver-generated one.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import os

OFFSET = 1_000_000_000  # beyond every key domain in the generated data

# table -> key columns shifted per copy (all int64 surrogate keys)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    # Row groups are Spark's scan-split unit: a single-row-group file
    # serializes the whole scan into one task no matter how many cores
    # exist (pyarrow's default 1M-row groups left 250k docs unsplittable
    # and made every text query super-linear). 64k rows per group keeps
    # the derived files splittable at any copy count.
    rg = 64 * 1024
    for t in DIMS:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl, f"{dst}/{t}.parquet", row_group_size=rg)
        print(f"{t}: {tbl.num_rows} rows (dim, unscaled)")
    for t, keys in SHIFT.items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        # CHAINED derivations collide: scaling an already-scaled dir
        # reuses the same OFFSET, so copy (i=9 of the inner run, j=0 of
        # the outer) and (i=0, j=9) land on the SAME key — duplicate ids
        # that silently corrupt anything keyed (observed: HNSW graph
        # remap). Scale from the ORIGINAL dir in one step instead.
        for k in keys:
            mx = pa.compute.max(tbl.column(k)).as_py()
            if mx is not None and mx >= OFFSET:
                raise SystemExit(
                    f"{t}.{k} max={mx} >= OFFSET={OFFSET}: '{src}' is already a "
                    f"scaled derivation — chaining scale_up duplicates keys; "
                    f"re-run against the original driver-generated dir with "
                    f"the full copy count")
        chunks = []
        for i in range(copies):
            c = tbl
            for k in keys:
                idx = c.schema.get_field_index(k)
                shifted = pa.compute.add(c.column(k), i * OFFSET)
                c = c.set_column(idx, c.schema.field(k), shifted)
            chunks.append(c)
        out = pa.concat_tables(chunks)
        pq.write_table(out, f"{dst}/{t}.parquet", row_group_size=rg)
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
