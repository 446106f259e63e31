#!/usr/bin/env python3
"""Build a replicated scale-up of a testdata dir for scaling dry runs.

Copies the small dimension tables as-is and replicates the big tables
N times with shifted primary keys (foreign keys into dims unchanged, so
joins still resolve; fact-fact keys shift consistently). Used to verify
operators scale near-linearly before they meet real data.

Usage: python3 tools/make_scaled.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1] [copies=10] [tables=all]

`tables` is a comma-separated subset of the big tables (e.g.
"documents,embeddings") for deep corpus-only scale-ups that skip the
fact tables.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

SHIFTS = {
    "orders": (["o_orderkey"], [10_000_000]),
    "lineitem": (["l_orderkey"], [10_000_000]),
    "events": (["event_id"], [10_000_000]),
    "documents": (["doc_id"], [1_000_000]),
    "embeddings": (["vec_id"], [1_000_000]),
}


def main():
    if ONLY is not None and ONLY - set(SHIFTS):
        sys.exit(f"unknown tables: {sorted(ONLY - set(SHIFTS))}; "
                 f"choose from {sorted(SHIFTS)}")
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(t, "copied")
    for name, (shift_cols, bases) in SHIFTS.items():
        if ONLY is not None and name not in ONLY:
            # unscaled big tables still copy once so every query (and
            # Tables.registerAll) can run against the output dir
            pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                           f"{DST}/{name}.parquet")
            print(name, "copied (1x)")
            continue
        t = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(COPIES):
            cols = {}
            for c in t.column_names:
                col = t[c]
                if c in shift_cols:
                    base = bases[shift_cols.index(c)]
                    col = pc.add(col.combine_chunks().cast("int64"), i * base)
                cols[c] = col
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(name, out.num_rows)


if __name__ == "__main__":
    main()
