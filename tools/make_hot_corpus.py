#!/usr/bin/env python3
"""Build a DISTINCT-variant scale-up of the documents table for df-cap
dry runs.

`make_scaled.py` replicates rows verbatim, which exact-dedup
canonicalization collapses right back to 1x — posting lists and
shingle document frequencies never grow, so the df cap has nothing to
do. This tool instead appends a per-copy suffix token to every text:
all N copies stay DISTINCT documents (canonicalization keeps them all)
while every original trigram's document frequency multiplies by N —
the real 100 TB threat model of boilerplate shared across distinct
documents, the shape the df cap exists for.

Usage: python3 tools/make_hot_corpus.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_hot30] [copies=30]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_hot30"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 30


def main():
    os.makedirs(DST, exist_ok=True)
    t = pq.read_table(f"{SRC}/documents.parquet")
    parts = []
    for i in range(COPIES):
        cols = {}
        for c in t.column_names:
            col = t[c]
            if c == "doc_id":
                col = pc.add(col.combine_chunks().cast("int64"), i * 1_000_000)
            elif c == "text":
                col = pc.binary_join_element_wise(
                    col.combine_chunks().cast("string"), f"v{i}", " ")
            cols[c] = col
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/documents.parquet")
    print("documents", out.num_rows, "distinct-variant rows")


if __name__ == "__main__":
    main()
