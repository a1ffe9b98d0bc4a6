#!/usr/bin/env python
"""Synthesize an sfN-scale dataset from the driver's sf0.1 parquet.

Replicates the FACT tables ×N with key shifting so bench passes at
~6M (sf1) or ~60M (sf10) lineitem rows can show how fixed Spark job
overhead amortizes and whether any query scales worse than linearly
(VERDICT r7 #7, r8 next #1): order keys shift consistently across
orders/lineitem (joins stay valid), dimension foreign keys stay in
range (fan-out ×N), event ids/user ids shift, and document/embedding
ids shift with a replica tag appended to text so near-dup structure is
perturbed rather than exactly clonal.  Dimensions copy through.

At sf10 (100 replicas) the replicated tables no longer fit
comfortably as one in-memory Arrow concat, so each replica is written
incrementally through one ParquetWriter (constant memory in N).

    python scripts/make_sf1.py [/tmp/sf1] [replicas]

sf1 = 10 replicas (default), sf10 = 100 replicas.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _shift(table: pa.Table, col: str, offset: int) -> pa.Table:
    i = table.schema.get_field_index(col)
    shifted = pc.add(table.column(col), pa.scalar(
        offset, type=table.schema.field(col).type))
    return table.set_column(i, table.schema.field(col), shifted)


def _tag_text(table: pa.Table, col: str, r: int) -> pa.Table:
    if r == 0:
        return table
    i = table.schema.get_field_index(col)
    tagged = pc.binary_join_element_wise(
        table.column(col).cast(pa.string()), pa.scalar(f" r{r}"), "")
    return table.set_column(i, pa.field(col, pa.string()), tagged)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    copy = ["region.parquet", "nation.parquet", "customer.parquet",
            "supplier.parquet", "part.parquet"]
    for f in copy:
        shutil.copy(os.path.join(SRC, f), os.path.join(dst, f))

    def replicate(name, build):
        t = pq.read_table(os.path.join(SRC, name))
        path = os.path.join(dst, name)
        total = 0
        with pq.ParquetWriter(path, t.schema) as w:
            for r in range(replicas):
                part = build(t, r).cast(t.schema)
                w.write_table(part, row_group_size=1 << 20)
                total += part.num_rows
        print(f"{name}: {t.num_rows} -> {total}", flush=True)

    n_ord = 10_000_000  # beyond sf0.1's max o_orderkey
    replicate("orders.parquet",
              lambda t, r: _shift(t, "o_orderkey", r * n_ord))
    replicate("lineitem.parquet",
              lambda t, r: _shift(t, "l_orderkey", r * n_ord))
    replicate("events.parquet",
              lambda t, r: _shift(t, "event_id", r * 10_000_000))
    replicate("documents.parquet",
              lambda t, r: _tag_text(_shift(t, "doc_id", r * 1_000_000),
                                     "text", r))
    replicate("embeddings.parquet",
              lambda t, r: _shift(t, "vec_id", r * 1_000_000))


if __name__ == "__main__":
    main()
