#!/usr/bin/env python
"""Synthesize an sf1-scale dataset from the driver's sf0.1 parquet.

Every number so far is sf0.1, where ~0.3 s of fixed Spark job overhead
floors the per-query ratios (VERDICT r7 #7).  This script replicates
the FACT tables ×10 with key shifting so a bench pass at ~6M lineitem
rows can show the amortization: order keys shift consistently across
orders/lineitem (joins stay valid), dimension foreign keys stay in
range (fan-out ×10), event ids/user ids shift, and document/embedding
ids shift with a replica tag appended to text so near-dup structure is
perturbed rather than exactly clonal.  Dimensions copy through.

    python scripts/make_sf1.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


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
    os.makedirs(dst, exist_ok=True)
    copy = ["region.parquet", "nation.parquet", "customer.parquet",
            "supplier.parquet", "part.parquet"]
    for f in copy:
        shutil.copy(os.path.join(SRC, f), os.path.join(dst, f))

    def replicate(name, build):
        t = pq.read_table(os.path.join(SRC, name))
        parts = [build(t, r) for r in range(REPLICAS)]
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, name),
                       row_group_size=1 << 20)
        print(f"{name}: {t.num_rows} -> {out.num_rows}")

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
