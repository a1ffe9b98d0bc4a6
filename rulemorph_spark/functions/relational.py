"""Relational forms of the engine's record-level operators.

The reference's ``lookup``/``lookup_first`` scan a context array per
record — O(n·m) (``transform.rs:2851-2876``).  At scale the lookup table
is a DataFrame and the operator is a **broadcast hash join**: one scan of
the fact side, no shuffle when the dimension fits in memory.  These
helpers are what the 100 TB path uses; the expression-level lookup stays
available for small literal contexts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lookup_first(records: DataFrame, lookup: DataFrame, record_key,
                 lookup_key, select: list[str] | None = None,
                 order_by: str | None = None) -> DataFrame:
    """``lookup_first``: first match per record (or missing → null cols).

    Duplicate lookup keys keep the first row by ``order_by`` (the
    reference keeps array order; a DataFrame needs an explicit order).
    Broadcasts the lookup side — at 1000 executors this is a map-side
    join with zero shuffle of the fact table.
    """
    lk = lookup
    if order_by is not None:
        w = Window.partitionBy(lookup_key).orderBy(F.col(order_by))
        lk = (lookup.withColumn("__rn__", F.row_number().over(w))
              .filter(F.col("__rn__") == 1).drop("__rn__"))
    if select is not None:
        lk = lk.select(lookup_key, *select)
    return records.join(F.broadcast(lk),
                        records[record_key] == lk[lookup_key], "left")


def lookup_all(records: DataFrame, lookup: DataFrame, record_key: str,
               lookup_key: str, collect_col: str,
               sort_col: str | None = None) -> DataFrame:
    """``lookup``: all matches as an array per record.

    join + groupBy + ``collect_list`` (sorted for determinism) — the
    shuffle is on the record key, which is already the join key, so AQE
    coalesces it into the join exchange.
    """
    sort_key = sort_col or collect_col
    joined = records.join(F.broadcast(lookup),
                          records[record_key] == lookup[lookup_key], "left")
    return (joined.groupBy(records[record_key])
            .agg(F.sort_array(F.collect_list(
                F.struct(F.col(sort_key).alias("s"),
                         F.col(collect_col).alias("v"))))
                 .alias("__pairs__"))
            .withColumn("matches",
                        F.transform(F.col("__pairs__"), lambda p: p["v"]))
            .drop("__pairs__"))


def stable_sort(df: DataFrame, key: Column, ascending: bool = True,
                index_col: str | None = None) -> DataFrame:
    """``finalize.sort``: stable by original input order
    (``transform.rs:678-688``).  With an explicit index column the sort is
    total and deterministic under any partitioning."""
    ordering = key.asc_nulls_last() if ascending else key.desc_nulls_last()
    cols = [ordering]
    if index_col is not None:
        cols.append(F.col(index_col).asc())
    return df.orderBy(*cols)
