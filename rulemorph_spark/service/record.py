"""Single-record rule application for the service layers.

Endpoint/MCP requests transform ONE record at a time; each distinct rule
compiles once (plan cache) and re-applies to 1-row DataFrames.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..engine import apply_finalize, _apply_wrap
from ..errors import TransformEngineError, extract_engine_error
from ..model import RuleFile, parse_rule_file


def transform_record(spark: SparkSession, rule: RuleFile | str,
                     record: Any, context: Any = None,
                     base_dir: str = ".") -> Any | None:
    """Apply a rule to one record (``transform_record_with_warnings_inner``,
    ``transform.rs:288-308``): returns the output value, or None when the
    record is filtered out; finalize applies to the singleton array."""
    if isinstance(rule, str):
        rule = parse_rule_file(rule)
    from ..compiler.rule import Builder, RuleCompiler

    df = spark.createDataFrame([(0, json.dumps(record))],
                               "__idx__ long, __raw__ string") \
        .select("__idx__", F.parse_json("__raw__").alias("__record__"))
    builder = Builder(df)
    compiled = RuleCompiler(rule, context=context,
                            base_dir=base_dir).compile(
        builder, F.col("__record__"))
    result = (builder.df.withColumn("__keep__", compiled.keep)
              .filter(F.col("__keep__"))
              .withColumn("__json__", compiled.out_json())
              .select("__idx__", "__json__"))
    try:
        result, wrap = apply_finalize(result, rule, context)
        rows = result.collect()
    except Exception as exc:
        err = extract_engine_error(exc)
        if err is not None:
            raise err from exc
        raise
    records = [json.loads(r["__json__"]) for r in rows]
    if wrap is not None:
        return _apply_wrap(records, wrap, rule, spark, context)
    if rule.finalize is not None:
        return records[0] if len(records) == 1 else records
    return records[0] if records else None
