"""Streaming transform: the reference's ``transform_stream``
(``transform.rs:93-190``) under Structured Streaming.

The per-record plan is identical to batch — one projection + filter —
so the same compiled rule runs over a micro-batch stream unchanged.
``finalize`` is rejected exactly like the reference (``:168-173``),
which matches Spark's own restriction on global sort/limit in streams.

Input contract: a streaming DataFrame with one NDJSON record per row in
``value`` (e.g. ``spark.readStream.text(dir)`` or a Kafka value column);
output: a streaming DataFrame of NDJSON lines in ``value``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compiler.rule import Builder, RuleCompiler
from ..errors import TransformEngineError
from ..model import RuleFile, parse_rule_file


def transform_stream(rule: RuleFile | str, stream_df: DataFrame,
                     context=None, base_dir: str = ".",
                     value_col: str = "value") -> DataFrame:
    """Compile the rule onto a streaming DataFrame of NDJSON lines."""
    if isinstance(rule, str):
        rule = parse_rule_file(rule)
    if rule.finalize is not None:
        raise TransformEngineError(
            "InvalidInput",
            "finalize is not supported in streaming mode", "finalize")
    df = stream_df.select(
        F.parse_json(F.col(value_col)).alias("__record__"))
    builder = Builder(df)
    compiled = RuleCompiler(rule, context=context,
                            base_dir=base_dir).compile(
        builder, F.col("__record__"))
    return (builder.df
            .withColumn("__keep__", compiled.keep)
            .filter(F.col("__keep__"))
            .select(compiled.out_json().alias("value")))


def transform_stream_files(spark: SparkSession, rule: RuleFile | str,
                           input_dir: str, output_dir: str,
                           checkpoint_dir: str, context=None,
                           base_dir: str = "."):
    """File-to-file NDJSON streaming pipeline; returns the query handle."""
    src = spark.readStream.format("text").load(input_dir)
    out = transform_stream(rule, src, context=context, base_dir=base_dir)
    return (out.writeStream.format("text")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
