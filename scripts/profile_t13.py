"""Profile the t13 extended-rule anchor: compile wall, analyzed-plan
size, probe-chain instantiation counts, exec time, codegen state."""
import json
import re
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

EXT = ("/root/reference/crates/rulemorph/tests/fixtures/"
       "t13_expr_extended/rules.yaml")

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.showConsoleProgress", "false")
         .appName("profile_t13").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from rulemorph_spark.compiler.rule import Builder, RuleCompiler
from rulemorph_spark.model import parse_rule_file

record = json.dumps({
    "text": "abc-123-abc", "regex_text": "a1b2c3", "csv": "a,b,c",
    "pad": "7", "num_a": 80.6, "num_b": "2.5", "num_c": 3,
    "base_value": 255, "date_simple": "2024-01-02 03:04:05",
    "date_tz": "2024-01-02T03:04:05+09:00",
    "unix_s": "1970-01-01T00:00:01Z",
    "unix_ms": "1970-01-01T00:00:00.123Z"})
records = spark.range(5000).select(
    F.col("id").alias("__idx__"),
    F.parse_json(F.lit(record)).alias("__record__"))

with open(EXT, encoding="utf-8") as fh:
    rule_text = fh.read()

t0 = time.perf_counter()
rule = parse_rule_file(rule_text)
builder = Builder(records)
compiled = RuleCompiler(rule).compile(builder, F.col("__record__"))
out = (builder.df.withColumn("__keep__", compiled.keep)
       .filter("__keep__").select(compiled.out_json().alias("j")))
out.schema
compile_s = time.perf_counter() - t0

plan = out._jdf.queryExecution().analyzed().toString()
print(f"compile_s={compile_s:.2f}")
print(f"analyzed_plan_chars={len(plan)}")
# probe-chain signature: the %.NE format strings
for sig in ("%.16E", "%.15E", "%.1E", "format_string", "regexp_replace",
            "try_cast", "raise_error", "transform(array("):
    print(f"count[{sig!r}]={plan.count(sig)}")

# exec timings
out.write.format("noop").mode("overwrite").save()
ss = []
for _ in range(5):
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    ss.append(time.perf_counter() - t0)
ss.sort()
print(f"exec median={ss[len(ss)//2]:.3f} min={ss[0]:.3f} max={ss[-1]:.3f}")

# codegen state: executed plan — look for WholeStageCodegen and
# fallback markers
ex = out._jdf.queryExecution().executedPlan().toString()
n_wsc = len(re.findall(r"WholeStageCodegen", ex))
print(f"WholeStageCodegen_spans={n_wsc}")
print("executed_head:", ex[:600].replace("\n", " | ")[:600])

# codegen of the project: try debugCodegen length
try:
    dbg = spark._jvm.org.apache.spark.sql.execution.debug.package\
        .DebugQuery(out._jdf).debugCodegen()
except Exception as e:
    print("debugCodegen n/a:", type(e).__name__)
spark.stop()
