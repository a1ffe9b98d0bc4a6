"""Per-query time decomposition: DSL construction, analysis,
optimization+physical planning, and warm execution — so optimization
effort goes where the time actually is (guide §1).

Usage: python scripts/profile_queries.py [query ...]
Writes plans to plans/r09/<query>_<tag>.txt when --plans <tag> is given.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    args = [a for a in sys.argv[1:]]
    tag = None
    if "--plans" in args:
        i = args.index("--plans")
        tag = args[i + 1]
        del args[i:i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

    from rulemorph_spark.engine import get_spark
    import __spark_entry__ as entry

    spark = get_spark("rulemorph-profile", cpus=cpus)
    spark.range(1000).count()
    qs = entry.queries()
    names = args or list(qs)
    plans_dir = os.path.join(HERE, "plans", "r09")
    if tag:
        os.makedirs(plans_dir, exist_ok=True)

    print(f"{'query':30s} {'build':>7s} {'analyze':>8s} {'plan':>7s} "
          f"{'exec1':>7s} {'exec_w':>7s}")
    for name in names:
        fn = qs[name]
        # warm once so codegen/scan caches don't pollute the split
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        df.schema
        t_an = time.perf_counter() - t0

        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec1 = time.perf_counter() - t0

        execs = []
        for _ in range(3):
            d2 = fn(spark, sf_dir)
            d2._jdf.queryExecution().executedPlan()  # pre-plan
            t0 = time.perf_counter()
            d2.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        t_exec_w = sorted(execs)[1]
        spark.sparkContext.setJobDescription(None)

        print(f"{name:30s} {t_build:7.3f} {t_an:8.3f} {t_plan:7.3f} "
              f"{t_exec1:7.3f} {t_exec_w:7.3f}")
        if tag:
            p = os.path.join(plans_dir, f"{name}_{tag}.txt")
            df3 = fn(spark, sf_dir)
            jvm = spark._jvm
            txt = (jvm.org.apache.spark.sql.api.python.PythonSQLUtils
                   .explainString(df3._jdf.queryExecution(), "formatted"))
            with open(p, "w", encoding="utf-8") as fh:
                fh.write(txt)


if __name__ == "__main__":
    main()
