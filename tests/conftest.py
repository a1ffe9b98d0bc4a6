import os

import pytest

# One shared driver JVM serves the whole suite; the local-mode default
# 1g heap accumulates plan/codegen cache pressure across ~1500 tests
# and OOMs mid-suite since the r7 display/probe machinery grew typical
# plans.  Must be set BEFORE the first get_spark creates the JVM.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")

from rulemorph_spark.engine import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rulemorph-spark-tests", cpus=4)
    yield s
