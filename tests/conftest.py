import pytest

from rulemorph_spark.engine import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rulemorph-spark-tests", cpus=4)
    yield s
