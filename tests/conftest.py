import pytest

from table_computing_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tc-spark-tests", **{"spark.sql.shuffle.partitions": "8"})
    yield s
