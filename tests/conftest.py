import pytest

from graph4code_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("g4c-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s
