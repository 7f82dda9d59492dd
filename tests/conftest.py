import pytest


@pytest.fixture(scope="session")
def spark():
    from ant_spark.session import get_spark

    s = get_spark(
        app_name="ant_spark_tests",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield s
