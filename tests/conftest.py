import pytest


@pytest.fixture(scope="session")
def spark():
    from json_schema_spark.session import get_spark

    s = get_spark(app="json_schema_spark_tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
