import pytest


@pytest.fixture(scope="session")
def spark():
    from json_schema_spark.session import get_spark

    s = get_spark(app="json_schema_spark_tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ref(tmp_path_factory):
    """ONE compiled-reference probe shared by every reference
    differential module (the build costs ~15 s; five module-scoped
    copies were ~75 s of pure javac)."""
    from tests.test_reference_differential import build_reference_probe

    return build_reference_probe(tmp_path_factory.mktemp("refbuild"))
