import pytest


@pytest.fixture(scope="session")
def spark():
    from open_vector_tile_spark.plans import get_spark

    s = get_spark("pytest", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
