import os

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy randomized/parity sweeps (each has a fast sibling in the "
        "default gate); deselected by default — run with -m slow or "
        "SPARK_GRAFT_FULL_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    """Keep the default gate under 10 minutes: deselect `slow` unless the
    caller opts in (SPARK_GRAFT_FULL_TESTS=1 for the CI-full sweep, an
    explicit -m expression which takes full control of selection, a -k
    filter, or a direct node id like tests/foo.py::test_bar — explicitly
    requesting a test always runs it)."""
    if (
        os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1"
        or config.getoption("-m")
        or config.getoption("-k")
        or any("::" in a for a in config.args)
    ):
        return
    deselected = [i for i in items if "slow" in i.keywords]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = [i for i in items if "slow" not in i.keywords]


@pytest.fixture(scope="session")
def spark():
    from open_vector_tile_spark.plans import get_spark

    s = get_spark("pytest", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
