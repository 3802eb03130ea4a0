import pytest

from warp_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("warp-spark-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
