import pytest

from quicker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, shuffle_partitions=8, app="quicker_spark-tests",
                  driver_memory="4g")
    yield s
