import pytest

from data_quality_autohealer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dqa-tests", master="local[8]", shuffle_partitions=8)
    yield s
