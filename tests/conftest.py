import pytest

from sherlock_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    session = get_spark("sherlock_spark_tests", cores=4, shuffle_partitions=4)
    yield session
