import pytest

from geotools_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("geotools-spark-tests", cores=4, shuffle_partitions=8)
