import pytest

from polars_ad_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("polars-ad-etl-spark-tests", shuffle_partitions=4)
    yield s
