import pytest

from polars_ad_etl_spark.session import get_spark
from polars_ad_etl_spark.streaming.pbcompat import ensure_protobuf

# must run BEFORE any SparkSession exists: workers inherit PYTHONPATH from
# the JVM's environment, so the vendored protobuf (needed by the
# transformWithStateInPandas state-server client) has to be exported now
HAVE_PROTOBUF = ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("polars-ad-etl-spark-tests", shuffle_partitions=4)
    yield s
