import pytest

from xhs_ocr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xhs-ocr-spark-tests", shuffle_partitions=8, extra_conf={
        "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
    })
    yield s
    s.stop()
