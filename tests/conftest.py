import os
import tempfile

import pytest

from streamjoin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # per-session warehouse: name-addressed targets (writeToTable) resolve
    # under spark.sql.warehouse.dir, so a shared ./spark-warehouse would
    # leak one run's table state (data + progress watermarks) into the
    # next — tests must be hermetic
    wh = tempfile.mkdtemp(prefix="sj_warehouse_")
    s = get_spark(
        "streamjoin-tests", cpus=8, shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    import shutil

    shutil.rmtree(wh, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir, table):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
