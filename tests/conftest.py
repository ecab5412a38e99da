import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datachain_spark.session import Session, default_spark_builder

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def session(tmp_path_factory):
    ms_dir = str(tmp_path_factory.mktemp("metastore"))
    spark = (
        default_spark_builder("datachain-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sess = Session(spark=spark, metastore_dir=ms_dir)
    Session._global = sess
    yield sess
    Session._global = None


@pytest.fixture(scope="session")
def spark(session):
    return session.spark


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
