import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from level_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")
    # test modules define map closures; Python workers must import them
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    extra = os.environ.get("PYTHONPATH", "")
    if tests_dir not in extra.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{tests_dir}{os.pathsep}{extra}" if extra else tests_dir
        )
    spark = get_spark(app_name="lmr-tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def store(tmp_path):
    d = tempfile.mkdtemp(dir=str(tmp_path))
    yield d
    shutil.rmtree(d, ignore_errors=True)
