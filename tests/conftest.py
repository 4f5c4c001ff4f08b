import os
import shutil
import tempfile

import pytest

from etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=int(os.environ.get("SPARK_TEST_CORES", "8")), app_name="etl_spark_tests")
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="etl_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
