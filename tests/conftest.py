import shutil
import tempfile

import pytest

from ds_floodexposure_monitoring_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="sparkgraft-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
