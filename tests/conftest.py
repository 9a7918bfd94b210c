import shutil

import pytest

from picdexer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("picdexer-tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "2048"})
    yield s
    s.stop()


@pytest.fixture()
def tmp_index(tmp_path):
    d = str(tmp_path / "index")
    yield d
    shutil.rmtree(d, ignore_errors=True)
