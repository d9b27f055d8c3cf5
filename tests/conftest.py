import tempfile

import pytest

from geocrawl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="geocrawl-tests",
        master="local[8]",
        shuffle_partitions=8,
        # keep catalog tables (bucketed seen set) out of the repo tree
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="geocrawl-wh-")},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
