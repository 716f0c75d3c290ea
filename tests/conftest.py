import tempfile

import pytest

from computer_vision_foundations_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # saveAsTable (bucketed tables, DDL tests) must not write
            # a spark-warehouse/ into the repo checkout
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="cvlake_wh_"),
        },
    )
    yield s
