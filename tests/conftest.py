from __future__ import annotations

import pytest

from processor_post_timeseries_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pts-tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
    s.stop()
