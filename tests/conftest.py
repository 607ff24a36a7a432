from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from kgforge.session import get_spark

    s = get_spark("kgforge-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
