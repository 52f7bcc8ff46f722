from __future__ import annotations

import pytest

from hfsa_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hfsa_spark_tests")
    yield s


@pytest.fixture(scope="session")
def small(spark):
    from hfsa_spark.extract.fixtures import fsi_small

    return fsi_small(spark).cache()


@pytest.fixture(scope="session")
def small_h32(spark):
    from hfsa_spark.extract.fixtures import fsi_small_h3_2

    return fsi_small_h3_2(spark).cache()
