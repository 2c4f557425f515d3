from __future__ import annotations

import pytest

from mobilitydatalakebenchmark_spark.session import get_spark
from mobilitydatalakebenchmark_spark.sources.geojson import generate_snapshots

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def snapshots():
    return generate_snapshots()


@pytest.fixture(scope="session")
def documents_df(spark, snapshots):
    from mobilitydatalakebenchmark_spark.sources.geojson import snapshots_to_df

    df = snapshots_to_df(spark, snapshots)
    df.cache().count()
    return df
