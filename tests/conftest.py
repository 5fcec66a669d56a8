import os

import pytest
from pyspark.sql import SparkSession

SF_SMALL = "/root/testdata/sf0.001"

# Partition-invariance sweeps replay the suite at a different
# parallelism (e.g. PQX_TEST_CORES=32 PQX_TEST_SHUFFLE=32) — results
# must be identical, the repo's determinism contract.
_CORES = os.environ.get("PQX_TEST_CORES", "4")
_SHUFFLE = os.environ.get("PQX_TEST_SHUFFLE", "4")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master(f"local[{_CORES}]")
        .config("spark.sql.shuffle.partitions", _SHUFFLE)
        # AQE default OFF for the test session (r15): at the suite's
        # tiny scale AQE only adds a stage-materialization job per
        # exchange — measured 24% of the whole suite's wall time — and
        # the driver's pytest capture was truncating on the 32-minute
        # runs. Results are identical either way (the determinism
        # contract); tests that exercise AQE behavior itself (skew
        # split, bucketing) set it explicitly. PQX_TEST_AQE=true
        # restores the production default for a sweep.
        .config(
            "spark.sql.adaptive.enabled",
            os.environ.get("PQX_TEST_AQE", "false"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .appName("pqx-tests")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
