from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

# Python workers must be able to import test modules (closures defined at
# test-module level are cloudpickled by reference).
os.environ["PYTHONPATH"] = (
    "/root/repo/tests:/root/repo:" + os.environ.get("PYTHONPATH", "")
)


@pytest.fixture(scope="session")
def spark():
    from sf_epa_data_ingestion_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
