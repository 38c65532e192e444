from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_notifier_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark = get_spark(
        "tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield spark


@pytest.fixture()
def tmp_store(spark, tmp_path):
    from etl_notifier_pipeline_spark.storage import TableStore

    return TableStore(spark, str(tmp_path / "store"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "sf_independence: tri-scale oracle parity for scale-sensitive "
        "queries (deselect with -m 'not sf_independence' for speed)",
    )
