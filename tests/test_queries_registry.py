"""Registry/driver-contract sanity: every query runs at sf0.001 and the
oracle pairing rules hold (this is the cheap gate; full value parity is
tools/parity.py)."""

from __future__ import annotations

import pytest

from etl_notifier_pipeline_spark import plans

SF_DIR = "/root/testdata/sf0.001"


def test_every_query_has_doc_and_category():
    for name, spec in plans.specs().items():
        assert spec.doc, f"{name} has no docstring"
        assert spec.category


@pytest.mark.parametrize("name", sorted(plans.specs()))
def test_query_runs_and_has_stable_schema(spark, name):
    spec = plans.get(name)
    df = spec.fn(spark, SF_DIR)
    assert df.columns, name
    assert df.count() >= 0


def test_driver_contract_shape():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40
