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


def test_driver_green_rotation_counts_only_passes(tmp_path, monkeypatch):
    """The catalog-order rotation reads CORRECTNESS_r*.json dynamically:
    green rows leave the priority set, failed/errored rows re-enter it,
    and with no files present the r01+r02 snapshot applies."""
    import json

    from etl_notifier_pipeline_spark.plans import registry as R

    rows = {
        "good_hash": {"rows_match": True, "hash_match": True, "err": None},
        "bad_hash": {"rows_match": True, "hash_match": False, "err": None},
        "errored": {"rows_match": True, "hash_match": True, "err": "boom"},
        "rows_only_ok": {"rows_match": True, "err": None},
    }
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps(rows))
    green = R._driver_green(root=str(tmp_path))
    assert green == {"good_hash", "rows_only_ok"}
    # no files at all -> the r01+r02 snapshot applies
    empty = tmp_path / "empty"
    empty.mkdir()
    assert R._driver_green(root=str(empty)) == R._R01_R02_SNAPSHOT
    # live value: real CORRECTNESS files exist, so the set is file-fed
    # and every r02-green query is in it
    assert "q01_pricing_summary" in R.DRIVER_CHECKED
