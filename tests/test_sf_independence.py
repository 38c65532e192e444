"""Standing tri-scale parity gate for scale-sensitive queries (r12
verdict ask #7).

The r12 `parity --all-sf` sweep caught two REAL bugs invisible at the
driver's sf0.01: a fixed rerank-shortlist constant (cand_mult=100
covered 500 vectors, silently turned a degenerate-exact ANN twin
approximate at sf0.1's 2000) and an HLL union equality that only holds
in the sparse regime. Both defects share a signature: a constant that
happens to cover ONE fixture scale. That sweep only ran when invoked;
this module makes the gate standing for the query class where the
signature can occur — every oracle-paired similarity query (corpus-
derived shortlists/cells/thresholds: the s22 class) and the sketch
error-bound contracts (regime-dependent: q81-q83) — at the scales the
driver does NOT run (sf0.001 and sf0.1; sf0.01 is the driver's own
gate every round).

A reintroduced fixed-shortlist bug fails here: the s20-s23 degenerate
twins' oracles are exact brute-force SQL, so any constant that stops
covering the corpus at some scale flips the value hash at that scale.

Marked ``sf_independence`` (deselect with -m "not sf_independence"
for a quick suite); runs by default because it IS the gate.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_notifier_pipeline_spark import caching, plans  # noqa: E402
from etl_notifier_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from tools.parity import _duck_path, pandas_rows, table_hash  # noqa: E402

# The scale-sensitive class, derived from the registry (not a frozen
# name list — a new similarity query joins the gate automatically).
def _gate_names() -> list[str]:
    out = []
    for name, spec in plans.specs().items():
        if spec.oracle is None:
            continue
        if spec.category == "similarity" or "error_bound" in name:
            out.append(name)
    return sorted(out)


SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]


@pytest.fixture(scope="module")
def duck_cons():
    import duckdb

    cons = {}
    for sf_dir in SCALES:
        con = duckdb.connect()
        for t in TABLES:
            p = table_path(sf_dir, t)
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{_duck_path(p)}')"
                )
        cons[sf_dir] = con
    yield cons
    for con in cons.values():
        con.close()


@pytest.mark.sf_independence
@pytest.mark.parametrize("name", _gate_names())
def test_scale_sensitive_query_matches_oracle_at_both_scales(
    spark, duck_cons, name
):
    spec = plans.get(name)
    for sf_dir in SCALES:
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
        finally:
            caching.release_all()
        opdf = duck_cons[sf_dir].execute(spec.oracle).df()
        got = table_hash(list(spdf.columns), pandas_rows(spdf))
        want = table_hash(list(opdf.columns), pandas_rows(opdf))
        assert got == want, (
            f"{name} diverges from its oracle at {sf_dir}: "
            f"spark=(rows {got[0]}, cols {got[2]}, {got[1][:10]}) "
            f"oracle=(rows {want[0]}, cols {want[2]}, {want[1][:10]})"
        )
