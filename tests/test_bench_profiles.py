"""The deployment numeric profile's twins must stay SEMANTICALLY the
same query as the oracle profile — only the summation type differs.

Double sums are order-dependent, so the deployment twins can never be
cross-engine hash-gated; this test is the guard instead: at sf0.001
both engines' deployment twins must agree with each other (and with
the oracle-profile values) within float tolerance, per group.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", ["q01_pricing_summary", "q05_revenue_by_nation"]
)
def test_deployment_twin_matches_oracle_values(spark, name):
    import duckdb

    from etl_notifier_pipeline_spark.catalog import TABLES, table_path

    fn_dep, sql_dep = bench.resolve(name, "deployment")
    fn_ora, _ = bench.resolve(name, "oracle")
    assert fn_dep is not fn_ora, "deployment twin not registered"

    key_cols = (
        ["l_returnflag", "l_linestatus"] if name.startswith("q01") else ["nation"]
    )

    def keyed(rows):
        return {
            tuple(r[k] for k in key_cols): {
                k: v for k, v in r.asDict().items() if k not in key_cols
            }
            for r in rows
        }

    dep = keyed(fn_dep(spark, SF_DIR).collect())
    ora = keyed(fn_ora(spark, SF_DIR).collect())
    assert set(dep) == set(ora)
    for key, vals in dep.items():
        for col, v in vals.items():
            o = ora[key][col]
            assert v == pytest.approx(o, rel=1e-9), (key, col)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, t)}')"
        )
    cols = [d[0] for d in con.execute(sql_dep).description]
    duck = {
        tuple(row[cols.index(k)] for k in key_cols): {
            c: row[i] for i, c in enumerate(cols) if c not in key_cols
        }
        for row in con.execute(sql_dep).fetchall()
    }
    assert set(duck) == set(dep)
    for key, vals in duck.items():
        for col, v in vals.items():
            assert float(v) == pytest.approx(dep[key][col], rel=1e-9), (key, col)


def test_prev_round_artifact_survives_truncated_tail(tmp_path):
    """r12 review finding: a truncated BENCH_r{N}.json (parsed=null)
    with no recoverable stamps file must still return the round NUMBER
    — returning None resets main()'s round counter to 1 and clobbers
    round-1 stamps. With a stamps file present, the per-query seconds,
    canaries, and numeric_profile are reconstructed from it."""
    import importlib.util, json

    spec = importlib.util.spec_from_file_location("be", "/root/repo/bench.py")
    be = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(be)

    # truncated wrapper, no stamps: round number survives, doc is empty
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"n": 7, "rc": 0, "tail": "...", "parsed": None})
    )
    n, doc = be._prev_round_artifact(str(tmp_path))
    assert n == 7 and doc == {}

    # stamps present: queries + canaries + profile reconstructed
    (tmp_path / "BENCH_STAMPS_r07.json").write_text(json.dumps({
        "query_stamps": {"q01": {"sec": 1.5}},
        "host_canary_ms_pre": 70.0, "host_canary_ms_post": 72.0,
        "numeric_profile": "oracle",
    }))
    n, doc = be._prev_round_artifact(str(tmp_path))
    assert n == 7
    assert doc["queries"] == {"q01": 1.5}
    assert doc["numeric_profile"] == "oracle"

    # an untruncated parsed doc passes through unchanged
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(
        {"n": 8, "parsed": {"queries": {"q01": 2.0},
                            "numeric_profile": "deployment"}}
    ))
    n, doc = be._prev_round_artifact(str(tmp_path))
    assert n == 8 and doc["queries"] == {"q01": 2.0}
