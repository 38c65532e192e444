"""Local mirror of the driver's correctness gate.

Runs every registered query's Spark side and DuckDB oracle side on the
same parquet fixtures and compares row count, column names, and an
order-insensitive value hash. Both sides are canonicalized THROUGH
PANDAS, mirroring the driver: this is what surfaces dtype coercions
like DuckDB HUGEINT (int128 SUM results) -> float64, which raw
``fetchall()`` hides (r01 lesson: q17/x01 passed locally, failed the
driver). A PASS here is a strong predictor of CORRECTNESS_r{N}.json.

Usage:  python tools/parity.py [sf_dir] [query ...] [--all-sf]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _duck_path(p: str) -> str:
    """DuckDB needs a glob for Spark-written parquet DIRECTORIES
    (amplified fixtures); driver fixtures are single files."""
    import os as _os

    return p + "/*.parquet" if _os.path.isdir(p) else p


# Bit-exact by default (the driver gate). --round N switches floats to
# N-significant-digit canonicalization for SCALE sanity runs: at 10x+
# magnitudes DuckDB's int128-decimal -> double conversion can differ
# from Java BigDecimal's correctly-rounded path by 1 ulp, which is a
# conversion artifact, not a semantic mismatch.
FLOAT_SIG_DIGITS: int | None = None


def canon_value(v) -> str:
    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if FLOAT_SIG_DIGITS is not None:
            return f"{v:.{FLOAT_SIG_DIGITS}e}"
        # Strict bit-level repr: the engine's determinism contract is
        # bit-exactness, so no rounding slack here.
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, str)):
        return str(v)
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    try:
        import pandas as pd

        if v is pd.NaT:
            return "NULL"
    except Exception:
        pass
    return str(v)


def pandas_rows(pdf) -> list[tuple]:
    """Rows from a pandas DataFrame, preserving the dtype coercion the
    driver's canonicalizer sees (int64 stays int, HUGEINT/nullable-int
    columns arrive as float64 and stay float)."""
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def table_hash(columns: list[str], rows: list[tuple]) -> tuple[int, str, list[str]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted(
        "\x1f".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\x1e".join(canon_rows).encode()).hexdigest()
    return len(rows), h, sorted(columns)


def run(
    sf_dir: str, only: list[str] | None = None, json_out: str | None = None
) -> int:
    import duckdb

    from etl_notifier_pipeline_spark import caching, plans
    from etl_notifier_pipeline_spark.catalog import TABLES, table_path
    from etl_notifier_pipeline_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{_duck_path(table_path(sf_dir, t))}')"
        )

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, spec in plans.specs().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spdf = sdf.toPandas()
            srows = pandas_rows(spdf)
            scols = list(spdf.columns)
            caching.release_all()  # bound cache growth across the sweep
        except Exception as e:
            caching.release_all()
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "fail", "err": f"spark: {e}"[:400]}
            n_fail += 1
            continue
        if spec.oracle is None:
            n_rows_only += 1
            results[name] = {"status": "rows-only", "rows": len(srows)}
            print(f"rows-only {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(spec.oracle).df()
            ocols = list(opdf.columns)
            orows = pandas_rows(opdf)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            results[name] = {"status": "fail", "err": f"oracle: {e}"[:400]}
            n_fail += 1
            continue
        sn, sh, sc = table_hash(scols, srows)
        on, oh, oc = table_hash(ocols, orows)
        ok = (sn, sh, sc) == (on, oh, oc)
        if ok:
            n_pass += 1
            results[name] = {"status": "pass", "rows": sn}
            print(f"PASS {name}: {sn} rows  ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            results[name] = {
                "status": "fail",
                "err": f"spark=({sn} rows, {sh[:10]}) oracle=({on} rows, {oh[:10]})",
            }
            print(f"FAIL {name}: spark=({sn} rows, cols={sc}, {sh[:10]}) "
                  f"oracle=({on} rows, cols={oc}, {oh[:10]})")
            if sn and on and sc == oc and sn == on:
                sset = set("\x1f".join(map(canon_value, r)) for r in srows)
                oset = set("\x1f".join(map(canon_value, r)) for r in orows)
                for d in list(sset - oset)[:3]:
                    print(f"   spark-only: {d!r}")
                for d in list(oset - sset)[:3]:
                    print(f"   oracle-only: {d!r}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": n_pass,
                    "fail": n_fail,
                    "rows_only": n_rows_only,
                    "queries": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--round" in args:
        i = args.index("--round")
        globals()['FLOAT_SIG_DIGITS'] = int(args[i + 1])
        del args[i : i + 2]
    if "--all-sf" in args:
        # The tri-scale gate (r12): two defects were invisible at the
        # driver's sf0.01 — a shortlist constant that broke a
        # degenerate-exact ANN twin only at sf0.1, and an HLL
        # union-equality contract that only holds in the sparse
        # regime. One command sweeps all three fixture scales; any
        # mismatch anywhere fails.
        args.remove("--all-sf")
        explicit_sf = [a for a in args if "/" in a]
        if explicit_sf:
            # an explicit sf_dir under --all-sf would be silently
            # ignored (the sweep pins its own three scales) — refuse
            raise SystemExit(
                f"--all-sf sweeps fixed scales; drop {explicit_sf}"
            )
        only = [a for a in args if "/" not in a] or None
        rc = 0
        scale_docs: dict[str, str] = {}
        for sf in (
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ):
            print(f"=== {sf} ===", flush=True)
            # per-scale json files (suffix the scale onto the stem) so
            # --all-sf --json writes artifacts instead of silently
            # dropping the flag
            scale_out = None
            if json_out:
                stem, ext = os.path.splitext(json_out)
                scale_out = f"{stem}_{os.path.basename(sf)}{ext}"
                scale_docs[sf] = scale_out
            rc |= run(sf, only, scale_out)
        if json_out:
            print(f"wrote per-scale artifacts: {sorted(scale_docs.values())}")
        sys.exit(rc)
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    sys.exit(run(sf, only, json_out))
