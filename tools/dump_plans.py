"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [name ...]

With no names, dumps the bench HEADLINE set. Writes
``<out_dir>/<name>_<suffix>.txt`` — the before/after plan evidence the
optimization rounds commit under plans/r13/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from etl_notifier_pipeline_spark import plans
    from etl_notifier_pipeline_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dump_plans")
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    for name in names:
        spec = plans.get(name)
        try:
            df = spec.fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure in the file
            txt = f"ERROR: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n{txt}")
        print(name, "ok" if not txt.startswith("ERROR") else txt[:80])


if __name__ == "__main__":
    main()
