"""Plan audit: one-line physical-plan summary for every registered
query — exchanges (shuffles), broadcasts, scans with pruned schemas,
Python-eval nodes (should be none outside pandas-path operators), and
a RESCAN flag when a fact table appears in more than one FileScan.

A RESCAN is not automatically wrong — self-joins (stream x stream,
corpus x query set) and two-pass global scalars legitimately read a
table twice with different pushed filters — but every flagged query
should have a docstring saying WHY (the q43/q44 lesson: Spark's
exchange reuse misses aggregate+join-back branches whose pruning
differs, silently doubling fact I/O).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> None:
    from etl_notifier_pipeline_spark import plans
    from etl_notifier_pipeline_spark.session import get_spark

    FACTS = ("lineitem", "orders", "events", "documents", "embeddings")

    spark = get_spark("plan_audit")
    # Wide scans (> the default 25-field maxToStringFields) get their
    # toString output list elided to "... N more fields", whose commas
    # the width count below would miscount as columns. Diagnostic-only
    # session: raise the cap so the bracketed list is always complete.
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    print(f"{'query':34} {'shuffles':>8} {'bcasts':>6} {'scans':>5} "
          f"{'python':>6}  scan columns / rescans")
    for name, spec in plans.specs().items():
        if spec.category == "streaming" and spec.oracle is None:
            print(f"{name:34} {'-':>8} {'-':>6} {'-':>5} {'-':>6}  (side-effecting sim)")
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name:34} ERROR {str(e)[:60]}")
            continue
        shuffles = len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", plan))
        bcasts = plan.count("BroadcastExchange")
        scans = plan.count("FileScan")
        python = len(re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", plan))
        # Column width from the FileScan OUTPUT list, one per scan
        # line. (The old ReadSchema regex used [^>]*, which crosses
        # newlines whenever Spark's toString truncates a long line
        # before the closing '>' — it then swallowed the next scans
        # whole and reported phantom 27-column reads on fully-pruned
        # 6-column plans. The bracketed output list is never
        # truncated mid-line for these plans and splits safely: the
        # attribute names carry no commas, unlike decimal(p,s) types.)
        widths = [
            len(m.split(","))
            for line in plan.splitlines()
            # bracket-free prefix: catalog-qualified scans print as
            # "FileScan parquet db.t[...]" — dotted name, no space
            # before the bracket — which the old "\w+ \[" missed
            for m in re.findall(r"FileScan [^\[\]]*\[([^\]]*)\]", line)
        ]
        rescans = {
            t: n
            for t in FACTS
            if (n := sum(1 for line in plan.splitlines()
                         if "FileScan" in line and f"/{t}.parquet" in line)) > 1
        }
        flag = f"  RESCAN {rescans}" if rescans else ""
        print(f"{name:34} {shuffles:>8} {bcasts:>6} {scans:>5} {python:>6}  {widths}{flag}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
