"""Sub-quadratic growth evidence for the dedup/ANN candidate generators.

The r4 verdict's scale ask, part (b): show the quadratic-trap operators'
cost growing ~linearly in CANDIDATE PAIRS as the corpus grows — the
pair count is the honest cost currency for LSH/SimHash/blocked dedup
(an all-pairs design would grow pairs R^2 x under R x amplification;
the banded designs must grow them ~R x, because tools/scale_up.py salts
near-dup structure per-replica).

For each fixture dir and each growth query, records wall seconds and
output rows (for the pair generators the output IS the candidate/match
pair set; for d06/s09 it is clusters/survivors, which bounds pairs).
Prints one JSON doc mapping sf dir -> query -> {sec, rows}.

Usage: python tools/scale_growth.py /root/testdata/sf0.1 \
           /root/repo/.scale/sf1 /root/repo/.scale/sf10 \
           [--json SCALE_GROWTH.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_notifier_pipeline_spark import caching, plans  # noqa: E402
from etl_notifier_pipeline_spark.session import get_spark  # noqa: E402

GROWTH_QUERIES = [
    "d04_minhash_lsh_pairs",   # banded MinHash candidate pairs
    "d07_simhash_pairs",       # byte-banded SimHash match pairs
    "d06_dedup_clusters",      # connected components over the pair graph
    "s09_semantic_dedup",      # IVF-cell-blocked semantic survivors
    "d13_incremental_dedup",   # batch-vs-corpus banded increment
    "x29_substring_dup_fraction",  # windowed shingle self-similarity
]


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dirs = args or [
        "/root/testdata/sf0.1",
        "/root/repo/.scale/sf1",
        "/root/repo/.scale/sf10",
    ]
    spark = get_spark("scale-growth")
    out: dict[str, dict[str, dict]] = {}
    for sf_dir in sf_dirs:
        out[sf_dir] = {}
        for name in GROWTH_QUERIES:
            fn = plans.get(name).fn
            t0 = time.perf_counter()
            try:
                # noop write, not count(): count() lets Catalyst prune
                # un-consumed subtrees (d13's left join vanished and
                # "ran" in 0.7s at every scale); the noop sink forces
                # every column of the real plan.
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
                rows = df.count()
            except Exception as exc:  # record the failure, keep sweeping
                wall = time.perf_counter() - t0
                out[sf_dir][name] = {
                    "sec": round(wall, 3),
                    "rows": None,
                    "err": type(exc).__name__,
                }
                print(f"{sf_dir} {name}: FAILED {type(exc).__name__} "
                      f"after {wall:.2f}s", flush=True)
                caching.release_all()
                continue
            caching.release_all()
            out[sf_dir][name] = {"sec": round(wall, 3), "rows": rows}
            print(f"{sf_dir} {name}: {rows:,} rows in {wall:.2f}s", flush=True)
            if json_out:  # partial results survive a crash
                with open(json_out, "w") as f:
                    json.dump(
                        {"metric": "scale_growth", "results": out}, f,
                        indent=1, sort_keys=True,
                    )
    doc = {"metric": "scale_growth", "results": out}
    print(json.dumps(doc))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
