"""Round-13 optimization measurement harness.

Times declared queries in ISOLATION (same warm-session footing as
bench.py: canary + 10-query untimed warmup) and captures
``.explain("formatted")`` for each, so plan shape and wall seconds
can be compared before/after a change (guide §1).

Usage:
    python scripts/opt_measure.py q288_streaming_store_gate q216_release_funnel
    python scripts/opt_measure.py --explain-dir plans/r13 --suffix before q288...
    python scripts/opt_measure.py --noop q26_cosine_neardup

Timing action is ``df.count()`` by default — identical to bench.py so
numbers are comparable with the driver's artifact; ``--noop`` adds a
noop-sink timing per guide §1.4 (computes every column, isolates the
computation from the count-prune effect).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ai_data_pipeline_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="also time via noop sink")
    ap.add_argument("--explain-dir", default=None, help="write <name>_<suffix>.txt explain files here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_spark("opt-measure")
    queries = entrymod.queries()
    sf_dir = args.sf_dir

    # same warm footing as bench.py (JIT warmup; see bench.py comment)
    if not args.no_warm:
        queries["q02_broadcast_join"](spark, sf_dir).collect()
        for warm_name in (
            "q01_scan_filter_project", "q03_revenue_by_nation", "q08_agg_suite",
            "q12_analytic_window", "q14_global_topk", "q15a_intersect",
            "q16_string_functions", "q42_window_suite", "q44_pivot_counts",
            "q53_rank_fns",
        ):
            queries[warm_name](spark, sf_dir).count()

    canary = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2654435761 % 1000003) AS s").collect()
        canary = min(canary or 9e9, time.perf_counter() - t0)
    print(f"canary_sec={canary:.3f}")

    for name in args.names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"# wrote {path}")
        best, n = None, 0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best or 9e9, time.perf_counter() - t0)
        if best is None:  # --reps 0: plan capture only
            continue
        line = f"{name}: count={best:.3f}s rows={n}"
        if args.noop:
            bestn = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                bestn = min(bestn or 9e9, time.perf_counter() - t0)
            line += f" noop={bestn:.3f}s"
        spark.sparkContext.setJobDescription(None)
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
