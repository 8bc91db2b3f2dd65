"""Supplementary measurement harness for the optimization rounds.

NOT the driver-timed artifact (bench.py is frozen for measurement) —
this is the guide-§1 feedback loop: per-query noop-sink isolation,
best-of-K walls, and `.explain("formatted")` capture, so plan claims
in OPTIMIZATION_r*.md are reproducible.

Usage:
  python bench_extra.py --queries gc_waypoints grid_dbscan --repeat 3
  python bench_extra.py --all --repeat 2
  python bench_extra.py --plans-dir plans/r06 --suffix before --queries ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--sink", choices=["noop", "collect"], default="noop")
    ap.add_argument("--plans-dir", default=None,
                    help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="now",
                    help="plan file suffix: <query>_<suffix>.txt")
    args = ap.parse_args()

    from transformio_spark.plans.session import build_session

    spark = build_session(app_name="bench-extra", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    names = list(qmap) if args.all else args.queries
    out: dict[str, float] = {}
    for name in names:
        fn = qmap[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        best = float("inf")
        for _ in range(max(1, args.repeat)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 4)
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sink": args.sink, "repeat": args.repeat,
                      "cores": args.cores, "sf": args.sf_dir,
                      "queries": out,
                      "total": round(sum(out.values()), 4)}))
    spark.stop()


if __name__ == "__main__":
    main()
