"""Benchmark harness (driver-run per round; also the local feedback loop).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec",
"queries": {name: sec}, "sf", plus docs/sec throughput for the
flagship pipeline — the BASELINE.json north-star metric.}

Usage: python bench.py [--cores N] [--sf-dir DIR] [--repeat K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "region_join_bcast",      # flagship: extract→transform→tile→join
    "region_join_salted",     # explicit-salt shuffle path
    "tile_counts",
    "pip_triangle",
    "knn_city_assign",
    "dedup_exact",
    "embedding_knn_l2",
    "pricing_summary",
]


def run(cores: int, sf_dir: str, repeat: int = 1, quiet: bool = True) -> dict:
    from transformio_spark.plans import queries as q
    from transformio_spark.plans.session import build_session

    spark = build_session(app_name=f"bench-{cores}", cores=cores)
    if quiet:
        spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()

    # count the docs once (drives the docs/sec north-star number)
    n_docs = q.points_df(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qmap[name]
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    pipeline_sec = timings["region_join_bcast"]
    total = round(sum(timings.values()), 4)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cores": cores,
        "docs_media_points": n_docs,
        "docs_per_sec_pipeline": round(n_docs / pipeline_sec, 2),
    }
    spark.stop()
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()
    print(json.dumps(run(args.cores, args.sf_dir, args.repeat)))


if __name__ == "__main__":
    main()
