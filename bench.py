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

# round-2 operators, timed additively — NOT in the headline total so
# BENCH_rN totals stay comparable across rounds
EXTRA = [
    "pip_polygon",            # arbitrary-ring ray-cast PIP
    "mercator_cells",         # MapProjection chain (Column-compiled)
    "mollweide_cells",        # world projection via Newton aggregate fold
    "polar_cells",            # ellipsoidal polar stereographic codegen
    "robinson_cells",         # spline-table projection codegen
    "minhash_pairs",          # shingle→minhash→band join→verify
    "token_stats",            # BPE-ish regex + rolling fingerprint
    "embedding_ivf",          # IVF-Flat ANN: cell equi-join + re-rank
    "embedding_int8_rerank",  # int8 quantized dot -> exact re-rank
    # round-4 additions
    "simhash_buckets",        # md5-bit SimHash (explode+64-sum groupBy)
    "media_features",         # real TIFF/WAV container decode pipeline
    "warp_affine_checksums",  # distributed tiled warp + Column byte aggs
    "neardup_components",     # LSH pairs -> connected components
    "streaming_window_counts",  # AvailableNow windowed streaming drain
    "radius_join",            # range join as tile-cover equi-join
    "events_asof_join",       # as-of join via union + window pass
    "ngram_jaccard_pairs",    # word-trigram Jaccard via shared LSH plan
    "curation_funnel",        # dedup->components->quality composite
    # round-5 additions
    "utm_cells",              # per-zone Krüger-series UTM, F.expr codegen
    "lcc_cells",              # Lambert conformal conic 2SP, F.expr codegen
    "laea_cells",             # Lambert azimuthal equal-area, F.expr codegen
    "ease_cells",             # EASE-Grid 2.0 cylindrical equal-area, F.expr codegen
    "zonal_stats",            # per-region raster band sums, broadcast prune + JVM fold
    "raster_histogram",       # exact per-band histogram, partial-agg collapse
    "tile_rollup",            # two-level Morton rollup, bit-arithmetic re-key
    "length_quantiles",       # exact per-lang percentile (sort-based, not approx)
    "session_window_overlap", # bucketed interval grid join, zero-dedup-shuffle
    "polygon_areas",          # exact shoelace ring metrics, decimal centroid sums
    "hotspot_focal",          # sparse-grid 3x3 focal sum, spread/gather/support
    "idw_surface",            # literal-centers IDW interpolation, zero joins
    "trajectory_stats",       # window-lag track steps, single shuffle
    "grid_dbscan",            # density clusters, neighbor equi-join + CC
    "geohash_counts",         # published base32 encoding, pure codegen
    "gc_waypoints",           # slerp route densification, explode + agg
    "sequence_packing",       # two-level distributed prefix-sum packing
    "stratified_sample",      # md5-deterministic per-stratum sampling
    "event_sessions",         # gap sessionization, single-shuffle windows
    "decontamination",        # benchmark n-gram overlap, broadcast join
    "repetition_scores",      # repeated-ngram quality signal, pure Column
    "s2_cells",               # spherical cube-face Hilbert cells, LUT codegen
    "s2_rollup",              # hierarchical S2 re-key, Hilbert-prefix bit shift
    "hexbin_counts",          # equal-area hex binning, shared-SQL codegen
    "pii_redaction",          # regex scrub stage, JVM regexp_count/replace
    "unigram_nll",            # CCNet-style perplexity filter, two-pass LM
    "inverted_index",         # BM25-prep postings build, two hash aggs
    "doc_chunks",             # sliding-window chunker, array codegen
    # embedding_neardup_pairs is gate-verified but excluded here: its
    # oracle-pinned params (2 planes) degenerate to near-all-pairs on
    # the 2000-vector sf0.1 corpus — not an informative timing
]


def _points_table_path(spark, sf_dir: str) -> str:
    """Materialize (idempotently) the extracted (lon, lat) point table
    shared by the canary and reference_compare."""
    import hashlib as _hl

    key = _hl.md5(f"{sf_dir}|points".encode()).hexdigest()[:10]
    pts_path = f"/tmp/transformio_bench_pts_{key}"
    if not os.path.exists(os.path.join(pts_path, "_SUCCESS")):
        from transformio_spark.operators import extract
        from transformio_spark.sources import synth

        affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
        docs = synth.docs_spans(spark, sf_dir)
        extract.extract_coordinates(docs, affine_a).select(
            "lon", "lat"
        ).write.mode("overwrite").parquet(pts_path)
    return pts_path


def contention_canary(pts_path: str) -> dict:
    """Single-threaded reference-numpy job (poly-2 predict + haversine
    over the 800k-point table) + the host load averages.  Quiet hosts
    run it in ~0.2-0.7 s; noisy-neighbor windows inflate it 10-100x.
    Recorded before and after every measured section so the bench
    artifact is self-adjudicating about contention (round-4 verdict:
    a single contended sample cost the round its headline number)."""
    import sys as _sys
    import time as _t

    import numpy as np
    import pyarrow.parquet as pq

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from ref_loader import load_reference_modules

    from transformio_spark.plans.queries import POLY2_A

    rtrans, racc, _ = load_reference_modules()
    A6 = np.eye(6)
    A6[0, :] = POLY2_A[0]
    A6[1, :] = POLY2_A[1]
    trans = rtrans.Polynomial(A=A6)
    t0 = _t.perf_counter()
    tbl = pq.read_table(pts_path, columns=["lon", "lat"])
    lon = tbl["lon"].to_numpy(zero_copy_only=False)
    lat = tbl["lat"].to_numpy(zero_copy_only=False)
    px, py = trans.predict(lon, lat)
    racc.distances(lon, lat, px, py, "geodesic")
    wall = _t.perf_counter() - t0
    la1, la5, la15 = os.getloadavg()
    return {
        "canary_sec": round(wall, 3),
        "load_1m": round(la1, 2),
        "load_5m": round(la5, 2),
    }


def materialize_scale_corpus(spark, sf_dir: str, factor: int = 8) -> str:
    """Write the amplified docs corpus to parquet once (idempotent,
    keyed by sf+factor).  The scaling probe measures the PIPELINE from
    storage — on a real cluster docs live in Iceberg, not in a
    just-synthesized DataFrame; corpus generation is not part of the
    measured job."""
    import hashlib

    from pyspark.sql import functions as F

    from transformio_spark.sources import synth

    key = hashlib.md5(f"{sf_dir}|{factor}".encode()).hexdigest()[:10]
    path = f"/tmp/transformio_bench_docs_{key}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = synth.docs_spans(spark, sf_dir)
        amp = docs
        for i in range(1, factor):
            amp = amp.unionAll(
                docs.withColumn("doc_num", F.col("doc_num") + F.lit(i * 100_000_000))
            )
        amp.write.mode("overwrite").parquet(path)
    return path


def scale_job(spark, docs_path: str, sf_dir: str, runs: int = 3) -> tuple[int, float]:
    """The scaling-efficiency probe (north rule: throughput at N vs 4N
    executors): the full flagship pipeline FROM STORAGE — parquet docs
    scan → media-span extract → fitted-affine decode → tile encode →
    broadcast hash spatial join → per-region counts.  One warm-up run
    amortizes JIT/codegen, then best-of-``runs`` is reported."""
    import time as _t

    from pyspark.sql import functions as F

    from transformio_spark.functions import tiles as _tiles
    from transformio_spark.operators import extract, spatial_join
    from transformio_spark.plans.queries import (
        _grid_key_from_box,
        _grid_key_from_coords,
    )
    from transformio_spark.sources import synth

    affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
    boxes = synth.region_boxes(spark, sf_dir)

    def pipeline():
        docs = spark.read.parquet(docs_path)
        pts = extract.extract_coordinates(docs, affine_a)
        joined = spatial_join.broadcast_contains_join(
            pts, boxes,
            point_key=_grid_key_from_coords, box_key=_grid_key_from_box,
        )
        return (
            joined.withColumn(
                "tile_id", _tiles.tile_id(F.col("lon"), F.col("lat"), 10)
            )
            .groupBy("region_id")
            .agg(
                F.count(F.lit(1)).alias("n_points"),
                F.countDistinct("tile_id").alias("n_tiles"),
            )
        )

    n_rows = pipeline().agg(F.sum("n_points")).collect()[0][0]  # warm-up
    best = float("inf")
    for _ in range(runs):
        t0 = _t.perf_counter()
        pipeline().collect()
        best = min(best, _t.perf_counter() - t0)
    return int(n_rows), best


def skew_probe(spark, docs_path: str, sf_dir: str) -> dict:
    """Explicit-salting evidence (north rule: skew handled explicitly):
    a genuinely skewed SHUFFLE join — broadcast disabled, AQE skew-join
    disabled — of Zipf-hot tile keys against a per-tile dim table,
    salted vs unsalted.  Returns both walls + the (asserted-equal) row
    counts.  AQE skew handling is re-enabled afterwards (it stays on in
    production as belt-and-braces; this probe isolates OUR salting)."""
    import time as _t

    from pyspark.sql import functions as F

    from transformio_spark.functions import tiles
    from transformio_spark.operators import extract
    from transformio_spark.sources import synth

    zoom = 8
    affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
    docs = spark.read.parquet(docs_path)
    pts = extract.extract_coordinates(docs, affine_a).withColumn(
        "tile_id", tiles.tile_id(F.col("lon"), F.col("lat"), zoom)
    )
    dim = pts.select("tile_id").distinct().withColumn(
        "tile_weight", F.pmod(F.col("tile_id"), F.lit(97))
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        def run_join(n_salt: int) -> tuple[float, int]:
            p, d = pts, dim
            if n_salt > 1:
                p = p.withColumn("salt", F.pmod(F.col("doc_num"), F.lit(n_salt)))
                d = d.withColumn(
                    "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
                )
                keys = ["tile_id", "salt"]
            else:
                keys = ["tile_id"]
            j = p.join(d, on=keys).groupBy().agg(
                F.count(F.lit(1)).alias("n"), F.sum("tile_weight").alias("w")
            )
            t0 = _t.perf_counter()
            row = j.collect()[0]
            return _t.perf_counter() - t0, (row.n, row.w)

        def best_of(n_salt: int, k: int = 2) -> tuple[float, int]:
            best_wall, res = float("inf"), None
            for _ in range(k):
                w, r = run_join(n_salt)
                best_wall, res = min(best_wall, w), r
            return best_wall, res

        # warm both variants (codegen/JIT), then best-of-2 each —
        # single-shot timing is hostage to noisy-neighbor windows
        run_join(1)
        run_join(16)
        un_wall, un_res = best_of(1)
        sa_wall, sa_res = best_of(16)
        assert un_res == sa_res, "salted join changed results!"
        return {
            "unsalted_sec": round(un_wall, 4),
            "salted_sec": round(sa_wall, 4),
            "rows": un_res[0],
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", old_skew)


def reference_compare(spark, sf_dir: str) -> dict:
    """Single-node reference vs engine on the SAME rows and the SAME
    math — the 'matches-or-beats the reference's single-node
    throughput' evidence (the reference publishes no numbers, but it
    is vendored and importable, so we measure it directly).

    Workload: order-2 polynomial predict (reference transforms.py
    Polynomial.predict) + R=6367 haversine distance (reference
    accuracy.py distances 'geodesic') over the 6.4M-point corpus,
    reduced to checksum sums.  The reference side is pyarrow parquet
    read -> whole-array numpy (its native execution model, best case:
    zero Python loop); the engine side is the Spark scan -> Column
    codegen path at local[N].  Both sides include data access."""
    import sys
    import time as _t

    import numpy as np
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from ref_loader import load_reference_modules

    from transformio_spark.functions import geo
    from transformio_spark.plans.queries import POLY2_A

    rtrans, racc, _ = load_reference_modules()

    # materialize the extracted (lon, lat) point table once — both
    # sides read the SAME parquet file.  Unamplified corpus (800k
    # points at sf0.1): big enough to measure, small enough that the
    # single-threaded reference side cannot blow the bench wall-time
    # under noisy-neighbor contention.
    pts_path = _points_table_path(spark, sf_dir)

    # --- reference (single-node numpy), best of 2 ---
    # POLY2_A carries rows 0-1; the reference wants the full 6x6
    # (its fit writes rows 0-1 of an identity matrix)
    A6 = np.eye(6)
    A6[0, :] = POLY2_A[0]
    A6[1, :] = POLY2_A[1]
    trans = rtrans.Polynomial(A=A6)
    ref_sec = float("inf")
    for _ in range(2):
        t0 = _t.perf_counter()
        tbl = pq.read_table(pts_path, columns=["lon", "lat"])
        lon = tbl["lon"].to_numpy(zero_copy_only=False)
        lat = tbl["lat"].to_numpy(zero_copy_only=False)
        px, py = trans.predict(lon, lat)
        dist = racc.distances(lon, lat, px, py, "geodesic")
        ref_checksum = float(px.sum() + py.sum() + dist.sum())
        ref_sec = min(ref_sec, _t.perf_counter() - t0)

    # --- engine (Spark scan + codegen), best of 2 ---
    epx, epy = geo.polynomial_predict(POLY2_A, 2, F.col("lon"), F.col("lat"))
    edist = geo.haversine_km(F.col("lon"), F.col("lat"), epx, epy)
    eng_sec = float("inf")
    for _ in range(2):
        t0 = _t.perf_counter()
        df = spark.read.parquet(pts_path).select("lon", "lat")
        row = (
            df.select(epx.alias("px"), epy.alias("py"), edist.alias("d"))
            .agg(
                F.sum("px").alias("sx"), F.sum("py").alias("sy"),
                F.sum("d").alias("sd"), F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        eng_sec = min(eng_sec, _t.perf_counter() - t0)
    eng_checksum = float(row.sx + row.sy + row.sd)

    assert abs(ref_checksum - eng_checksum) < abs(ref_checksum) * 1e-9 + 1e-6, (
        ref_checksum, eng_checksum,
    )
    n = int(row.n)
    return {
        "points": n,
        "ref_single_node_sec": round(ref_sec, 4),
        "engine_sec": round(eng_sec, 4),
        "ref_points_per_sec": round(n / ref_sec, 2),
        "engine_points_per_sec": round(n / eng_sec, 2),
        "engine_vs_ref": round(ref_sec / eng_sec, 3),
    }


def scaling_pairings(sf_dir: str, docs_path: str,
                     quiet: bool = True) -> dict:
    """The north-rule number (BASELINE.json: throughput scaling
    efficiency >= 0.8 from N to 4N executors), evidenced per driver
    instruction as the SAME job at two parallelism levels.  Runs the
    flagship scale job in fresh JVMs at local[2] / local[8] /
    local[32] and reports BOTH N->4N pairings plus the Amdahl
    decomposition (wall = c + W/cores fit over the three points): the
    fixed driver/JVM cost c does not exist per-executor on a real
    cluster, so the parallel-fraction efficiency is reported
    alongside the raw ratio.  Canary-stamped before and after."""
    from transformio_spark.plans.session import build_session

    pre = contention_canary(_CANARY_PTS_PATH)
    walls: dict[int, float] = {}
    for c in (2, 8, 32):
        spark = build_session(app_name=f"bench-scale-{c}", cores=c)
        if quiet:
            spark.sparkContext.setLogLevel("ERROR")
        # 2-core leg: warm-up + 1 timed run (its wall is ~4x the 8-core
        # one; best-of-2 there would double the bench for little info)
        n_points, wall = scale_job(
            spark, docs_path, sf_dir, runs=1 if c == 2 else 2
        )
        walls[c] = wall
        spark.stop()
    post = contention_canary(_CANARY_PTS_PATH)

    # least-squares fit wall = c + W * (1/cores)
    xs = [1.0 / c for c in walls]
    ys = [walls[c] for c in walls]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    W = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    c_fixed = my - W * mx

    def eff(a: int, b: int) -> float:
        return round(walls[a] / ((b // a) * walls[b]), 3)

    def eff_parallel(a: int, b: int) -> float:
        pa, pb = walls[a] - c_fixed, walls[b] - c_fixed
        if pa <= 0 or pb <= 0:
            return float("nan")
        return round(pa / ((b // a) * pb), 3)

    return {
        "job": "flagship pipeline from parquet storage (scale_job)",
        "points": n_points,
        "walls_sec": {str(c): round(w, 3) for c, w in walls.items()},
        "throughput_pts_per_sec": {
            str(c): round(n_points / w, 1) for c, w in walls.items()
        },
        "eff_2_to_8": eff(2, 8),
        "eff_8_to_32": eff(8, 32),
        "amdahl_fixed_cost_sec": round(c_fixed, 3),
        "amdahl_parallel_work_core_sec": round(W, 3),
        "eff_parallel_2_to_8": eff_parallel(2, 8),
        "eff_parallel_8_to_32": eff_parallel(8, 32),
        "canary_pre": pre,
        "canary_post": post,
        "clean": bool(
            pre["canary_sec"] < 2.0 and post["canary_sec"] < 2.0
        ),
    }


_CANARY_PTS_PATH: str = ""


def run(cores: int, sf_dir: str, repeat: int = 2, quiet: bool = True,
        scale_factor: int = 8) -> dict:
    global _CANARY_PTS_PATH

    from transformio_spark.plans import queries as q
    from transformio_spark.plans.session import build_session

    spark = build_session(app_name=f"bench-{cores}", cores=cores)
    if quiet:
        spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()

    # count the docs once (drives the docs/sec north-star number) and
    # materialize the canary's point table before anything is timed
    n_docs = q.points_df(spark, sf_dir).count()
    _CANARY_PTS_PATH = _points_table_path(spark, sf_dir)

    canary_pre = contention_canary(_CANARY_PTS_PATH)

    def sweep(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = qmap[name]
            best = float("inf")
            for _ in range(max(1, repeat)):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 4)
        return out

    timings = sweep(HEADLINE)
    extra_timings = sweep(EXTRA)
    canary_mid = contention_canary(_CANARY_PTS_PATH)

    pipeline_sec = timings["region_join_bcast"]
    docs_path = materialize_scale_corpus(spark, sf_dir, scale_factor)
    skew = skew_probe(spark, docs_path, sf_dir)
    # the scaling section runs in FRESH JVMs: heap/GC state left by
    # the headline queries adds multi-second noise that swamps the
    # core-count comparison (observed 2.9s -> 7.9s on identical work)
    spark.stop()
    scaling = scaling_pairings(sf_dir, docs_path, quiet)

    spark = build_session(app_name=f"bench-refcmp-{cores}", cores=cores)
    if quiet:
        spark.sparkContext.setLogLevel("ERROR")
    ref_cmp = reference_compare(spark, sf_dir)
    canary_post = contention_canary(_CANARY_PTS_PATH)
    total = round(sum(timings.values()), 4)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra_timings,
        "sf": sf_dir,
        "cores": cores,
        "repeat": max(1, repeat),
        "docs_media_points": n_docs,
        "docs_per_sec_pipeline": round(n_docs / pipeline_sec, 2),
        "scale_points": scaling["points"],
        "scale_wall_sec": scaling["walls_sec"]["32"],
        "scale_points_per_sec": scaling["throughput_pts_per_sec"]["32"],
        "scaling": scaling,
        "skew_probe": skew,
        "reference_compare": ref_cmp,
        # contention self-adjudication (round-4 verdict): quiet host
        # ~0.2-0.7 s; >2 s means the surrounding numbers are inflated
        # by neighbors, not by plan changes
        "canary_pre": canary_pre,
        "canary_mid": canary_mid,
        "canary_post": canary_post,
    }
    spark.stop()
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    print(json.dumps(run(args.cores, args.sf_dir, args.repeat)))


if __name__ == "__main__":
    main()
