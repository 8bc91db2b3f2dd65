"""Tier-3: lineage checkpointing + kill-and-resume (FIXTURES.md §6).

Run the tile sweep, crash after K of M units, rerun with the same
run_id: completed units must be skipped and the final output must
equal an uninterrupted run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transformio_spark.functions import tiles
from transformio_spark.operators import extract
from transformio_spark.plans.pipeline import TileSweepPipeline
from transformio_spark.sources import synth


@pytest.fixture(scope="module")
def tiled_points(spark, sf_dir):
    docs = synth.docs_spans(spark, sf_dir)
    affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
    pts = extract.extract_coordinates(docs, affine_a)
    return pts.withColumn(
        "tile_id", tiles.tile_id(F.col("lon"), F.col("lat"), 4)
    ).cache()


def _transform(df):
    return df.groupBy("tile_id").agg(F.count(F.lit(1)).alias("n"))


def _collect(spark, pipe, table):
    return sorted(
        (r.tile_id, r.n) for r in pipe.catalog.read(spark, table).collect()
    )


def test_kill_and_resume_equals_uninterrupted(spark, tiled_points, tmp_path):
    units = TileSweepPipeline.tile_ranges(zoom=4, n_units=8)

    # uninterrupted reference run
    ref = TileSweepPipeline(spark, str(tmp_path / "ref"), run_id="r0")
    t_ref = ref.run_stage("tilecount", tiled_points, "tile_id", units, _transform)
    expected = _collect(spark, ref, t_ref)

    # crash after 3 units
    pipe = TileSweepPipeline(spark, str(tmp_path / "rt"), run_id="r1")
    with pytest.raises(RuntimeError, match="injected failure"):
        pipe.run_stage(
            "tilecount", tiled_points, "tile_id", units, _transform, fail_after=3
        )
    done_after_crash = pipe.lineage.completed_units(spark, "r1", "tilecount")
    assert len(done_after_crash) == 3

    # resume with the same run_id — must skip the 3 completed units
    pipe2 = TileSweepPipeline(spark, str(tmp_path / "rt"), run_id="r1")
    t_out = pipe2.run_stage(
        "tilecount", tiled_points, "tile_id", units, _transform
    )
    assert _collect(spark, pipe2, t_out) == expected

    # lineage is complete and carries metrics
    lin = pipe2.lineage.read(spark)
    rows = lin.where(
        (F.col("run_id") == "r1") & (F.col("status") == "done")
    ).collect()
    assert len(rows) == len(units)
    assert all(r.wall_ms >= 0 and r.output_rows >= 0 for r in rows)


def test_rerun_is_idempotent_noop(spark, tiled_points, tmp_path):
    units = TileSweepPipeline.tile_ranges(zoom=4, n_units=4)
    pipe = TileSweepPipeline(spark, str(tmp_path / "rr"), run_id="r2")
    t1 = pipe.run_stage("s", tiled_points, "tile_id", units, _transform)
    snaps_before = len(pipe.catalog.snapshots(t1))
    # second run: all units complete → no new snapshots
    pipe.run_stage("s", tiled_points, "tile_id", units, _transform)
    assert len(pipe.catalog.snapshots(t1)) == snaps_before


def test_lineage_scales_to_10k_units(spark, tmp_path):
    """Round 4: lineage is parquet-per-unit read via a DISTRIBUTED
    spark.read (round-3 verdict: the driver-side json loop would
    bottleneck resume at the 10^5-10^6-unit production sweep).  A
    synthetic 10^4-unit log must index and filter correctly."""
    from transformio_spark.plans.pipeline import LineageLog

    log = LineageLog(str(tmp_path))
    for i in range(10_000):
        log.record(
            run_id="big", stage="s0" if i % 2 == 0 else "s1",
            unit_key=f"u{i:05d}", input_rows=i, output_rows=i // 2,
            metrics_json="{}", wall_ms=1, status="done" if i % 10 else "fail",
        )
    done = log.completed_units(spark, "big", "s0")
    # even i, excluding i % 10 == 0 (status=fail)
    expect = {f"u{i:05d}" for i in range(10_000) if i % 2 == 0 and i % 10}
    assert done == expect
    df = log.read(spark)
    assert df.count() == 10_000
    assert df.schema.simpleString().startswith("struct<run_id:string")


def test_catalog_time_travel_rollback_incremental(spark, tmp_path):
    """Iceberg-shaped snapshot semantics on the catalog seam: append
    snapshots accumulate, time-travel reads an old snapshot,
    incremental reads only the delta, rollback is a new snapshot."""
    from transformio_spark.sources.catalog import ParquetSnapshotCatalog

    cat = ParquetSnapshotCatalog(str(tmp_path / "tables"))
    df1 = spark.range(0, 5).withColumnRenamed("id", "v")
    df2 = spark.range(5, 8).withColumnRenamed("id", "v")
    cat.write(df1, "t", mode="overwrite")           # snap 0
    cat.write(df2, "t", mode="append")              # snap 1

    vals = lambda df: sorted(r.v for r in df.collect())
    assert vals(cat.read(spark, "t")) == list(range(8))
    assert vals(cat.read(spark, "t", snapshot=0)) == list(range(5))
    assert vals(cat.read_incremental(spark, "t", 0)) == [5, 6, 7]
    assert vals(cat.read_incremental(spark, "t", 0, 0)) == []

    cat.rollback("t", 0)                            # snap 2 = snap 0 files
    assert vals(cat.read(spark, "t")) == list(range(5))
    snaps = cat.snapshots("t")
    assert len(snaps) == 3 and snaps[2]["mode"] == "rollback-to-0"


def test_incremental_read_rejects_non_append_ranges(spark, tmp_path):
    """ADVICE r4: a file-set diff across an overwrite snapshot would
    report pre-existing rows as 'added' — the catalog must raise on
    non-append ranges (Iceberg's own incremental scan does) and
    bounds-check from_snapshot with ValueError, not IndexError."""
    from transformio_spark.sources.catalog import ParquetSnapshotCatalog

    cat = ParquetSnapshotCatalog(str(tmp_path / "tables"))
    v = lambda a, b: spark.range(a, b).withColumnRenamed("id", "v")
    cat.write(v(0, 5), "t", mode="overwrite")   # snap 0
    cat.write(v(5, 8), "t", mode="append")      # snap 1
    cat.write(v(0, 9), "t", mode="overwrite")   # snap 2 (rewrite)
    cat.write(v(9, 11), "t", mode="append")     # snap 3

    # append-only sub-ranges still work
    vals = lambda df: sorted(r.v for r in df.collect())
    assert vals(cat.read_incremental(spark, "t", 0, 1)) == [5, 6, 7]
    assert vals(cat.read_incremental(spark, "t", 2, 3)) == [9, 10]

    with pytest.raises(ValueError, match="non-append snapshots \\[2\\]"):
        cat.read_incremental(spark, "t", 0)     # crosses the overwrite
    with pytest.raises(ValueError, match="no snapshot 99"):
        cat.read_incremental(spark, "t", 99)
    with pytest.raises(ValueError, match="invalid snapshot range"):
        cat.read_incremental(spark, "t", 3, 1)


def test_lineage_read_raises_on_legacy_json_and_migrates(spark, tmp_path):
    """ADVICE r4: a lineage dir holding round-3 .json entries must
    fail loudly (silently ignoring them re-runs and re-appends
    completed units); migrate_legacy_json converts them in place."""
    import json as _json

    from transformio_spark.plans.pipeline import LineageLog

    log = LineageLog(str(tmp_path))
    legacy_row = dict(
        run_id="old", stage="s", unit_key="u1", input_rows=10,
        output_rows=5, metrics_json="{}", wall_ms=3, status="done",
    )
    with open(f"{log.dir}/old-s-u1.json", "w") as f:
        _json.dump(legacy_row, f)
    log.record(
        run_id="new", stage="s", unit_key="u2", input_rows=1,
        output_rows=1, metrics_json="{}", wall_ms=1, status="done",
    )
    with pytest.raises(RuntimeError, match="legacy .json"):
        log.read(spark)

    assert log.migrate_legacy_json() == 1
    df = log.read(spark)
    assert df.count() == 2
    assert log.completed_units(spark, "old", "s") == {"u1"}


def _catalog_conformance(spark, cat):
    """Shared contract both catalog implementations must satisfy."""
    v = lambda a, b: spark.range(a, b).withColumnRenamed("id", "v")
    vals = lambda df: sorted(r.v for r in df.collect())
    cat.write(v(0, 4), "ct", mode="overwrite")
    cat.write(v(4, 6), "ct", mode="append")
    assert cat.exists("ct")
    assert vals(cat.read(spark, "ct")) == list(range(6))
    assert vals(cat.read(spark, "ct", snapshot=0)) == list(range(4))
    assert vals(cat.read_incremental(spark, "ct", 0, 1)) == [4, 5]
    snaps = cat.snapshots("ct")
    assert len(snaps) == 2
    cat.rollback("ct", 0)
    assert vals(cat.read(spark, "ct")) == list(range(4))


def test_parquet_catalog_conformance(spark, tmp_path):
    from transformio_spark.sources.catalog import ParquetSnapshotCatalog

    _catalog_conformance(spark, ParquetSnapshotCatalog(str(tmp_path / "c")))


def test_iceberg_catalog_conformance(spark, tmp_path):
    """Runs the SAME contract against IcebergCatalog when an Iceberg
    runtime is configured; skipped in this sandbox (no jar)."""
    from transformio_spark.sources.catalog import IcebergCatalog

    cat = IcebergCatalog(spark, catalog="spark_catalog")
    try:
        spark.sql("CREATE TABLE IF NOT EXISTS default.__iceberg_probe "
                  "(v bigint) USING iceberg")
        spark.sql("DROP TABLE default.__iceberg_probe")
    except Exception:
        pytest.skip("no Iceberg runtime jar in this environment")
    _catalog_conformance(spark, cat)


def test_iceberg_catalog_surface_matches_parquet_catalog():
    """Even without the jar, the adapter must expose the exact
    ParquetSnapshotCatalog call surface (pipeline code portability)."""
    import inspect

    from transformio_spark.sources.catalog import (
        IcebergCatalog,
        ParquetSnapshotCatalog,
    )

    for meth in ("exists", "write", "read", "snapshots", "rollback",
                 "read_incremental"):
        p_sig = inspect.signature(getattr(ParquetSnapshotCatalog, meth))
        i_sig = inspect.signature(getattr(IcebergCatalog, meth))
        assert list(p_sig.parameters) == list(i_sig.parameters), meth
