"""Structured Streaming path: same kernels as batch, availableNow
trigger, watermark plumbing; stream result must equal the batch
equivalent over the same files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transformio_spark.functions import tiles
from transformio_spark.operators import extract
from transformio_spark.sources import synth
from transformio_spark.streaming import streaming_tile_counts


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
    docs = synth.docs_spans(spark, sf_dir).withColumn(
        "event_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(mins=(F.col("doc_num") % 30).cast("int")),
    )
    docs_dir = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(docs_dir)
    stored = spark.read.parquet(docs_dir)

    # watermark wider than the 30-min event spread: nothing is "late",
    # so the availableNow replay must equal the batch aggregate
    stream_df = streaming_tile_counts(
        spark, docs_dir, stored.schema, affine_a, zoom=5, watermark="1 hour"
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("tile_counts_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win.start, r.tile_id): r.n_points
        for r in spark.sql("select * from tile_counts_stream").collect()
    }

    # carry event_ts through extraction (doc_id is not unique — a
    # join here would multiply rows)
    batch_pts = extract.extract_coordinates(stored, affine_a, carry=("event_ts",))
    expected = {
        (r.win.start, r.tile_id): r.n_points
        for r in batch_pts.withColumn(
            "tile_id", tiles.tile_id(F.col("lon"), F.col("lat"), 5)
        )
        .groupBy(F.window("event_ts", "5 minutes").alias("win"), "tile_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .collect()
    }
    assert got == expected
    assert len(got) > 10


def test_stateful_dedup_accumulates_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState dedup: state (keeper, count) must
    persist across micro-batches via the checkpoint — two separate
    availableNow runs over a growing directory, second run's emitted
    counts include the first run's rows."""
    import os

    from transformio_spark.streaming import streaming_exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    # batch 2 re-ingests batch 1's texts under suffixed ids, so every
    # state key is hit from both micro-batches
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    docs_dir = str(tmp_path / "docs_stream_dedup")
    ckpt = str(tmp_path / "ckpt_dedup")
    half_a.write.mode("overwrite").parquet(os.path.join(docs_dir, "b0"))
    stored_schema = spark.read.parquet(os.path.join(docs_dir, "b0")).schema

    def run_once(qname):
        # foreachBatch (not memory sink): supports checkpoint recovery
        collected = []

        def sink(df, _epoch):
            collected.extend(df.collect())

        out = streaming_exact_dedup(spark, docs_dir + "/*", stored_schema)
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r.fp: (r.keeper, r.group_size) for r in collected}

    first = run_once("dedup_s1")
    n_a = half_a.count()
    assert sum(v[1] for v in first.values()) == n_a
    # batch 2: the SAME rows re-ingested with shifted ids (dup texts)
    half_a.withColumn(
        "doc_id", F.concat(F.lit("z"), F.col("doc_id"))
    ).write.mode("overwrite").parquet(os.path.join(docs_dir, "b1"))
    second = run_once("dedup_s2")
    # every fp re-emitted with cumulative count 2x and the ORIGINAL
    # keeper (ids starting with digits sort before 'z...')
    assert len(second) == len(first)
    for fp, (keeper, cnt) in second.items():
        k1, c1 = first[fp]
        assert cnt == 2 * c1
        assert keeper == k1


def test_streaming_event_window_counts_equals_batch(spark, sf_dir):
    """AvailableNow windowed aggregation drains to the exact batch
    aggregation over the same rows (the driver-gate streaming query)."""
    from pyspark.sql import functions as F

    from transformio_spark.streaming.stream import (
        EVENTS_SCHEMA,
        streaming_event_window_counts,
    )

    got = streaming_event_window_counts(
        spark, f"{sf_dir}/events.parquet"
    ).collect()
    batch = (
        spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")
        .groupBy(
            (F.floor(F.col("ts").cast("long") / 21600) * 21600).alias(
                "win_start_s"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") * 100.0, 0).cast("long").alias("value_e2"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) > 10


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """The stateful streaming twin (applyInPandasWithState) assigns
    the SAME session indexes as the batch window operator — including
    sessions continuing across micro-batch boundaries (events staged
    as two time-ordered batches, two availableNow runs over one
    checkpoint)."""
    import os

    from transformio_spark.operators.temporal import sessionize
    from transformio_spark.streaming import streaming_sessionize
    from transformio_spark.streaming.stream import EVENTS_SCHEMA

    ev = spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    gap = 1800
    expected = {
        (r.user_id, r.event_id): r.session_idx
        for r in sessionize(ev, gap_seconds=gap).collect()
    }

    # stage two time-halves (per-key in-order across batches)
    cut = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).first()[0]
    d = str(tmp_path / "ev_stream")
    ckpt = str(tmp_path / "ckpt_sess")
    ev.where(F.unix_micros("ts") <= cut).write.parquet(os.path.join(d, "b0"))

    collected = {}

    def run_once():
        def sink(df, _epoch):
            for r in df.collect():
                collected[(r.user_id, r.event_id)] = r.session_idx

        out = streaming_sessionize(spark, d + "/*", EVENTS_SCHEMA, gap)
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    ev.where(F.unix_micros("ts") > cut).write.parquet(os.path.join(d, "b1"))
    run_once()

    assert collected == expected
