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
