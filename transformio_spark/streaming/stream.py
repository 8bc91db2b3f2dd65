"""Structured Streaming ingestion path.

The north rule is batch-with-resume (lineage anti-join, plans/
pipeline.py), so streaming is a thin complement, not the core: a
file-source stream of docs parquet → the SAME extraction + tiling
Column kernels as batch (operators/extract.py — one code path, two
execution modes) → event-time windowed tile counts with a watermark
for late data.  Tested with trigger=availableNow + memory sink.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tiles
from ..operators import extract


def streaming_tile_counts(
    spark: SparkSession,
    docs_dir: str,
    docs_schema,
    affine_A: np.ndarray,
    zoom: int = 6,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """readStream over a docs-parquet directory → media-span extract →
    tile encode → watermarked event-time window counts.

    Docs need an ``event_ts`` timestamp column; late rows beyond the
    watermark are dropped by Spark's state eviction."""
    stream = (
        spark.readStream.schema(docs_schema).parquet(docs_dir)
    )
    # event_ts carried through extraction — no stream-stream join
    pts = extract.extract_coordinates(stream, affine_A, carry=("event_ts",))
    return (
        pts.withColumn(
            "tile_id", tiles.tile_id(F.col("lon"), F.col("lat"), zoom)
        )
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("win"), F.col("tile_id"))
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
