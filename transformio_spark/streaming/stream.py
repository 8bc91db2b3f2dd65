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


def streaming_exact_dedup(
    spark: SparkSession,
    docs_dir: str,
    docs_schema,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    exact-dedup keyed by md5 fingerprint with per-key state
    (keeper id, cumulative count) that persists across micro-batches
    via the checkpoint — the streaming twin of
    operators/dedup.exact_dedup.

    Each micro-batch emits the key's updated (fp, keeper, group_size);
    keeper = min id seen so far (order-independent, so a replay or a
    different batch split yields the same final state).  At scale the
    state store shards by fp hash across executors — no driver
    state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions import text as T

    stream = spark.readStream.schema(docs_schema).parquet(docs_dir)
    fp_df = stream.select(
        F.col(id_col).cast("string").alias("id"),
        T.fingerprint(F.col(text_col)).alias("fp"),
    )

    def update(key, pdfs, state):
        ids = []
        for pdf in pdfs:
            ids.extend(pdf["id"].tolist())
        keeper, cnt = state.get if state.exists else (None, 0)
        batch_min = min(ids)
        if keeper is None or batch_min < keeper:
            keeper = batch_min
        cnt += len(ids)
        state.update((keeper, cnt))
        yield pd.DataFrame(
            {"fp": [key[0]], "keeper": [keeper], "group_size": [cnt]}
        )

    return fp_df.groupBy("fp").applyInPandasWithState(
        update,
        outputStructType="fp string, keeper string, group_size long",
        stateStructType="keeper string, cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
