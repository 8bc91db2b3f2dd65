"""Bucketed tables → co-located (exchange-free) joins: the storage
lever that removes the shuffle from repeated big-big joins at scale.
Two tables bucketed by the same key must sort-merge join with NO
Exchange in the plan and produce the same rows as the plain join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from transformio_spark.functions import tiles
from transformio_spark.operators import extract
from transformio_spark.sources import synth


def _exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return len(set(re.findall(r"\(\d+\) Exchange", plan)))


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf — the session default
    # (./spark-warehouse, gitignored) is used for these two tables
    affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
    pts = extract.extract_coordinates(
        synth.docs_spans(spark, sf_dir), affine_a
    ).withColumn("tile_id", tiles.tile_id(F.col("lon"), F.col("lat"), 6))

    left = pts.select("doc_num", "tile_id", "lon", "lat")
    right = (
        pts.groupBy("tile_id").agg(F.count(F.lit(1)).alias("tile_total"))
    )
    # the session metastore is in-memory: a previous process's
    # warehouse dirs survive but its tables don't, so DROP can't see
    # them — remove the locations directly
    import shutil

    spark.sql("DROP TABLE IF EXISTS pts_b")
    spark.sql("DROP TABLE IF EXISTS tiles_b")
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    for t in ("pts_b", "tiles_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    left.write.bucketBy(8, "tile_id").sortBy("tile_id").mode(
        "overwrite"
    ).saveAsTable("pts_b")
    right.write.bucketBy(8, "tile_id").sortBy("tile_id").mode(
        "overwrite"
    ).saveAsTable("tiles_b")

    a = spark.table("pts_b")
    b = spark.table("tiles_b")
    # prevent broadcast so the join strategy is genuinely SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "tile_id")
        n_ex = _exchanges(joined)
        assert n_ex == 0, "bucketed join must not shuffle"
        # results equal the plain (shuffling) join
        plain = left.join(right, "tile_id")
        assert joined.count() == plain.count()
        s1 = joined.agg(F.sum("tile_total")).collect()[0][0]
        s2 = plain.agg(F.sum("tile_total")).collect()[0][0]
        assert s1 == s2
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
