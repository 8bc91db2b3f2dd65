"""Round-6 extraction fast-path pins.

The optimization round replaced three per-query constant factors on
the shared points pipeline — the per-query GCP-fit Spark job (now a
memoized kernel fit from the literal fixture), format_string media_ref
rendering (now fixed-scale decimal casts), and regexp_extract payload
parsing (now substring_index) — each claimed BIT-IDENTICAL to the
path it replaced.  These tests pin those claims over the full
sf0.001 corpus so a future edit cannot silently diverge."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from transformio_spark.operators import extract
from transformio_spark.sources import synth

_NUM = r"(-?[0-9]+\.?[0-9]*)"


def test_cached_affine_bit_equals_spark_fit(spark):
    a_fast = extract.px2geo_affine()
    a_spark = extract.fit_px2geo_affine(synth.gcps(spark))
    assert a_fast.shape == a_spark.shape == (3, 3)
    assert np.array_equal(a_fast, a_spark)


def test_media_ref_rendering_matches_format_string(spark, sf_dir):
    """Every media_ref emitted by docs_spans equals the original
    format_string('%.4f'/'%.2f') rendering, string-for-string."""
    docs = synth.docs_spans(spark, sf_dir)
    media = docs.select(
        F.explode(
            F.filter("spans", lambda s: s["kind"] == F.lit("media"))
        ).alias("span")
    ).select(F.col("span.media_ref").alias("ref"))
    kind = F.substring_index(F.col("ref"), ":", 1)
    payload = F.substring_index(F.col("ref"), ":", -1)
    x = F.substring_index(payload, ",", 1).cast("double")
    y = F.substring_index(payload, ",", -1).cast("double")
    refmt = F.when(
        kind == "px", F.format_string("px:%.2f,%.2f", x, y)
    ).otherwise(F.format_string("geo:%.4f,%.4f", x, y))
    n_bad = media.where(refmt != F.col("ref")).count()
    assert n_bad == 0


def test_media_only_docs_extraction_identical(spark, sf_dir):
    """extract_coordinates over docs_spans(media_only=True) returns
    exactly the same rows as over the full interleaved table — the
    points family's 'project early' rewrite drops only never-observed
    text spans."""
    a = extract.px2geo_affine()
    full = extract.extract_coordinates(
        synth.docs_spans(spark, sf_dir), a
    )
    slim = extract.extract_coordinates(
        synth.docs_spans(spark, sf_dir, media_only=True), a
    )
    assert slim.schema == full.schema
    assert slim.count() == full.count() > 0
    assert slim.exceptAll(full).count() == 0
    assert full.exceptAll(slim).count() == 0


def test_substring_parse_matches_regex(spark, sf_dir):
    """media_points' substring parse == the original regexp_extract
    parse on every span of the corpus (kind, raw_x, raw_y)."""
    docs = synth.docs_spans(spark, sf_dir)
    fast = extract.media_points(docs)
    media = docs.select(
        "doc_id",
        F.posexplode(
            F.filter("spans", lambda s: s["kind"] == F.lit("media"))
        ).alias("span_pos", "span"),
    )
    ref = F.col("span.media_ref")
    slow = media.select(
        "doc_id",
        "span_pos",
        F.regexp_extract(ref, r"^(geo|px):", 1).alias("ref_kind"),
        F.regexp_extract(ref, rf"^[a-z]+:{_NUM},", 1)
        .cast("double")
        .alias("raw_x"),
        F.regexp_extract(ref, rf",{_NUM}$", 1).cast("double").alias("raw_y"),
    )
    joined = fast.alias("a").join(slow.alias("b"), ["doc_id", "span_pos"])
    n_bad = joined.where(
        (F.col("a.ref_kind") != F.col("b.ref_kind"))
        | (F.col("a.raw_x") != F.col("b.raw_x"))
        | (F.col("a.raw_y") != F.col("b.raw_y"))
    ).count()
    assert n_bad == 0
    assert fast.count() == slow.count() > 0
