"""Spark-layer operator tests: pandas-UDF kernel parity, vector
long-table pipeline vs the reference's dict semantics, span-sequence
invariance, salted==unsalted join equality."""

from __future__ import annotations

import json

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from ref_loader import load_reference_modules
from transformio_spark import kernels as k
from transformio_spark.fixtures import CHINA22_GEOPOINTS, CHINA22_IMPOINTS
from transformio_spark.operators import udfs, vector_geom
from transformio_spark.sources import synth

ref_transforms, ref_accuracy, ref_vector = load_reference_modules()


@pytest.fixture(scope="module")
def poly2_json():
    imx, imy = zip(*CHINA22_IMPOINTS)
    gx, gy = zip(*CHINA22_GEOPOINTS)
    return json.dumps(k.Polynomial(order=2).fit(imx, imy, gx, gy).to_json())


@pytest.fixture(scope="module")
def tin_json():
    imx, imy = zip(*CHINA22_IMPOINTS)
    gx, gy = zip(*CHINA22_GEOPOINTS)
    return json.dumps(k.TIN().fit(imx, imy, gx, gy).to_json())


def test_pandas_udf_matches_kernel(spark, poly2_json):
    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 1100, 2000)
    ys = rng.uniform(0, 1000, 2000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)], "x double, y double"
    )
    out = udfs.with_transformed(df, poly2_json, x="x", y="y").orderBy("x").collect()
    model = k.from_json(json.loads(poly2_json))
    order = np.argsort(xs)
    px, py = model.predict(xs[order], ys[order])
    assert_array_almost_equal([r.pred_x for r in out], px, decimal=10)
    assert_array_almost_equal([r.pred_y for r in out], py, decimal=10)


def test_pandas_udf_tin_nan_outside_hull(spark, tin_json):
    df = spark.createDataFrame(
        [(500.0, 500.0), (99999.0, 99999.0)], "x double, y double"
    )
    rows = (
        udfs.with_transformed(df, tin_json, x="x", y="y").orderBy("x").collect()
    )
    assert rows[0].pred_x is not None and not np.isnan(rows[0].pred_x)
    # outside the TIN hull → NaN sentinel (reference transforms.py:701-702)
    assert rows[1].pred_x is None or np.isnan(rows[1].pred_x)


def test_vector_kernel_parity_vs_reference():
    trans = k.Affine(offset=(10, 20))
    rtrans = ref_transforms.Affine(offset=(10, 20))
    geoj = {
        "type": "Feature",
        "properties": {"name": "t"},
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                 [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]],
                [[[10, 10], [14, 10], [14, 14], [10, 14], [10, 10]]],
            ],
        },
    }
    ours = k.vector.transform(geoj, trans)
    ref = ref_vector.transform(geoj, rtrans)
    assert json.dumps(ours, default=float) == json.dumps(ref, default=float)
    assert list(k.vector.iter_points(geoj)) == list(ref_vector.iter_points(geoj))
    assert k.vector.get_bbox(geoj) == ref_vector.get_bbox(geoj)


def test_vector_long_table_matches_kernel(spark, tin_json):
    """The Spark explode→kernel→filter→renest pipeline must reproduce
    the reference's dict-level transform incl. NaN point drops."""
    imx, imy = zip(*CHINA22_IMPOINTS)
    ring = list(zip(imx, imy)) + [(99999.0, 99999.0), (imx[0], imy[0])]
    geom = {"type": "Polygon", "coordinates": [ring]}
    model = k.from_json(json.loads(tin_json))
    expected = k.vector.transform(geom, model)

    long_df = vector_geom.geojson_to_long(spark, [("g1", geom)])
    out = vector_geom.transform_long(long_df, tin_json)
    nested = vector_geom.renest(out).collect()
    assert len(nested) == 1
    got_ring = [(p.x, p.y) for p in nested[0].parts[0][0]]
    exp_ring = [(float(x), float(y)) for x, y in expected["coordinates"][0]]
    assert len(got_ring) == len(exp_ring)
    assert_array_almost_equal(np.array(got_ring), np.array(exp_ring), decimal=8)


def test_span_sequence_invariance(spark, sf_dir):
    """input_hint invariant: the pipeline never alters the per-doc
    span sequence (kind, text, media_ref, order)."""
    from transformio_spark.operators import extract

    docs = synth.docs_spans(spark, sf_dir)
    before = {r.doc_id: [tuple(s) for s in r.spans] for r in docs.limit(200).collect()}
    affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
    pts = extract.extract_coordinates(docs, affine_a)
    enriched = docs.join(
        pts.groupBy("doc_id").count().withColumnRenamed("count", "n_points"),
        "doc_id",
    )
    after = {
        r.doc_id: [tuple(s) for s in r.spans]
        for r in enriched.where(enriched.doc_id.isin(list(before))).collect()
    }
    assert set(before) == set(after)
    for d in before:
        assert before[d] == after[d], f"span sequence changed for {d}"


def test_salted_equals_unsalted(spark, sf_dir):
    from transformio_spark.operators import extract, spatial_join

    docs = synth.docs_spans(spark, sf_dir)
    affine_a = extract.fit_px2geo_affine(synth.gcps(spark))
    pts = extract.extract_coordinates(docs, affine_a)
    boxes = synth.region_boxes(spark, sf_dir)
    a = (
        spatial_join.broadcast_contains_join(pts, boxes)
        .groupBy("region_id").count().collect()
    )
    b = (
        spatial_join.tiled_contains_join(pts, boxes, zoom=4, n_salt=8)
        .groupBy("region_id").count().collect()
    )
    assert sorted((r.region_id, r["count"]) for r in a) == sorted(
        (r.region_id, r["count"]) for r in b
    )


def test_mercator_column_twin_matches_udf_kernel(spark):
    """functions/geo.mercator_forward (codegen path) must equal the
    Chain(MapProjection) pandas-UDF kernel path to the last ulp-ish
    (both are float64 spherical-Mercator; numpy vs JVM Math may differ
    ~1 ulp, assert < 1e-6 m)."""
    import json as _json

    from pyspark.sql import functions as F

    from transformio_spark.functions import geo

    rows = [(float(lon), float(lat)) for lon in range(-179, 180, 37)
            for lat in range(-84, 85, 23)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    mx, my = geo.mercator_forward(F.col("lon"), F.col("lat"))
    col_path = df.select("lon", "lat", mx.alias("cx"), my.alias("cy"))
    model = k.Chain([k.MapProjection("EPSG:4326", "EPSG:3857")])
    udf_path = udfs.with_transformed(
        col_path, _json.dumps(model.to_json()),
        x="lon", y="lat", out_x="ux", out_y="uy",
    ).collect()
    for r in udf_path:
        assert abs(r.cx - r.ux) < 1e-6, r
        assert abs(r.cy - r.uy) < 1e-6, r


def test_ray_cast_matches_numpy_reference(spark):
    """The Column-expression even-odd ray-cast must agree with an
    independent numpy crossing-count implementation on random lattice
    points INCLUDING points sharing y with vertices and points on
    edges (the half-open straddle rule must match)."""
    from pyspark.sql import functions as F

    from transformio_spark.operators import spatial_join

    ring = [(600000, 600000), (6600000, 600000), (6600000, 2800000),
            (3600000, 1400000), (600000, 2800000), (600000, 600000)]

    def np_inside(px, py):
        cross = 0
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            if (y1 > py) != (y2 > py):
                t = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
                if (y2 > y1 and t > 0) or (y2 < y1 and t < 0):
                    cross += 1
        return cross % 2 == 1

    rng = np.random.default_rng(17)
    pts = [(int(x), int(y)) for x, y in zip(
        rng.integers(0, 7_500_000, 400), rng.integers(0, 3_500_000, 400)
    )]
    # adversarial: vertex-aligned y values, on-edge and vertex points
    pts += [(3_600_000, 1_400_000), (600_000, 600_000), (1_000_000, 600_000),
            (3_000_000, 600_000), (6_700_000, 2_800_000), (0, 600_000),
            (3_600_000, 600_000), (2_100_000, 1_700_000)]
    df = spark.createDataFrame(pts, "px long, py long")
    ring_col = F.array(*[
        F.struct(F.lit(x).cast("long").alias("x"), F.lit(y).cast("long").alias("y"))
        for x, y in ring
    ])
    got = df.select(
        "px", "py",
        spatial_join.ray_cast_inside(ring_col, F.col("px"), F.col("py")).alias("inside"),
    ).collect()
    assert len(got) == len(pts)
    n_in = 0
    for r in got:
        want = np_inside(r.px, r.py)
        assert r.inside == want, (r.px, r.py)
        n_in += want
    assert 0 < n_in < len(pts)  # non-degenerate


def test_projective_column_twin_matches_kernel(spark):
    """functions/geo.projective_predict must equal
    kernels.Projective.predict on the same H (both are the standard
    homography division; double-exact on identical expression trees)."""
    from pyspark.sql import functions as F

    from transformio_spark.functions import geo
    from transformio_spark.plans.queries import PROJECTIVE_H

    rows = [(float(lon), float(lat)) for lon in range(-179, 180, 41)
            for lat in range(-84, 85, 29)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    px, py = geo.projective_predict(PROJECTIVE_H, F.col("lon"), F.col("lat"))
    got = df.select("lon", "lat", px.alias("px"), py.alias("py")).collect()

    trans = k.Projective(H=np.array(PROJECTIVE_H))
    ex, ey = trans.predict(
        np.array([r.lon for r in got]), np.array([r.lat for r in got])
    )
    for r, wx, wy in zip(got, ex, ey):
        assert abs(r.px - wx) < 1e-12
        assert abs(r.py - wy) < 1e-12


def test_rolling_fingerprint_empty_text(spark):
    """Empty string: Spark's sequence(1, 0) is DESCENDING [1, 0], so an
    unguarded fold raises ELEMENT_AT_BY_INDEX_ZERO; the guarded column
    must return 0 like the DuckDB twin (ADVICE round 2)."""
    import duckdb

    from pyspark.sql import functions as F

    from transformio_spark.functions import text as T

    df = spark.createDataFrame(
        [("", ), ("a", ), ("hello world", )], "text string"
    )
    got = {
        r.text: r.fp
        for r in df.select("text", T.rolling_fingerprint(F.col("text")).alias("fp")).collect()
    }
    sql = T.rolling_fingerprint_sql("text")
    want = dict(
        duckdb.sql(
            f"select text, {sql} as fp from (values (''), ('a'), ('hello world')) t(text)"
        ).fetchall()
    )
    assert got == want
    assert got[""] == 0
