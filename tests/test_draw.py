"""draw_geojson rasterizer (reference utils.py:7-74) and the warp
string image source (reference imwarp.py:92-96), PIL-free."""

from __future__ import annotations

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from transformio_spark import kernels as k
from transformio_spark.kernels import draw as kdraw
from transformio_spark.kernels import warp as kwarp

SQUARE = {
    "type": "Polygon",
    "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]],
}


def test_draw_bounds_padding_matches_reference_math():
    """imbounds = (x1-5%w, y2+5%h, x2+5%w, y1-5%h) and height follows
    the aspect ratio (utils.py:9-25)."""
    out, imbounds = kdraw.draw_geojson(SQUARE)
    assert imbounds == (-0.5, 10.5, 10.5, -0.5)
    assert out.shape == (1000, 1000, 4)  # square aspect


def test_draw_polygon_fill_and_outline():
    out, _ = kdraw.draw_geojson(
        SQUARE, fillcolor="blue", outlinecolor="red", outlinewidth=4
    )
    h, w = out.shape[:2]
    assert tuple(out[h // 2, w // 2]) == (0, 0, 255, 255)  # inside: fill
    assert tuple(out[2, 2]) == (0, 0, 0, 0)  # padded margin: transparent
    # outline band along the left edge: x=0 geo -> col ~ (0.5/11)*1000
    edge_col = int((0.5 / 11.0) * w)
    assert tuple(out[h // 2, edge_col]) == (255, 0, 0, 255)


def test_draw_point_disc():
    geoj = {"type": "Point", "coordinates": [5, 5]}
    out, imbounds = kdraw.draw_geojson(
        geoj, im=np.zeros((100, 100, 4), np.uint8),
        imbounds=(0.0, 10.0, 10.0, 0.0), fillsize=10,
    )
    # geo (5,5) -> pixel (50, 50); radius 5 px
    assert tuple(out[50, 50]) == (0, 0, 255, 255)
    assert tuple(out[50, 46]) == (0, 0, 255, 255)
    assert tuple(out[50, 30]) == (0, 0, 0, 0)


def test_draw_collection_unwrap_and_order():
    """FeatureCollection unwrap + PIL draw-order: later over earlier."""
    small = {
        "type": "Polygon",
        "coordinates": [[[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]],
    }
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "geometry": SQUARE, "properties": {}},
            {"type": "Feature", "geometry": small, "properties": {}},
        ],
    }
    a, _ = kdraw.draw_geojson(
        fc, im=np.zeros((100, 100, 4), np.uint8),
        imbounds=(0.0, 10.0, 10.0, 0.0), fillcolor="red",
    )
    # both drawn red: indistinguishable — now verify order via two runs
    only_big, _ = kdraw.draw_geojson(
        SQUARE, im=np.zeros((100, 100, 4), np.uint8),
        imbounds=(0.0, 10.0, 10.0, 0.0), fillcolor="red",
    )
    assert (a == only_big).all()  # small square is inside big


def test_draw_linestring_unsupported_like_reference():
    with pytest.raises(NotImplementedError):
        kdraw.draw_geojson(
            {"type": "LineString", "coordinates": [[0, 0], [1, 1]]},
            im=np.zeros((10, 10, 4), np.uint8), imbounds=(0, 1, 1, 0),
        )


def test_draw_imbounds_without_im_raises():
    with pytest.raises(ValueError):
        kdraw.draw_geojson(SQUARE, imbounds=(0, 1, 1, 0))


def test_rasterize_tiles_bitwise_matches_kernel(spark):
    from transformio_spark.operators import raster

    fc = {
        "type": "GeometryCollection",
        "geometries": [
            SQUARE,
            {"type": "Point", "coordinates": [2, 8]},
            {"type": "MultiPoint", "coordinates": [[8, 2], [9, 9]]},
        ],
    }
    full, imb = kdraw.draw_geojson(
        fc, fillcolor="green", fillsize=14, outlinecolor="black",
        outlinewidth=3,
    )
    tiles_df, (w, h), imb2 = raster.rasterize_tiles(
        spark, fc, out_tile=192, fillcolor="green", fillsize=14,
        outlinecolor="black", outlinewidth=3,
    )
    assert imb2 == imb and (w, h) == (full.shape[1], full.shape[0])
    got = raster.tiles_to_image(tiles_df.collect(), w, h)
    assert_array_equal(got, full)


# ---------------------------------------------------------------------------
# warp string sources (op 31)
# ---------------------------------------------------------------------------

def test_load_image_npy_path_and_file_url(tmp_path):
    im = np.arange(300, dtype=np.uint8).reshape(10, 10, 3)
    p = tmp_path / "im.npy"
    np.save(p, im)
    assert_array_equal(kwarp.load_image(str(p)), im)
    assert_array_equal(kwarp.load_image(f"file://{p}"), im)


def test_load_image_ppm_and_pgm(tmp_path):
    im = np.arange(150, dtype=np.uint8).reshape(5, 10, 3)
    ppm = tmp_path / "im.ppm"
    ppm.write_bytes(b"P6\n# a comment\n10 5\n255\n" + im.tobytes())
    assert_array_equal(kwarp.load_image(str(ppm)), im)
    gray = np.arange(50, dtype=np.uint8).reshape(5, 10)
    pgm = tmp_path / "im.pgm"
    pgm.write_bytes(b"P5 10 5 255\n" + gray.tobytes())
    assert_array_equal(kwarp.load_image(str(pgm)), gray)


def test_load_image_unknown_format_raises(tmp_path):
    p = tmp_path / "im.bin"
    p.write_bytes(b"BOGUSFMT not an image")
    with pytest.raises(ValueError, match="unsupported image format"):
        kwarp.load_image(str(p))
    # a PNG signature with garbage after it enters the PNG decoder
    # (since round 3) and must still fail with a clear PNG error
    p2 = tmp_path / "im.png"
    p2.write_bytes(b"\x89PNG\r\n\x1a\nnotreally")
    with pytest.raises(ValueError, match="PNG"):
        kwarp.load_image(str(p2))


def test_warp_accepts_path_string(tmp_path):
    im = np.zeros((64, 64, 4), np.uint8)
    im[10:20, 30:40] = (255, 0, 0, 255)
    p = tmp_path / "src.npy"
    np.save(p, im)
    trans = k.Affine(A=[[1.0, 0, 5.0], [0, 1.0, -3.0], [0, 0, 1]])
    a, aff_a = kwarp.warp(im, trans)
    b, aff_b = kwarp.warp(str(p), trans)
    assert aff_a == aff_b
    assert_array_equal(a, b)


def test_draw_point_outline_annulus():
    """Point outline parity (reference utils.py:42 draws the ellipse
    with outline=outlinecolor, width=outlinewidth): band centered on
    the ideal circle, fill inside, untouched outside."""
    geoj = {"type": "Point", "coordinates": [5, 5]}
    out, _ = kdraw.draw_geojson(
        geoj, im=np.zeros((100, 100, 4), np.uint8),
        imbounds=(0.0, 10.0, 10.0, 0.0), fillsize=10,
        outlinecolor="red", outlinewidth=2,
    )
    # geo (5,5) -> pixel center 50.5; radius 5 px, band = dist (4, 6]
    assert tuple(out[50, 50]) == (0, 0, 255, 255)      # fill center
    assert tuple(out[50, 45]) == (255, 0, 0, 255)      # dist 5.5: band
    assert tuple(out[50, 46]) == (255, 0, 0, 255)      # dist 4.5: band
    assert tuple(out[50, 47]) == (0, 0, 255, 255)      # dist 3.5: fill
    assert tuple(out[50, 44]) == (0, 0, 0, 0)          # dist 6.5: outside

    # fill=None still draws the ring alone (PIL fill=None semantics)
    ring_only, _ = kdraw.draw_geojson(
        geoj, im=np.zeros((100, 100, 4), np.uint8),
        imbounds=(0.0, 10.0, 10.0, 0.0), fillsize=10,
        fillcolor=None, outlinecolor="red", outlinewidth=2,
    )
    assert tuple(ring_only[50, 45]) == (255, 0, 0, 255)
    assert tuple(ring_only[50, 55]) == (255, 0, 0, 255)
    assert tuple(ring_only[50, 50]) == (0, 0, 0, 0)
