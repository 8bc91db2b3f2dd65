"""Raster warp tests: reference imwarp invariants (world-affine
bounds, fitbounds/imbounds fixpoint — reference tests/test_image_warp
.py:25-61) and bit-parity of the distributed tiled warp vs the
single-array kernel."""

from __future__ import annotations

import json
import math

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal, assert_array_equal

from transformio_spark import kernels as k
from transformio_spark.fixtures import WORLD_AFFINE
from transformio_spark.kernels import warp as kwarp


def synth_image(size: int = 512, seed: int = 11) -> np.ndarray:
    """Seeded RGBA gradient+checker test image (FIXTURES.md §5 — no
    external data)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size]
    r = (x * 255 // size).astype(np.uint8)
    g = (y * 255 // size).astype(np.uint8)
    b = (((x // 32 + y // 32) % 2) * 255).astype(np.uint8)
    noise = rng.integers(0, 32, (size, size), dtype=np.uint8)
    a = np.full((size, size), 255, np.uint8)
    return np.stack([r, g, np.clip(b + noise, 0, 255).astype(np.uint8), a], axis=-1)


def test_fitbounds_world_affine():
    trans = kwarp.fitbounds(2048, 1024, [-180, 90, 180, -90])
    assert_array_almost_equal(trans.A, np.array(WORLD_AFFINE), decimal=10)


def test_imbounds_world_affine():
    trans = k.Affine(A=WORLD_AFFINE)
    bounds = kwarp.imbounds(2048, 1024, trans)
    assert_array_almost_equal(bounds, (-180.0, -90.0, 180.0, 90.0), decimal=9)


def test_fitbounds_imbounds_fixpoint():
    trans = kwarp.fitbounds(640, 480, [10, 60, 40, 20])
    bounds = kwarp.imbounds(640, 480, trans)
    trans2 = kwarp.fitbounds(640, 480, [bounds[0], bounds[3], bounds[2], bounds[1]])
    assert_array_almost_equal(trans.A, trans2.A, decimal=8)


def test_warp_identityish_affine_roundtrip():
    """Warping with a pure scale+offset affine must reproduce the
    source (y-flipped output affine, same dims via diagonal
    heuristic)."""
    im = synth_image(128)
    trans = k.Affine(A=[[0.5, 0, 100.0], [0, 0.5, -30.0], [0, 0, 1]])
    out, affine = kwarp.warp(im, trans)
    assert out.shape[0] == out.shape[1] == 128
    assert affine[4] < 0  # unconditional y-flip
    # y-flip: output row r backpredicts to source row 128-r; row 0
    # lands out of bounds (row 128) → transparent (alpha 0)
    assert out[0, :, 3].max() == 0
    assert_array_equal(out[1, :, :3], im[127, :, :3])
    assert_array_equal(out[64, 10, :3], im[64, 10, :3])


def test_warp_bounds_size_tile():
    """User bounds + size → tile render (README raster-tile workflow,
    README.md:648-651), with the crop-to-relevant-input path."""
    im = synth_image(256)
    img2geo = kwarp.fitbounds(256, 256, [-180, 90, 180, -90])
    out, affine = kwarp.warp(im, img2geo, bounds=[0, 0, 180, 90], size=(64, 64))
    assert out.shape == (64, 64, 4)
    assert affine[0] == 180 / 64 and affine[5] == 90
    # the tile covers the upper-right quadrant → compare to source
    assert out[:, :, 3].max() == 255


@pytest.mark.parametrize("out_tile", [64, 100])
def test_tiled_warp_bitwise_matches_full(spark, out_tile):
    """The distributed tiled warp must equal the single-array kernel
    BIT FOR BIT (same bounds/size/affine), tile seams included."""
    from transformio_spark.operators import raster

    im = synth_image(256, seed=3)
    # a rotation+scale chain makes tile seams non-trivial
    rot = k.Affine(rotate=math.radians(15))
    scale = k.Affine(A=[[0.8, 0, 10], [0, 1.2, -5], [0, 0, 1]])
    chain = k.Chain([scale, rot])

    # full-image reference run (auto bounds + diagonal size heuristic)
    full, affine_full = kwarp.warp(im, chain)
    size = (full.shape[1], full.shape[0])

    tiles_df = raster.image_to_tiles(spark, im, tile=96)
    chain_json = json.dumps(chain.to_json())
    out_tiles, affine_tiled = raster.warp_tiled(
        spark, tiles_df, (256, 256), chain_json, affine_full, size,
        out_tile=out_tile,
    )
    assembled = raster.tiles_to_image(out_tiles.collect(), size[0], size[1])
    assert affine_tiled == pytest.approx(affine_full)
    assert_array_equal(assembled, full)
