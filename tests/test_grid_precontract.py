"""Round-6 grid pre-contraction pins: _precontracted_components must
label exactly like the raw star algorithm (comp = component min) on
adversarial grid shapes — a grid-spanning snake (high diameter, the
case that motivated the rewrite), random sparse grids, block-boundary
components, and singletons-with-one-edge."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from transformio_spark.operators.dedup import connected_components
from transformio_spark.operators.grid import (
    _precontracted_components,
    grid_dbscan,
)


def _pairs_df(spark, cells, width):
    """8-neighbor adjacency pairs of a cell set via the same 4 forward
    offsets grid_dbscan uses."""
    cs = set(cells)
    rows = []
    for (tx, ty) in cs:
        a = ty * width + tx
        for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1)):
            if (tx + dx, ty + dy) in cs:
                rows.append((a, (ty + dy) * width + tx + dx))
    if not rows:
        rows = [(0, 0)]  # degenerate; filtered by u != v
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _labels(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("case", ["snake", "random", "boundary"])
def test_precontract_equals_star(spark, case):
    width = 256
    if case == "snake":
        # boustrophedon path spanning many 32-cell blocks: diameter
        # ~ n_cells, the shape the pre-contraction targets
        cells = []
        for ty in range(0, 40, 2):
            xs = range(0, 200) if (ty // 2) % 2 == 0 else range(199, -1, -1)
            cells += [(tx, ty) for tx in xs]
            cells.append((cells[-1][0], ty + 1))
    elif case == "random":
        rng = random.Random(7)
        cells = {(rng.randrange(64), rng.randrange(64)) for _ in range(900)}
    else:
        # two components hugging a 32-cell block boundary, plus an
        # isolated pair entirely inside one block
        cells = [(31, y) for y in range(10)] + [(32, y) for y in range(10)]
        cells += [(100, 100), (101, 100)]
    pairs = _pairs_df(spark, cells, width)
    fast = _labels(_precontracted_components(pairs, width=width))
    slow = _labels(connected_components(pairs, algorithm="star"))
    assert fast == slow
    assert len(fast) > 0


def test_grid_dbscan_direct_equals_block_path(spark):
    """Round 6: the single-task union-find shortcut must produce the
    same clusters as the block pre-contraction + star pipeline (forced
    via the edge cap) on a random grid."""
    from transformio_spark.operators import grid as G

    rng = random.Random(11)
    rows = [(tx, ty, 3) for tx, ty in
            {(rng.randrange(80), rng.randrange(80)) for _ in range(1200)}]
    cells = spark.createDataFrame(rows, "tx long, ty long, n long")

    def run():
        return sorted(
            tuple(r) for r in grid_dbscan(cells, min_pts=3, width=256).collect()
        )

    direct = run()
    old_cap = G._DIRECT_UF_MAX_EDGES
    G._DIRECT_UF_MAX_EDGES = 0
    try:
        block = run()
    finally:
        G._DIRECT_UF_MAX_EDGES = old_cap
    assert direct == block
    assert len(direct) > 1


def test_grid_dbscan_output_unchanged(spark):
    """grid_dbscan end-to-end on a crafted cell table: same clusters
    as the label set implies (cluster ids are component minima)."""
    rows = [(tx, 0, 3) for tx in range(70)]          # 70-cell snake
    rows += [(5, 50, 4), (6, 50, 5), (200, 200, 3)]  # small + singleton
    rows += [(90, 90, 1)]                            # below min_pts
    cells = spark.createDataFrame(rows, "tx long, ty long, n long")
    out = grid_dbscan(cells, min_pts=3, width=256)
    got = {r.cluster_id: (r.n_cells, r.n_points) for r in out.collect()}
    assert got == {
        0: (70, 3 * 70),           # snake: min cell id = 0*256+0
        50 * 256 + 5: (2, 9),      # the (5,50)-(6,50) pair
        200 * 256 + 200: (1, 3),   # singleton core cell
    }
