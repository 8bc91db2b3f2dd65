"""Sparse-grid focal (neighborhood) operators.

A focal statistic — each cell aggregated with its (2r+1)^2 neighbors —
is the raster convolution / hotspot-smoothing primitive, re-expressed
for the SPARSE cell world every spatial aggregate here lives in
(points → tile counts → smooth).  The dense-raster formulation (shift
the array 9 times) doesn't distribute; the sparse one is two narrow
relational steps:

  spread:   each (cell, value) row explodes to the (2r+1)^2 target
            cells it contributes to — pure Column sequence arithmetic,
            rows grow by the kernel size only, never by grid area;
  gather:   groupBy target cell, sum contributions — ONE shuffle;
  support:  inner-join back to the input cells (classic focal stats
            are defined on the input support, not its dilation) — an
            equi-join on the SAME key the gather just shuffled on, so
            AQE/Catalyst co-partitions it without a second wide
            exchange of the big side.

At 10^12 points the input to focal_sum is the already-aggregated cell
table (|cells| << |points|); kernel radius r multiplies rows by
(2r+1)^2 transiently before the gather's map-side partial aggregation
collapses them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def focal_sum(
    cells: DataFrame,
    tx: str = "tx",
    ty: str = "ty",
    value: str = "n",
    radius: int = 1,
) -> DataFrame:
    """3x3 (or (2r+1)^2) neighborhood sum over a sparse cell table.

    Returns one row per INPUT cell: its own value plus the summed
    values of every input neighbor within Chebyshev distance
    ``radius``.  Cells absent from the input contribute 0 and receive
    no row (sparse semantics; dilate the support first if the halo is
    wanted)."""
    if radius < 1:
        raise ValueError("focal_sum: radius must be >= 1")
    off = F.sequence(F.lit(-radius), F.lit(radius))
    spread = (
        cells.select(tx, ty, value)
        .withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .select(
            (F.col(tx) + F.col("_dx")).alias("_tx"),
            (F.col(ty) + F.col("_dy")).alias("_ty"),
            F.col(value).alias("_v"),
        )
    )
    gathered = spread.groupBy("_tx", "_ty").agg(
        F.sum("_v").alias("focal_sum")
    )
    support = cells.select(
        F.col(tx).alias("_tx"), F.col(ty).alias("_ty"), F.col(value)
    )
    return (
        gathered.join(support, on=["_tx", "_ty"], how="inner")
        .select(
            F.col("_tx").alias(tx),
            F.col("_ty").alias(ty),
            F.col(value),
            "focal_sum",
        )
    )


def grid_dbscan(
    cells: DataFrame,
    min_pts: int,
    width: int,
    tx: str = "tx",
    ty: str = "ty",
    value: str = "n",
) -> DataFrame:
    """Grid-based DBSCAN (round 5): density clusters over a sparse
    cell table — core cells are cells whose point count reaches
    ``min_pts``; clusters are the 8-connected components of the core
    cells (the grid formulation of density clustering: cell = the
    eps-neighborhood bucket, so the quadratic point-pair search of
    classic DBSCAN becomes a NEIGHBOR EQUI-JOIN over 4 forward
    offsets — each adjacent pair emitted exactly once — and the
    transitive closure reuses operators/dedup.connected_components,
    label propagation with the large-star/small-star fallback).

    Scale shape: |cells| << |points| (the input is the aggregated
    tile table), edge generation is spread(×4) → one equi-join on
    (tx, ty), and the closure is diameter-bounded shuffle rounds —
    no all-pairs stage anywhere.  Border/noise points of classic
    DBSCAN map to non-core cells and are excluded by construction.

    Returns one row per cluster: ``cluster_id`` (minimum row-major
    cell id ``ty*width + tx`` in the cluster), ``n_cells``,
    ``n_points`` (summed ``value``), and the cluster bbox
    ``tx_min/tx_max/ty_min/ty_max``."""
    from .dedup import connected_components

    if min_pts < 1:
        raise ValueError("grid_dbscan: min_pts must be >= 1")
    core = cells.where(F.col(value) >= min_pts).select(
        F.col(tx).alias("tx"),
        F.col(ty).alias("ty"),
        F.col(value).alias("n"),
        (F.col(ty) * width + F.col(tx)).cast("long").alias("cell_id"),
    )
    # 4 forward offsets cover each unordered 8-neighbor pair once:
    # E, SE, S, SW (the backward four are the same pairs reversed).
    fwd = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1))
        ]
    )
    spread = (
        core.select("cell_id", "tx", "ty")
        .withColumn("_o", F.explode(fwd))
        .select(
            F.col("cell_id").alias("id_a"),
            (F.col("tx") + F.col("_o.dx")).alias("tx"),
            (F.col("ty") + F.col("_o.dy")).alias("ty"),
        )
    )
    pairs = spread.join(
        core.select(F.col("cell_id").alias("id_b"), "tx", "ty"),
        on=["tx", "ty"],
        how="inner",
    ).select("id_a", "id_b")
    # grid components are routinely HIGH-diameter (a connected band of
    # core cells is a hops-long snake: measured diameter >> 12 on the
    # sf0.1 gate corpus — one 65k-cell component), so skip the
    # diameter-bounded label-propagation attempt and go straight to
    # the O(log^2 n) star algorithm (47s -> 31s at sf0.1).
    labels = connected_components(pairs, algorithm="star")
    labeled = core.join(
        labels.withColumnRenamed("id", "cell_id"), on="cell_id", how="left"
    ).withColumn("comp", F.coalesce(F.col("comp"), F.col("cell_id")))
    return labeled.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").alias("n_points"),
        F.min("tx").alias("tx_min"),
        F.max("tx").alias("tx_max"),
        F.min("ty").alias("ty_min"),
        F.max("ty").alias("ty_max"),
    )
