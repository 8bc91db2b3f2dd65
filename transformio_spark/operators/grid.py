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
