"""Temporal joins for event/feature pipelines.

The as-of (backward) join — "for each left row, the latest right row
at or before it on the same key" — is the feature-attribution
workhorse (latest profile snapshot per event, last login before each
click) that Spark's DataFrame API lacks as a primitive.  Rather than
a range join (quadratic per key) or a per-key loop, it runs as the
standard scale pattern: tag both sides, UNION, one window pass with a
running ``last(..., ignorenulls=True)`` over (ts, side) ordering —
a SINGLE shuffle on the join key, linear work within each partition's
sorted run, no state beyond the window frame.  At 10^12 rows the
shuffle on key is the same one any keyed join pays; skewed keys take
the same salting/AQE treatment as the spatial joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    carry: dict[str, str],
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``carry``
    columns of the latest ``right`` row with ``right.ts <= left.ts``
    and the same key (NULL when no such row).  Ties at identical ts
    resolve right-row-visible (<= semantics, matching DuckDB's
    ``ASOF LEFT JOIN ... ON l.ts >= r.ts``).

    ``carry`` maps output column name -> right column name.  Left
    columns pass through unchanged."""
    left_cols = [c for c in left.columns]
    tagged_left = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"_carry_{out}")
          for out, src in carry.items()],
    )
    tagged_right = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (key_col, ts_col)],
        F.lit(0).alias("_side"),
        *[F.col(src).alias(f"_carry_{out}") for out, src in carry.items()],
    ).select(*left_cols, "_side", *[f"_carry_{out}" for out in carry])
    u = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(f"_carry_{out}"), ignorenulls=True).over(w).alias(out)
        for out in carry
    ]
    return (
        u.select(*left_cols, "_side", *carried)
        .where(F.col("_side") == 1)
        .drop("_side")
    )
