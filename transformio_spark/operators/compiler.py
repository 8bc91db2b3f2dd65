"""Transform -> Column compiler: the analytic fast path.

A fitted kernel transform (or Chain) is the engine's logical plan for
a coordinate pipeline (reference transforms.py:48-96).  Its preferred
physical form on Spark is a pure Column expression — whole-stage
codegen, zero Python crossings.  This module compiles every leg that
has a parity-tested Column twin (functions/geo.py):

- Affine / Similarity          -> affine_predict        (A rows)
- Polynomial order 1/2/3       -> polynomial_predict
- Projective                   -> projective_predict
- MapProjection 4326<->3857    -> mercator_forward/inverse
- MapProjection 4326->54009    -> mollweide_forward (Newton fold)
- Chain                        -> composition of the above

Legs that genuinely need numpy/pyproj (TIN triangle loops, non-analytic
CRS pairs) fall back to the Arrow pandas-UDF kernel path PER LEG, so a
mixed Chain pays exactly one Python crossing per non-analytic leg
instead of routing the whole chain through Python.

Float parity: each compiled leg is the Column twin already proven
bit-compatible with its numpy kernel (tests/test_spark_operators.py);
composition order matches Chain.predict's sequential leg order.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import geo
from ..kernels import transforms as kt

ColumnBuilder = Callable[[Column, Column], tuple[Column, Column]]


def compile_columns(model) -> ColumnBuilder | None:
    """Compile a fitted transform to a pure-Column builder, or None if
    any leg needs the numpy/pyproj kernel (TIN, non-analytic CRS)."""
    if isinstance(model, kt.Chain):
        legs = [compile_columns(t) for t in model.transforms]
        if any(leg is None for leg in legs):
            return None

        def chained(x: Column, y: Column) -> tuple[Column, Column]:
            for leg in legs:
                x, y = leg(x, y)
            return x, y

        return chained
    if isinstance(model, kt.Polynomial):
        if model.A is None:
            return None
        A, order = [list(r) for r in model.A], model.order
        return lambda x, y: geo.polynomial_predict(A, order, x, y)
    if isinstance(model, (kt.Affine, kt.Similarity)):
        if model.A is None:
            return None
        A = [list(r) for r in model.A]
        return lambda x, y: geo.affine_predict(A, x, y)
    if isinstance(model, kt.Projective):
        H = [list(r) for r in model.H]
        return lambda x, y: geo.projective_predict(H, x, y)
    if isinstance(model, kt.MapProjection):
        pair = (kt._crs_code(model.fromcrs), kt._crs_code(model.tocrs))
        if pair == ("EPSG:4326", "EPSG:3857"):
            return geo.mercator_forward
        if pair == ("EPSG:3857", "EPSG:4326"):
            return geo.mercator_inverse
        if pair == ("EPSG:4326", "ESRI:54009"):
            return geo.mollweide_forward  # fold-based Newton, codegen
        if pair == ("ESRI:54009", "EPSG:4326"):
            return geo.mollweide_inverse  # closed form
        if pair == ("EPSG:4326", "EPSG:3031"):
            return lambda x, y: geo.polar_stereographic_forward(x, y, -71.0)
        if pair == ("EPSG:4326", "EPSG:3995"):
            return lambda x, y: geo.polar_stereographic_forward(x, y, 71.0)
        if pair == ("EPSG:4326", "ESRI:54030"):
            return geo.robinson_forward  # literal-array spline lookup
        return None  # other analytic/pyproj pairs -> UDF kernel leg
    return None  # TIN and anything unknown -> UDF kernel leg


def transform_columns(model, x: Column, y: Column) -> tuple[Column, Column]:
    """(px, py) for ``model`` with the best physical plan per leg:
    Column expressions for analytic legs, one Arrow pandas-UDF crossing
    per numpy/pyproj leg.  Works for any fitted transform; a fully
    analytic model compiles to zero Python."""
    from . import udfs

    legs = model.transforms if isinstance(model, kt.Chain) else [model]
    for leg in legs:
        built = compile_columns(leg)
        if built is not None:
            x, y = built(x, y)
        else:
            s = udfs.transform_xy(json.dumps(leg.to_json()), x, y)
            x, y = s["px"], s["py"]
    return x, y


def _compile_staged(leg, prefix: str):
    """df-level builder for legs whose Column form is an iterative
    fold: returns fn(df, x, y) -> (df, x', y'), or None.  Staging
    unrolls the iteration into chained projections over materialized
    accumulator attributes — whole-stage codegen instead of an
    interpreted F.aggregate lambda (~3x on the Mollweide gate query at
    sf0.1); values stay bit-equal to the fold (same op order)."""
    if isinstance(leg, kt.MapProjection):
        pair = (kt._crs_code(leg.fromcrs), kt._crs_code(leg.tocrs))
        if pair == ("EPSG:4326", "ESRI:54009"):
            return lambda df, x, y: geo.mollweide_forward_staged(
                df, x, y, prefix=prefix
            )
    return None


def with_transformed_columns(
    df: DataFrame,
    model,
    x: str = "lon",
    y: str = "lat",
    out_x: str = "pred_x",
    out_y: str = "pred_y",
) -> DataFrame:
    """DataFrame convenience over transform_columns — additionally
    routes fold-based legs through their staged (chained-projection)
    form, which a pure Column composition cannot express."""
    from . import udfs

    legs = model.transforms if isinstance(model, kt.Chain) else [model]
    cx, cy = F.col(x), F.col(y)
    temp: list[str] = []
    for i, leg in enumerate(legs):
        prefix = f"_stg{i}_"
        staged = _compile_staged(leg, prefix)
        if staged is not None:
            # collision guard (ADVICE r05): a caller column sharing
            # the stage prefix would be silently replaced by the
            # staged projection and then dropped below — refuse
            # loudly instead of corrupting data.  Track the EXACT
            # temp names the stage created, not a prefix match over
            # the output.
            clash = [c for c in df.columns if c.startswith(prefix)]
            if clash:
                raise ValueError(
                    f"with_transformed_columns: input columns {clash} "
                    f"collide with staged temp prefix {prefix!r}"
                )
            before = set(df.columns)
            df, cx, cy = staged(df, cx, cy)
            temp.extend(c for c in df.columns if c not in before)
            continue
        built = compile_columns(leg)
        if built is not None:
            cx, cy = built(cx, cy)
        else:
            s = udfs.transform_xy(json.dumps(leg.to_json()), cx, cy)
            cx, cy = s["px"], s["py"]
    out = df.withColumns({out_x: cx, out_y: cy})
    return out.drop(*temp) if temp else out
