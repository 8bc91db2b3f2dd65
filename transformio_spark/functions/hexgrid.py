"""H3-style hexagonal binning on an equal-area plane.

The north star names "H3/S2 cell encoding"; S2's spherical quadtree
role is covered by functions/s2.py and the Morton quadtree.  H3's
distinguishing property is the *hexagonal* cell — uniform 6-neighbor
topology (no corner-touching ambiguity) and lower perimeter/area than
squares, which matters for focal/neighborhood operators.  This module
provides that cell shape honestly: axial hex coordinates on the
ellipsoidal cylindrical equal-area plane (EPSG 9835, the EASE-Grid
family — already a shared-text green query via ease_cells), so every
hex bin has equal true area.  It is NOT the icosahedral aperture-7 H3
grid (no H3 library exists in this environment to pin against, and
the icosahedron introduces 12 pentagons + per-face orientation tables
that would be unverifiable here); the equal-area-plane formulation
keeps the property users actually bin with — equal-area hex cells —
and stays exactly verifiable cross-engine.

Math is the published axial-coordinate scheme (pointy-top hexagons,
cube-coordinate rounding; Red Blob Games "Hexagonal Grids", a
standard public reference): fractional axial
``qf = (sqrt(3)/3 * x - y/3) / size``, ``rf = (2y/3) / size`` and the
largest-residual cube-round.  Everything is ONE shared SQL text
evaluated by Spark (F.expr — whole-stage codegen) and verbatim by the
DuckDB oracle, the same cross-engine-exactness strategy as
functions/geo.cea_forward_sql.
"""

from __future__ import annotations

# exact double literals (bit-identical text in both engines)
SQRT3_3 = repr(3.0 ** 0.5 / 3.0)   # 0.5773502691896258
TWO_3 = repr(2.0 / 3.0)
ONE_3 = repr(1.0 / 3.0)


def hex_qr_frac_sql(mx: str, my: str, size_m: float) -> tuple[str, str]:
    """Fractional axial coordinates of planar point (mx, my) on a
    pointy-top hex grid with circumradius ``size_m`` meters."""
    a = repr(float(size_m))
    qf = f"(({SQRT3_3} * ({mx}) - {ONE_3} * ({my})) / {a})"
    rf = f"(({TWO_3} * ({my})) / {a})"
    return qf, rf


def hex_round_stage_sql(qf: str = "qf", rf: str = "rf") -> dict[str, str]:
    """Intermediate columns for the cube round (expects ``qf``/``rf``
    columns to exist): rounded axes + absolute residuals."""
    return {
        "rq": f"round({qf})",
        "rr": f"round({rf})",
        "rs": f"round(0.0e0 - {qf} - {rf})",
        "dq": f"abs(round({qf}) - {qf})",
        "dr": f"abs(round({rf}) - {rf})",
        "ds": f"abs(round(0.0e0 - {qf} - {rf}) - (0.0e0 - {qf} - {rf}))",
    }


def hex_qr_final_sql() -> tuple[str, str]:
    """Final integer axial (hq, hr) from the stage columns: reset the
    axis with the largest rounding residual so q + r + s == 0 holds
    (the published cube-round rule)."""
    hq = (
        "cast(CASE WHEN dq > dr AND dq > ds THEN 0.0e0 - rr - rs "
        "ELSE rq END as bigint)"
    )
    hr = (
        "cast(CASE WHEN dq > dr AND dq > ds THEN rr "
        "WHEN dr > ds THEN 0.0e0 - rq - rs ELSE rr END as bigint)"
    )
    return hq, hr


def hex_center_xy_sql(hq: str, hr: str, size_m: float) -> tuple[str, str]:
    """Planar center of an axial hex cell (inverse of the fractional
    map) — used by tests to pin max point-to-center distance."""
    a = repr(float(size_m))
    sqrt3 = repr(3.0 ** 0.5)
    cx = f"({a} * ({sqrt3} * ({hq}) + {sqrt3} / 2.0e0 * ({hr})))"
    cy = f"({a} * (1.5e0 * ({hr})))"
    return cx, cy
