"""S2-style spherical cells (functions/s2.py) and equal-area hex bins
(functions/hexgrid.py): property pins promised by the module docs.

The Hilbert fold is checked against an independently written pure-
Python xy2d; prefix nesting and unit-step adjacency are brute-swept;
the hex cube-round is pinned by the two defining grid properties
(every point within one circumradius of its cell center; centers are
fixpoints of the assignment).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transformio_spark.functions import hexgrid, s2  # noqa: E402


# -- independent pure-Python Hilbert xy2d (textbook recurrence) -------------

def _xy2d(x: int, y: int, level: int) -> int:
    n = 1 << level
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x  # NOTE: classic variant rotates within s
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _xy2d_fold(x: int, y: int, level: int) -> int:
    """The exact recurrence the Spark fold implements (reflection uses
    n-1, rotation does not shrink) — written independently here to pin
    the Column builder."""
    n = 1 << level
    d = 0
    for k in range(level - 1, -1, -1):
        s = 1 << k
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - y, n - 1 - x
            else:
                x, y = y, x
    return d


LEVEL = 4
N = 1 << LEVEL


def _all_d():
    return {(x, y): _xy2d_fold(x, y, LEVEL) for x in range(N) for y in range(N)}


def test_hilbert_is_a_bijection_and_unit_step():
    """The fold recurrence traces a true Hilbert curve: every cell
    visited exactly once, consecutive positions are 4-neighbors."""
    ds = _all_d()
    assert sorted(ds.values()) == list(range(N * N))
    by_d = {d: xy for xy, d in ds.items()}
    for d in range(N * N - 1):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_prefix_nesting():
    """d(x, y, L) >> 2(L-k) == d(x >> (L-k), y >> (L-k), k) for every
    cell and every coarser level — the property s2_parent relies on."""
    for x in range(N):
        for y in range(N):
            d = _xy2d_fold(x, y, LEVEL)
            for k in range(1, LEVEL):
                shift = LEVEL - k
                assert d >> (2 * shift) == _xy2d_fold(x >> shift, y >> shift, k), (
                    x, y, k,
                )


def test_lut_transducer_equals_fold_recurrence():
    """The packed 16-entry digit/state tables in functions/s2.py are
    exactly the Klein-four-group transducer of the fold recurrence:
    re-derive them here from first principles and sweep every cell at
    several levels."""
    dlut = slut = 0
    for st in range(4):
        sw, c = st >> 1, st & 1
        for raw in range(4):
            rawx, rawy = raw >> 1, raw & 1
            bx, by = (rawy, rawx) if sw else (rawx, rawy)
            rx, ry = bx ^ c, by ^ c
            digit = (3 * rx) ^ ry
            ns, nc = sw, c
            if ry == 0:
                ns ^= 1
                if rx == 1:
                    nc ^= 1
            k = st * 4 + raw
            dlut |= digit << (2 * k)
            slut |= (ns * 2 + nc) << (2 * k)
    assert dlut == s2.HILBERT_DLUT
    assert slut == s2.HILBERT_SLUT

    def lut_d(x, y, level):
        st = d = 0
        for i in range(level - 1, -1, -1):
            raw = (((x >> i) & 1) << 1) | ((y >> i) & 1)
            k = st * 4 + raw
            d = (d << 2) | ((dlut >> (2 * k)) & 3)
            st = (slut >> (2 * k)) & 3
        return d

    for lvl in (1, 2, 3, 5):
        n = 1 << lvl
        for x in range(n):
            for y in range(n):
                assert lut_d(x, y, lvl) == _xy2d_fold(x, y, lvl), (x, y, lvl)


def test_spark_fold_matches_python(spark):
    rows = [(x, y) for x in range(N) for y in range(N)]
    df = spark.createDataFrame(rows, "x int, y int").select(
        "x", "y", s2.hilbert_d(F.col("x"), F.col("y"), LEVEL).alias("d")
    )
    got = {(r.x, r.y): r.d for r in df.collect()}
    assert got == _all_d()


def test_duckdb_cte_matches_python():
    """The recursive-CTE twin walks the same curve."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fij AS SELECT x AS doc_num, y AS span_pos, 0 AS face,"
        f" x AS i, y AS j FROM range({N}) t(x), range({N}) u(y)"
    )
    rows = con.execute(
        f"WITH RECURSIVE {s2.s2_hilbert_cte_sql(LEVEL)} "
        "SELECT doc_num, span_pos, d FROM hil WHERE remaining = 0"
    ).fetchall()
    got = {(x, y): d for x, y, d in rows}
    assert got == _all_d()


def test_s2_cell_faces_cover_sphere(spark):
    """Axis-aligned probe points land on all six faces with the S2
    face numbering (0:+x 1:+y 2:+z 3:-x 4:-y 5:-z)."""
    probes = [
        (0.0, 0.0, 0), (90.0, 0.0, 1), (0.0, 89.9, 2),
        (180.0, 0.0, 3), (-90.0, 0.0, 4), (0.0, -89.9, 5),
    ]
    df = s2.with_s2_cell(
        spark.createDataFrame(
            [(lon, lat) for lon, lat, _ in probes], "lon double, lat double"
        ),
        F.col("lon"), F.col("lat"), 12, out="c",
    )
    faces = [r.c // (4 ** 12) for r in df.collect()]
    assert faces == [f for _, _, f in probes]


def test_s2_parent_matches_direct_coarse_encoding(spark):
    """s2_parent (bit arithmetic) equals encoding the same point
    directly at the coarser level — floors and Hilbert prefixes nest."""
    import random

    rng = random.Random(7)
    pts = [(rng.uniform(-180, 180), rng.uniform(-89, 89)) for _ in range(200)]
    fine, coarse = 12, 7
    base = spark.createDataFrame(pts, "lon double, lat double")
    # two separate jobs: stacking two level-12/level-7 encodings into
    # one codegen unit doubles an already-large generated method
    via_parent = [
        r.p
        for r in s2.with_s2_cell(base, F.col("lon"), F.col("lat"), fine, out="cf")
        .select(s2.s2_parent(F.col("cf"), fine, coarse).alias("p"))
        .collect()
    ]
    direct = [
        r.d
        for r in s2.with_s2_cell(
            base, F.col("lon"), F.col("lat"), coarse, out="d"
        )
        .select("d")
        .collect()
    ]
    assert via_parent == direct


# -- hex grid ---------------------------------------------------------------

def _hex_assign(con, xs, ys, size):
    con.execute("DROP TABLE IF EXISTS p")
    con.execute("CREATE TABLE p (mx DOUBLE, my DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(zip(xs, ys)))
    qf, rf = hexgrid.hex_qr_frac_sql("mx", "my", size)
    stage = hexgrid.hex_round_stage_sql("qf", "rf")
    stage_cols = ", ".join(f"{v} AS {k}" for k, v in stage.items())
    hq, hr = hexgrid.hex_qr_final_sql()
    return con.execute(
        f"""
        WITH fr AS (SELECT mx, my, {qf} AS qf, {rf} AS rf FROM p),
        st AS (SELECT mx, my, {stage_cols} FROM fr)
        SELECT mx, my, {hq} AS hq, {hr} AS hr FROM st
        """
    ).fetchall()


def test_hex_points_within_circumradius():
    """Every planar point is within one circumradius of the center of
    the hex it is assigned to (the defining Voronoi property, relaxed
    to the circumradius bound the cube-round guarantees)."""
    import random

    rng = random.Random(13)
    size = 1000.0
    xs = [rng.uniform(-50000, 50000) for _ in range(2000)]
    ys = [rng.uniform(-50000, 50000) for _ in range(2000)]
    con = duckdb.connect()
    rows = _hex_assign(con, xs, ys, size)
    sqrt3 = math.sqrt(3.0)
    worst = 0.0
    for mx, my, hq, hr in rows:
        cx = size * (sqrt3 * hq + sqrt3 / 2.0 * hr)
        cy = size * 1.5 * hr
        worst = max(worst, math.hypot(mx - cx, my - cy))
    assert worst <= size + 1e-9, worst
    # and the bound is tight-ish: some point near a corner
    assert worst > 0.8 * size


def test_hex_centers_are_fixpoints():
    """Feeding each cell's own center back through the assignment
    returns the same (hq, hr)."""
    size = 777.0
    sqrt3 = math.sqrt(3.0)
    cells = [(q, r) for q in range(-5, 6) for r in range(-5, 6)]
    xs = [size * (sqrt3 * q + sqrt3 / 2.0 * r) for q, r in cells]
    ys = [size * 1.5 * r for q, r in cells]
    con = duckdb.connect()
    rows = _hex_assign(con, xs, ys, size)
    for (q, r), (_, _, hq, hr) in zip(cells, rows):
        assert (hq, hr) == (q, r)


def test_hex_center_sql_matches_python():
    con = duckdb.connect()
    cx, cy = hexgrid.hex_center_xy_sql("3", "-2", 500.0)
    got = con.execute(f"SELECT {cx}, {cy}").fetchone()
    sqrt3 = math.sqrt(3.0)
    assert got[0] == pytest.approx(500.0 * (sqrt3 * 3 + sqrt3 / 2.0 * -2), abs=1e-9)
    assert got[1] == pytest.approx(500.0 * 1.5 * -2, abs=1e-9)
