"""Analytic map-projection backends (no pyproj required).

The reference's MapProjection (reference transforms.py:536-587)
delegates every CRS pair to pyproj/PROJ; its projection test surface
(reference tests/test_image_projections.py:24-46) exercises six world
projections.  pyproj is OPTIONAL in this sandbox, so the pairs a
transformio user actually hits are reimplemented here from the public
formulas — EPSG Guidance Note 7-2 and Snyder, *Map Projections: A
Working Manual* (USGS PP 1395):

- Mollweide        (ESRI:54009) — Snyder p.251-252, sphere
- Robinson         (ESRI:54030) — Robinson's published 5-degree table
                    + natural cubic spline (Snyder p.82-83)
- Van der Grinten I (ESRI:54029) — Snyder p.239-241, sphere
- Polar Stereographic variant B (EPSG:3995 Arctic lat_ts=71,
                    EPSG:3031 Antarctic lat_ts=-71, EPSG:5939 Norway
                    lat_ts=71 lon_0=18 FE=FN=2e6) — EPSG GN7-2
                    §3.2.4, WGS84 ellipsoid; verified against the
                    guidance note's variant-B worked example
- Transverse Mercator / UTM (EPSG:32601-32660 north, 32701-32760
                    south, plus generic '+proj=tmerc'/'+proj=utm')
                    — Krüger n^4 series per Karney, "Transverse
                    Mercator with an accuracy of a few nanometers",
                    J. Geodesy 85 (2011); round 5, closes the
                    "most common next CRS family" gap
- Lambert Conformal Conic 2SP (EPSG:3034 + '+proj=lcc') and Albers
                    Equal Area (ESRI:102022 + '+proj=aea') — Snyder
                    §15/§14 == EPSG 9802/9822, verified against the
                    published Clarke-1866 worked examples; round 5
- Lambert Azimuthal Equal Area (EPSG:3035 + '+proj=laea') — Snyder
                    §24 == EPSG 9820, verified against the GN7-2
                    ETRS89 worked example; round 5

Sphere-radius convention: PROJ evaluates these spherical-only
projections on an ellipsoidal CRS using the semi-major axis as the
sphere radius, so R = 6378137.0 (WGS84 a) throughout.

All functions are whole-array numpy (vectorized, no Python loops per
point) — the same kernel runs driver-side, inside Arrow pandas UDFs,
and (for Mollweide) has a pure-Column/SQL twin in functions/geo.py
whose fixed-iteration Newton matches MOLL_NEWTON_ITERS here exactly.
With EPSG:5939 (round 4) the reference's entire six-projection test
surface (reference tests/test_image_projections.py:24-46) runs
analytically, pyproj-free.
"""

from __future__ import annotations

import numpy as np

# WGS84
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
R_SPHERE = A_WGS84  # PROJ's a-as-sphere for spherical-only projections

# Fixed Newton iteration count for Mollweide theta — 30 reaches a
# double-precision fixed point for every non-pole latitude (verified
# in tests); fixed count (not a tolerance loop) so the numpy kernel,
# the Spark Column fold, and the DuckDB list_reduce oracle run the
# *identical* operation sequence.  At the exact poles the Newton
# fixed point stalls ~6e-6 rad short of theta'=+-pi (1/(1+cos) blows
# up), so |pi*sin(phi)| == pi is special-cased to theta' = +-pi in
# ALL THREE twins (PROJ special-cases the pole the same way;
# round-3 advisor fix).
MOLL_NEWTON_ITERS = 30

_SQRT2 = np.sqrt(2.0)


# ---------------------------------------------------------------------------
# Mollweide (Snyder p.251-252)
# ---------------------------------------------------------------------------

def mollweide_forward(lon, lat, radius: float = R_SPHERE):
    """lon/lat deg -> Mollweide meters.  theta' (=2*theta) solves
    theta' + sin(theta') = pi*sin(lat) by MOLL_NEWTON_ITERS Newton
    steps starting at lat (radians)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    c = np.pi * np.sin(phi)
    th = phi.copy()
    for _ in range(MOLL_NEWTON_ITERS):
        th = th - (th + np.sin(th) - c) / (1.0 + np.cos(th))
    # exact poles: Newton stalls short of theta'=+-pi — see
    # MOLL_NEWTON_ITERS note (kept bit-identical across all twins)
    th = np.where(np.abs(c) == np.pi, np.sign(c) * np.pi, th)
    th = th / 2.0
    x = (2.0 * _SQRT2 / np.pi) * radius * lam * np.cos(th)
    y = _SQRT2 * radius * np.sin(th)
    return x, y


def mollweide_inverse(x, y, radius: float = R_SPHERE):
    """Mollweide meters -> lon/lat deg (closed form, Snyder p.252)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    th = np.arcsin(np.clip(y / (_SQRT2 * radius), -1.0, 1.0))
    lat = np.degrees(np.arcsin(np.clip((2.0 * th + np.sin(2.0 * th)) / np.pi, -1.0, 1.0)))
    lon = np.degrees(np.pi * x / (2.0 * _SQRT2 * radius * np.cos(th)))
    return lon, lat


# ---------------------------------------------------------------------------
# Robinson (published 5-degree table; Snyder p.82-83)
# ---------------------------------------------------------------------------

# Robinson's table: latitude 0..90 step 5; X = length of parallel
# relative to equator, Y = distance of parallel from equator relative
# to the pole distance.  x = 0.8487*R*X*lam, y = 1.3523*R*Y*sign(phi).
_ROBINSON_LATS = np.arange(0.0, 95.0, 5.0)
_ROBINSON_X = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
    0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
    0.6213, 0.5722, 0.5322,
])
_ROBINSON_Y = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
    0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
    0.9394, 0.9761, 1.0000,
])
_ROBINSON_XSCALE = 0.8487
_ROBINSON_YSCALE = 1.3523


def _natural_cubic_coeffs(xs, ys):
    """Second derivatives for a natural cubic spline (Thomas solve)."""
    n = len(xs)
    h = np.diff(xs)
    rhs = np.zeros(n)
    rhs[1:-1] = 6.0 * ((ys[2:] - ys[1:-1]) / h[1:] - (ys[1:-1] - ys[:-2]) / h[:-1])
    diag = np.ones(n)
    diag[1:-1] = 2.0 * (h[:-1] + h[1:])
    lower = np.zeros(n - 1)
    upper = np.zeros(n - 1)
    lower[:-1] = h[:-1]
    upper[1:] = h[1:]
    # natural boundary: M0 = Mn-1 = 0 (diag already 1, rhs 0)
    lower = lower.copy()
    upper = upper.copy()
    cp = np.zeros(n - 1)
    dp = np.zeros(n)
    cp[0] = upper[0] / diag[0]
    dp[0] = rhs[0] / diag[0]
    for i in range(1, n - 1):
        m = diag[i] - lower[i - 1] * cp[i - 1]
        cp[i] = upper[i] / m
        dp[i] = (rhs[i] - lower[i - 1] * dp[i - 1]) / m
    dp[n - 1] = (rhs[n - 1] - lower[n - 2] * dp[n - 2]) / (
        diag[n - 1] - lower[n - 2] * cp[n - 2]
    )
    M = np.zeros(n)
    M[n - 1] = dp[n - 1]
    for i in range(n - 2, -1, -1):
        M[i] = dp[i] - cp[i] * M[i + 1]
    return M


_ROBINSON_MX = _natural_cubic_coeffs(_ROBINSON_LATS, _ROBINSON_X)
_ROBINSON_MY = _natural_cubic_coeffs(_ROBINSON_LATS, _ROBINSON_Y)


def _spline_eval(xs, ys, M, q):
    q = np.clip(q, xs[0], xs[-1])
    i = np.clip(np.searchsorted(xs, q, side="right") - 1, 0, len(xs) - 2)
    h = xs[i + 1] - xs[i]
    a = (xs[i + 1] - q) / h
    b = (q - xs[i]) / h
    return (
        a * ys[i]
        + b * ys[i + 1]
        + ((a ** 3 - a) * M[i] + (b ** 3 - b) * M[i + 1]) * h * h / 6.0
    )


def robinson_forward(lon, lat, radius: float = R_SPHERE):
    """lon/lat deg -> Robinson meters (spline through the table)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.asarray(lat, dtype=np.float64)
    aphi = np.abs(phi)
    X = _spline_eval(_ROBINSON_LATS, _ROBINSON_X, _ROBINSON_MX, aphi)
    Y = _spline_eval(_ROBINSON_LATS, _ROBINSON_Y, _ROBINSON_MY, aphi)
    x = _ROBINSON_XSCALE * radius * X * lam
    y = _ROBINSON_YSCALE * radius * Y * np.sign(phi)
    return x, y


ROBINSON_NEWTON_ITERS = 8


def robinson_inverse(x, y, radius: float = R_SPHERE,
                     iters: int = ROBINSON_NEWTON_ITERS):
    """Robinson meters -> lon/lat deg.  |lat| by bracketed Newton on
    the monotone Y spline: one searchsorted against the 19 knot Y
    values pins the 5-degree segment EXACTLY (knot values are the
    spline's own values, so the root cannot lie outside it), then
    fixed-count Newton on that segment's cubic from a linear start —
    the cubic is monotone inside the bracket and near-linear, so 8
    steps sit far past the double fixed point (round-5: replaces the
    former 40-evaluation bisection, ~5x fewer spline passes for
    strictly tighter error; same fixed-count determinism policy as
    MOLL_NEWTON_ITERS)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    Yt = np.clip(np.abs(y) / (_ROBINSON_YSCALE * radius), 0.0,
                 float(_ROBINSON_Y[-1]))
    i = np.clip(
        np.searchsorted(_ROBINSON_Y, Yt, side="right") - 1,
        0, len(_ROBINSON_Y) - 2,
    )
    x0, x1 = _ROBINSON_LATS[i], _ROBINSON_LATS[i + 1]
    y0, y1 = _ROBINSON_Y[i], _ROBINSON_Y[i + 1]
    m0, m1 = _ROBINSON_MY[i], _ROBINSON_MY[i + 1]
    h = x1 - x0
    with np.errstate(divide="ignore", invalid="ignore"):
        q = x0 + h * np.where(y1 > y0, (Yt - y0) / (y1 - y0), 0.5)
        for _ in range(iters):
            a = (x1 - q) / h
            b = (q - x0) / h
            val = (
                a * y0 + b * y1
                + ((a ** 3 - a) * m0 + (b ** 3 - b) * m1) * h * h / 6.0
                - Yt
            )
            der = (
                (y1 - y0) / h
                + ((1.0 - 3.0 * a * a) * m0 + (3.0 * b * b - 1.0) * m1)
                * h / 6.0
            )
            step = val / der
            q = np.clip(q - np.where(np.isfinite(step), step, 0.0), x0, x1)
    aphi = q
    X = _spline_eval(_ROBINSON_LATS, _ROBINSON_X, _ROBINSON_MX, aphi)
    lon = np.degrees(x / (_ROBINSON_XSCALE * radius * X))
    lat = aphi * np.sign(y)
    return lon, lat


# ---------------------------------------------------------------------------
# Van der Grinten I (Snyder p.239-241)
# ---------------------------------------------------------------------------

def vandergrinten_forward(lon, lat, radius: float = R_SPHERE):
    """lon/lat deg -> Van der Grinten I meters (closed form)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam, phi = np.broadcast_arrays(lam, phi)
    x = np.zeros_like(lam)
    y = np.zeros_like(lam)

    theta = np.arcsin(np.clip(np.abs(2.0 * phi / np.pi), 0.0, 1.0))
    eq = np.abs(phi) < 1e-12          # equator: x = R*lam, y = 0
    mer = (np.abs(lam) < 1e-12) | (np.abs(np.abs(phi) - np.pi / 2) < 1e-12)

    x[eq] = radius * lam[eq]
    # central meridian / poles: x = 0, y = +-pi R tan(theta/2)
    y[mer & ~eq] = (
        np.pi * radius * np.sign(phi[mer & ~eq]) * np.tan(theta[mer & ~eq] / 2.0)
    )

    g = ~(eq | mer)
    if np.any(g):
        lg, tg = lam[g], theta[g]
        A = 0.5 * np.abs(np.pi / lg - lg / np.pi)
        G = np.cos(tg) / (np.sin(tg) + np.cos(tg) - 1.0)
        P = G * (2.0 / np.sin(tg) - 1.0)
        Q = A * A + G
        P2A2 = P * P + A * A
        GP2 = G - P * P
        under_x = A * A * GP2 * GP2 - P2A2 * (G * G - P * P)
        xg = (
            np.pi
            * radius
            * (A * GP2 + np.sqrt(np.maximum(under_x, 0.0)))
            / P2A2
            * np.sign(lg)
        )
        under_y = (A * A + 1.0) * P2A2 - Q * Q
        yg = (
            np.pi
            * radius
            * (P * Q - A * np.sqrt(np.maximum(under_y, 0.0)))
            / P2A2
            * np.sign(phi[g])
        )
        x[g] = xg
        y[g] = yg
    return x, y


def vandergrinten_inverse(x, y, radius: float = R_SPHERE):
    """Van der Grinten I meters -> lon/lat deg (closed-form cubic,
    Snyder p.241)."""
    X = np.asarray(x, dtype=np.float64) / (np.pi * radius)
    Y = np.asarray(y, dtype=np.float64) / (np.pi * radius)
    X, Y = np.broadcast_arrays(X, Y)

    XY2 = X * X + Y * Y
    c1 = -np.abs(Y) * (1.0 + XY2)
    c2 = c1 - 2.0 * Y * Y + X * X
    c3 = -2.0 * c1 + 1.0 + 2.0 * Y * Y + XY2 * XY2
    with np.errstate(invalid="ignore", divide="ignore"):
        d = Y * Y / c3 + (2.0 * c2 ** 3 / c3 ** 3 - 9.0 * c1 * c2 / (c3 * c3)) / 27.0
        a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
        m1 = 2.0 * np.sqrt(np.maximum(-a1 / 3.0, 0.0))
        ratio = np.clip(3.0 * d / (a1 * m1), -1.0, 1.0)
        th1 = np.arccos(ratio) / 3.0
        lat = np.pi * np.sign(Y) * (-m1 * np.cos(th1 + np.pi / 3.0) - c2 / (3.0 * c3))
        lon = np.where(
            np.abs(X) < 1e-15,
            0.0,
            np.pi
            * (XY2 - 1.0 + np.sqrt(1.0 + 2.0 * (X * X - Y * Y) + XY2 * XY2))
            / (2.0 * np.where(np.abs(X) < 1e-15, 1.0, X)),
        )
    lat = np.where(np.abs(Y) < 1e-15, 0.0, lat)
    return np.degrees(lon), np.degrees(lat)


# ---------------------------------------------------------------------------
# Polar Stereographic, variant B (EPSG GN7-2 §3.2.4, ellipsoidal)
# ---------------------------------------------------------------------------

def _ps_constants(lat_ts_deg: float, a: float = A_WGS84, f: float = F_WGS84):
    e = np.sqrt(2.0 * f - f * f)
    phi_f = np.radians(abs(lat_ts_deg))
    t_f = np.tan(np.pi / 4.0 - phi_f / 2.0) * (
        (1.0 + e * np.sin(phi_f)) / (1.0 - e * np.sin(phi_f))
    ) ** (e / 2.0)
    m_f = np.cos(phi_f) / np.sqrt(1.0 - e * e * np.sin(phi_f) ** 2)
    big = np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    k0 = m_f * big / (2.0 * t_f)
    return e, big, k0


def polar_stereographic_forward(
    lon, lat, lat_ts: float, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """lon/lat deg -> polar stereographic meters.  North aspect when
    lat_ts > 0 (EPSG:3995), south when lat_ts < 0 (EPSG:3031)."""
    e, big, k0 = _ps_constants(lat_ts, a, f)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    north = lat_ts > 0
    if not north:
        phi = -phi  # mirror to the north-aspect formulas
    t = np.tan(np.pi / 4.0 - phi / 2.0) * (
        (1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi))
    ) ** (e / 2.0)
    rho = 2.0 * a * k0 * t / big
    E = fe + rho * np.sin(lam)
    N = fn - rho * np.cos(lam) if north else fn + rho * np.cos(lam)
    return E, N


def polar_stereographic_inverse(
    E, N, lat_ts: float, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    e, big, k0 = _ps_constants(lat_ts, a, f)
    E = np.asarray(E, dtype=np.float64) - fe
    N = np.asarray(N, dtype=np.float64) - fn
    E, N = np.broadcast_arrays(E, N)
    north = lat_ts > 0
    rho = np.sqrt(E * E + N * N)
    t = rho * big / (2.0 * a * k0)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)  # north-aspect conformal lat
    e2 = e * e
    e4, e6, e8 = e2 * e2, e2 * e2 * e2, e2 * e2 * e2 * e2
    phi = (
        chi
        + (e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0) * np.sin(2 * chi)
        + (7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0) * np.sin(4 * chi)
        + (7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0) * np.sin(6 * chi)
        + (4279.0 * e8 / 161280.0) * np.sin(8 * chi)
    )
    lam = np.arctan2(E, -N) if north else np.arctan2(E, N)
    if not north:
        phi = -phi
    lat = np.degrees(phi)
    lon = np.degrees(lam) + lon0
    if lon0 != 0.0:
        # wrap to [-180, 180) — a nonzero longitude of origin shifts
        # arctan2's native range past the antimeridian (PROJ wraps
        # the same way); lon0 == 0 keeps the bit-identical fast path
        lon = lon - 360.0 * np.floor((lon + 180.0) / 360.0)
    return lon, lat


# ---------------------------------------------------------------------------
# Orthographic (Snyder p.148-150, sphere) — the README's globe view
# ---------------------------------------------------------------------------

def orthographic_forward(
    lon, lat, lat0: float = 0.0, lon0: float = 0.0, radius: float = R_SPHERE
):
    """lon/lat deg -> orthographic meters; the far hemisphere
    (cos of angular distance < 0) maps to NaN, which the vector
    transform's NaN-drop semantics then removes — exactly how the
    reference's globe doctest makes hidden points disappear
    (reference README.md:461-476, create_logo.py)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    phi0 = np.radians(lat0)
    cosc = np.sin(phi0) * np.sin(phi) + np.cos(phi0) * np.cos(phi) * np.cos(lam)
    vis = cosc >= 0.0
    x = np.where(vis, radius * np.cos(phi) * np.sin(lam), np.nan)
    y = np.where(
        vis,
        radius
        * (np.cos(phi0) * np.sin(phi) - np.sin(phi0) * np.cos(phi) * np.cos(lam)),
        np.nan,
    )
    return x, y


def orthographic_inverse(
    x, y, lat0: float = 0.0, lon0: float = 0.0, radius: float = R_SPHERE
):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x, y = np.broadcast_arrays(x, y)
    phi0 = np.radians(lat0)
    rho = np.sqrt(x * x + y * y)
    with np.errstate(invalid="ignore"):
        c = np.arcsin(np.where(rho <= radius, rho / radius, np.nan))
        sinc, cosc = np.sin(c), np.cos(c)
        safe_rho = np.where(rho == 0.0, 1.0, rho)
        phi = np.arcsin(
            np.clip(
                cosc * np.sin(phi0) + y * sinc * np.cos(phi0) / safe_rho, -1.0, 1.0
            )
        )
        lam = np.arctan2(
            x * sinc, safe_rho * cosc * np.cos(phi0) - y * sinc * np.sin(phi0)
        )
    phi = np.where(rho == 0.0, phi0, phi)
    lam = np.where(rho == 0.0, 0.0, lam)
    return np.degrees(lam) + lon0, np.degrees(phi)


# ---------------------------------------------------------------------------
# Transverse Mercator / UTM (Krüger n-series; EPSG method 9807)
# ---------------------------------------------------------------------------
# Public formulas: Krüger (1912) as re-derived in Karney, "Transverse
# Mercator with an accuracy of a few nanometers", J. Geodesy 85 (2011)
# — the same series PROJ's default tmerc (poder/engsager) and
# GeographicLib use.  Series truncated at n^4: for WGS84
# (n ≈ 1.679e-3) the omitted n^5 terms are below 0.05 mm, far inside
# the meter rounding every gate observable applies.  Valid within a
# UTM-like band (|lon - lon0| up to tens of degrees); UTM itself stays
# within ±3° + overlap.  This closes "arbitrary-CRS support" gap #1
# from round 4: UTM is the most common projected-CRS family a
# reference user (reference transforms.py:536-544, any pyproj CRS)
# would hit next.


def _tm_constants(a: float = A_WGS84, f: float = F_WGS84):
    """(e, n, A, alpha[4], beta[4]) for the Krüger series: third
    flattening n, rectifying radius A, forward coefficients alpha,
    inverse coefficients beta (Karney 2011 eqs. 12, 14, 35; n^4)."""
    n = f / (2.0 - f)
    n2, n3, n4 = n * n, n ** 3, n ** 4
    big_a = a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0,
        13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0,
        61.0 * n3 / 240.0 - 103.0 * n4 / 140.0,
        49561.0 * n4 / 161280.0,
    )
    beta = (
        n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0,
        n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0,
        17.0 * n3 / 480.0 - 37.0 * n4 / 840.0,
        4397.0 * n4 / 161280.0,
    )
    e = np.sqrt(f * (2.0 - f))
    return e, n, big_a, alpha, beta


_TM_E, _TM_N, _TM_A, _TM_ALPHA, _TM_BETA = _tm_constants()

# Newton solve of the inverse conformal latitude (GeographicLib
# Math::tauf).  6 fixed iterations reach a double-precision fixed
# point for any latitude (the solve is quadratically convergent from
# the tau'/(1-e^2) start); fixed count, not a tolerance loop, for the
# same determinism reason as MOLL_NEWTON_ITERS.
TM_TAUF_ITERS = 6


def _tm_xi_eta(lam, phi):
    """Gauss-Schreiber (xi', eta') then Krüger series (xi, eta) for
    lon-offset lam / latitude phi, both radians."""
    e, alpha = _TM_E, _TM_ALPHA
    sphi = np.sin(phi)
    # conformal latitude as tau' = tan(chi); at the exact poles
    # arctanh(±1) = ±inf propagates to t = ±inf, which atan2/hypot
    # absorb into xi' = ±pi/2, eta' = 0 — the correct pole image
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    coslam = np.cos(lam)
    xip = np.arctan2(t, coslam)
    etap = np.arcsinh(np.sin(lam) / np.hypot(t, coslam))
    xi, eta = xip, etap
    for j, aj in enumerate(alpha, start=1):
        xi = xi + aj * np.sin(2.0 * j * xip) * np.cosh(2.0 * j * etap)
        eta = eta + aj * np.cos(2.0 * j * xip) * np.sinh(2.0 * j * etap)
    return xi, eta


def _tm_m0(lat0: float) -> float:
    """Rectifying arc A*xi at (lat0, central meridian) — the northing
    origin shift a nonzero +lat_0 subtracts (EPSG method 9807)."""
    if lat0 == 0.0:
        return 0.0
    xi, _ = _tm_xi_eta(np.array(0.0), np.array(np.radians(lat0)))
    return float(_TM_A * xi)


def transverse_mercator_forward(
    lon, lat, lon0: float = 0.0, k0: float = 1.0,
    fe: float = 0.0, fn: float = 0.0, lat0: float = 0.0,
):
    """lon/lat deg -> transverse Mercator meters (WGS84 ellipsoid,
    Krüger n^4 series)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    # wrap to (-pi, pi] so a source longitude across the antimeridian
    # lands on the near side of the central meridian (PROJ wraps the
    # same way); zero-offset inputs take the bit-identical fast path
    if lon0 != 0.0:
        lam = lam - 2.0 * np.pi * np.floor((lam + np.pi) / (2.0 * np.pi))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam, phi = np.broadcast_arrays(lam, phi)
    xi, eta = _tm_xi_eta(lam, phi)
    E = fe + k0 * _TM_A * eta
    N = fn + k0 * (_TM_A * xi - _tm_m0(lat0))
    return E, N


def _tm_tauf(taup):
    """tau = tan(phi) from tau' = tan(chi) (inverse conformal
    latitude), Newton with TM_TAUF_ITERS fixed steps (GeographicLib
    Math::tauf; Karney 2011 eq. 19-20)."""
    e = _TM_E
    e2m = 1.0 - e * e
    tau = taup / e2m
    for _ in range(TM_TAUF_ITERS):
        tau1 = np.hypot(1.0, tau)
        sig = np.sinh(e * np.arctanh(e * tau / tau1))
        taupa = np.hypot(1.0, sig) * tau - sig * tau1
        tau = tau + (taup - taupa) * (1.0 + e2m * tau * tau) / (
            e2m * tau1 * np.hypot(1.0, taupa)
        )
    return tau


def transverse_mercator_inverse(
    E, N, lon0: float = 0.0, k0: float = 1.0,
    fe: float = 0.0, fn: float = 0.0, lat0: float = 0.0,
):
    beta = _TM_BETA
    eta = (np.asarray(E, dtype=np.float64) - fe) / (k0 * _TM_A)
    xi = (np.asarray(N, dtype=np.float64) - fn + k0 * _tm_m0(lat0)) / (k0 * _TM_A)
    xi, eta = np.broadcast_arrays(xi, eta)
    xip, etap = xi, eta
    for j, bj in enumerate(beta, start=1):
        xip = xip - bj * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        etap = etap - bj * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    sh = np.sinh(etap)
    cosxip = np.cos(xip)
    taup = np.sin(xip) / np.hypot(sh, cosxip)
    lam = np.arctan2(sh, cosxip)
    phi = np.arctan(_tm_tauf(taup))
    lon = np.degrees(lam) + lon0
    if lon0 != 0.0:
        lon = lon - 360.0 * np.floor((lon + 180.0) / 360.0)
    return lon, np.degrees(phi)


UTM_K0 = 0.9996
UTM_FE = 500_000.0
UTM_FN_SOUTH = 10_000_000.0


def utm_lon0(zone: int) -> float:
    """Central meridian of UTM zone 1..60 (zone 31 -> 3°E)."""
    zone = int(zone)
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone must be 1..60, got {zone}")
    return zone * 6.0 - 183.0


def utm_forward(lon, lat, zone: int, south: bool = False):
    return transverse_mercator_forward(
        lon, lat, lon0=utm_lon0(zone), k0=UTM_K0, fe=UTM_FE,
        fn=UTM_FN_SOUTH if south else 0.0,
    )


def utm_inverse(E, N, zone: int, south: bool = False):
    return transverse_mercator_inverse(
        E, N, lon0=utm_lon0(zone), k0=UTM_K0, fe=UTM_FE,
        fn=UTM_FN_SOUTH if south else 0.0,
    )


# ---------------------------------------------------------------------------
# Conic families: Lambert Conformal Conic 2SP (EPSG method 9802) and
# Albers Equal Area (EPSG method 9822) — round 5
# ---------------------------------------------------------------------------
# Public formulas: Snyder PP1395 §15 (LCC, eqs. 14-15/15-1..15-11) and
# §14 (Albers, eqs. 3-12/14-12..14-21); identical to EPSG GN7-2
# §3.1.1/§3.5.1.  Both take (a, f) so the kernel math is verifiable
# against the published Clarke-1866 worked examples (Snyder Appendix A
# and the GN7-2 Texas South Central US-survey-foot example — all three
# reproduced to < 1 cm in tests) while the REGISTERED CRS codes stay
# on WGS84/GRS80 per module datum policy.  After UTM these are the
# projected-CRS families a reference user (any pyproj CRS,
# reference transforms.py:536-544) most commonly hits next: LCC runs
# most US State Plane + European national grids, Albers the standard
# continental equal-area atlases.

# Fixed-count inverse-latitude iterations (same determinism rationale
# as MOLL_NEWTON_ITERS / TM_TAUF_ITERS): both solves contract by
# ~e^2 ≈ 6.7e-3 per step, so 8/10 steps sit far past the double fixed
# point for any |lat| <= 89.999.
LCC_PHI_ITERS = 8
AEA_PHI_ITERS = 10


def _ecc(a: float, f: float):
    e2 = f * (2.0 - f)
    return np.sqrt(e2), e2


def _conic_t(phi, e):
    """t(phi) = tan(pi/4 - phi/2) / [(1 - e sin phi)/(1 + e sin phi)]^(e/2)
    (Snyder 15-9)."""
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * s) / (1.0 + e * s)
    ) ** (e / 2.0)


def _conic_m(phi, e2):
    """m(phi) = cos phi / sqrt(1 - e^2 sin^2 phi) (Snyder 14-15)."""
    return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)


def _aea_q(phi, e):
    """Authalic-latitude q(phi) (Snyder 3-12)."""
    s = np.sin(phi)
    return (1.0 - e * e) * (
        s / (1.0 - e * e * s * s)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def _wrap_lam(lam):
    """Wrap a central-meridian-relative longitude (radians) to
    (-pi, pi] — same convention as transverse_mercator_forward."""
    return lam - 2.0 * np.pi * np.floor((lam + np.pi) / (2.0 * np.pi))


def _authalic_phi(q, e):
    """phi (radians) from authalic q — Snyder 3-16 fixed
    AEA_PHI_ITERS-step iteration from the spherical start, shared by
    the Albers and Lambert-azimuthal inverses.  At-or-past the pole
    (|q| >= q(±90°)) there is no interior solution and the 1/cos
    blow-up stalls the iteration ~0.004° short — snap to the pole
    exactly like PROJ does."""
    e2 = e * e
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(AEA_PHI_ITERS):
            s = np.sin(phi)
            one = 1.0 - e2 * s * s
            step = (one * one) / (2.0 * np.cos(phi)) * (
                q / (1.0 - e2)
                - s / one
                + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
            )
            phi = phi + np.where(np.isfinite(step), step, 0.0)
    q_pole = _aea_q(np.pi / 2.0, e)
    return np.where(np.abs(q) >= q_pole * (1.0 - 1e-13),
                    np.sign(q) * np.pi / 2.0, phi)


def lcc_constants(lat1: float, lat2: float, lat0: float,
                  a: float = A_WGS84, f: float = F_WGS84):
    """(e, n, F, rho0) for LCC 2SP (Snyder 15-8/15-10/15-7a); the 1SP
    degenerate case lat1 == lat2 takes n = sin(lat1)."""
    e, e2 = _ecc(a, f)
    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    t1, t0 = _conic_t(p1, e), _conic_t(p0, e)
    if lat1 == lat2:
        n = float(np.sin(p1))
    else:
        m1, m2 = _conic_m(p1, e2), _conic_m(p2, e2)
        t2 = _conic_t(p2, e)
        n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)))
    big_f = float(_conic_m(p1, e2) / (n * t1 ** n))
    rho0 = float(a * big_f * t0 ** n)
    return e, n, big_f, rho0


def lambert_conformal_forward(
    lon, lat, lat1: float, lat2: float, lat0: float = 0.0,
    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """lon/lat deg -> LCC 2SP meters (Snyder 14-1..14-4)."""
    e, n, big_f, rho0 = lcc_constants(lat1, lat2, lat0, a, f)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = _wrap_lam(np.radians(np.asarray(lon, dtype=np.float64) - lon0))
    lam, phi = np.broadcast_arrays(lam, phi)
    rho = a * big_f * _conic_t(phi, e) ** n
    th = n * lam
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lambert_conformal_inverse(
    E, N, lat1: float, lat2: float, lat0: float = 0.0,
    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """LCC meters -> lon/lat deg (Snyder 14-9..14-11, 15-11 fixed
    LCC_PHI_ITERS-step iteration)."""
    e, n, big_f, rho0 = lcc_constants(lat1, lat2, lat0, a, f)
    x = np.asarray(E, dtype=np.float64) - fe
    y = rho0 - (np.asarray(N, dtype=np.float64) - fn)
    x, y = np.broadcast_arrays(x, y)
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.hypot(x, y)
    th = np.arctan2(sgn * x, sgn * y)
    t = (rho / (a * big_f)) ** (1.0 / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(LCC_PHI_ITERS):
        s = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
        )
    lon = np.degrees(th / n) + lon0
    return lon - 360.0 * np.floor((lon + 180.0) / 360.0), np.degrees(phi)


def aea_constants(lat1: float, lat2: float, lat0: float,
                  a: float = A_WGS84, f: float = F_WGS84):
    """(e, n, C, rho0) for Albers (Snyder 14-14/14-13/14-12a)."""
    e, e2 = _ecc(a, f)
    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    m1 = _conic_m(p1, e2)
    q1, q0 = _aea_q(p1, e), _aea_q(p0, e)
    if lat1 == lat2:
        n = float(np.sin(p1))
    else:
        m2 = _conic_m(p2, e2)
        q2 = _aea_q(p2, e)
        n = float((m1 * m1 - m2 * m2) / (q2 - q1))
    big_c = float(m1 * m1 + n * q1)
    rho0 = float(a * np.sqrt(big_c - n * q0) / n)
    return e, n, big_c, rho0


def albers_forward(
    lon, lat, lat1: float, lat2: float, lat0: float = 0.0,
    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """lon/lat deg -> Albers equal-area meters (Snyder 14-12/14-1..4)."""
    e, n, big_c, rho0 = aea_constants(lat1, lat2, lat0, a, f)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = _wrap_lam(np.radians(np.asarray(lon, dtype=np.float64) - lon0))
    lam, phi = np.broadcast_arrays(lam, phi)
    rho = a * np.sqrt(big_c - n * _aea_q(phi, e)) / n
    th = n * lam
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def albers_inverse(
    E, N, lat1: float, lat2: float, lat0: float = 0.0,
    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """Albers meters -> lon/lat deg (Snyder 14-19..14-21, 3-16 fixed
    AEA_PHI_ITERS-step iteration from the authalic start).  The exact
    pole (|q| == q_pole) is where 3-16's 1/cos(phi) blows up; the
    start value already lands there so the correction term's NaN is
    suppressed and the start kept."""
    e, n, big_c, rho0 = aea_constants(lat1, lat2, lat0, a, f)
    e2 = e * e
    x = np.asarray(E, dtype=np.float64) - fe
    y = rho0 - (np.asarray(N, dtype=np.float64) - fn)
    x, y = np.broadcast_arrays(x, y)
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.hypot(x, y)
    th = np.arctan2(sgn * x, sgn * y)
    q = (big_c - (rho * n / a) ** 2) / n
    phi = _authalic_phi(q, e)
    lon = np.degrees(th / n) + lon0
    return lon - 360.0 * np.floor((lon + 180.0) / 360.0), np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area (EPSG method 9820) — round 5
# ---------------------------------------------------------------------------
# Snyder PP1395 §24 (eqs. 24-2..24-16 via authalic latitude) ==
# EPSG GN7-2 §3.5.2; verified against the guidance note's ETRS89
# worked example (E 3962799.45, N 2999718.85) in tests.  EPSG:3035
# (the EU standard statistics grid) is the registered instance.
# The antipode of the projection center is not representable (the
# oblique-azimuthal denominator vanishes) — forward returns NaN
# there, matching PROJ's error behavior.


def laea_constants(lat0: float, a: float = A_WGS84, f: float = F_WGS84):
    """(e, qp, beta0, Rq, D) per Snyder 3-12/24-20/24-19/3-11/24-18."""
    e, e2 = _ecc(a, f)
    qp = float(_aea_q(np.pi / 2.0, e))
    q0 = float(_aea_q(np.radians(lat0), e))
    beta0 = float(np.arcsin(np.clip(q0 / qp, -1.0, 1.0)))
    rq = float(a * np.sqrt(qp / 2.0))
    d = float(a * _conic_m(np.radians(lat0), e2) / (rq * np.cos(beta0)))
    return e, qp, beta0, rq, d


def laea_forward(
    lon, lat, lat0: float = 0.0, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """lon/lat deg -> oblique LAEA meters (Snyder 24-2..24-22), or the
    polar aspect (Snyder 24-23/24-24: rho = a sqrt(qp -+ q)) when lat0
    is exactly ±90 — the oblique formulas' D constant divides by
    cos(beta0) = 0 there.  The polar branch is what the EASE-Grid 2.0
    North/South codes (EPSG:6931/6932) use."""
    e, qp, b0, rq, d = laea_constants(lat0, a, f)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = _wrap_lam(np.radians(np.asarray(lon, dtype=np.float64) - lon0))
    lam, phi = np.broadcast_arrays(lam, phi)
    if abs(lat0) == 90.0:
        sgn = 1.0 if lat0 > 0 else -1.0
        q = _aea_q(phi, e)
        rho = a * np.sqrt(np.maximum(qp - sgn * q, 0.0))
        E = fe + rho * np.sin(lam)
        N = fn - sgn * rho * np.cos(lam)
        return E, N
    beta = np.arcsin(np.clip(_aea_q(phi, e) / qp, -1.0, 1.0))
    denom = (1.0 + np.sin(b0) * np.sin(beta)
             + np.cos(b0) * np.cos(beta) * np.cos(lam))
    with np.errstate(divide="ignore", invalid="ignore"):
        big_b = rq * np.sqrt(2.0 / denom)
    E = fe + big_b * d * np.cos(beta) * np.sin(lam)
    N = fn + (big_b / d) * (np.cos(b0) * np.sin(beta)
                            - np.sin(b0) * np.cos(beta) * np.cos(lam))
    return E, N


def laea_inverse(
    E, N, lat0: float = 0.0, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """Oblique LAEA meters -> lon/lat deg (Snyder 24-16..24-27 +
    shared _authalic_phi iteration).  rho == 0 (the exact center) is
    special-cased to (lon0, lat0)'s authalic image.  lat0 = ±90 takes
    the polar branch (Snyder 24-29/24-31): q = ±(qp - rho^2/a^2),
    lam = atan2(x, -+y)."""
    if abs(lat0) == 90.0:
        e, _ = _ecc(a, f)
        qp = float(_aea_q(np.pi / 2.0, e))
        sgn = 1.0 if lat0 > 0 else -1.0
        x = np.asarray(E, dtype=np.float64) - fe
        y = np.asarray(N, dtype=np.float64) - fn
        x, y = np.broadcast_arrays(x, y)
        rho2 = x * x + y * y
        q = sgn * (qp - rho2 / (a * a))
        phi = _authalic_phi(q, e)
        lam = np.where(rho2 > 0.0, np.arctan2(x, -sgn * y), 0.0)
        lon = np.degrees(lam) + lon0
        return (lon - 360.0 * np.floor((lon + 180.0) / 360.0),
                np.degrees(phi))
    e, qp, b0, rq, d = laea_constants(lat0, a, f)
    x = (np.asarray(E, dtype=np.float64) - fe) / d
    y = d * (np.asarray(N, dtype=np.float64) - fn)
    x, y = np.broadcast_arrays(x, y)
    rho = np.hypot(x, y)
    with np.errstate(divide="ignore", invalid="ignore"):
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
        q = qp * (np.cos(ce) * np.sin(b0)
                  + np.where(rho > 0.0,
                             y * np.sin(ce) * np.cos(b0) / rho, 0.0))
        lam = np.arctan2(
            x * np.sin(ce),
            rho * np.cos(b0) * np.cos(ce) - y * np.sin(b0) * np.sin(ce),
        )
    phi = _authalic_phi(q, e)
    lon = np.degrees(lam) + lon0
    return lon - 360.0 * np.floor((lon + 180.0) / 360.0), np.degrees(phi)


# ---------------------------------------------------------------------------
# Cylindrical equal-area, ellipsoidal (Snyder §10 eqs 10-7/10-8,
# EPSG method 9835) — the NSIDC EASE-Grid 2.0 family (EPSG:6933)
# ---------------------------------------------------------------------------


def cea_constants(lat_ts: float, a: float = A_WGS84, f: float = F_WGS84):
    """(e, k0) with k0 = cos(phi_ts)/sqrt(1 - e^2 sin^2 phi_ts)
    (Snyder 10-13): the scale factor that makes the standard parallel
    true-to-scale."""
    e, e2 = _ecc(a, f)
    return e, float(_conic_m(np.radians(lat_ts), e2))


def cea_forward(
    lon, lat, lat_ts: float = 0.0, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """lon/lat deg -> ellipsoidal cylindrical equal-area meters
    (Snyder 10-7: E = a k0 lam; 10-8: N = a q / (2 k0)).  Non-
    iterative in both coordinates — the one equal-area family whose
    forward is a single closed-form expression, which is why the
    `ease_cells` gate query runs it as pure SQL codegen."""
    e, k0 = cea_constants(lat_ts, a, f)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = _wrap_lam(np.radians(np.asarray(lon, dtype=np.float64) - lon0))
    lam, phi = np.broadcast_arrays(lam, phi)
    E = fe + a * k0 * lam
    N = fn + a * _aea_q(phi, e) / (2.0 * k0)
    return E, N


def cea_inverse(
    E, N, lat_ts: float = 0.0, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0,
    a: float = A_WGS84, f: float = F_WGS84,
):
    """Ellipsoidal CEA meters -> lon/lat deg via the shared authalic
    iteration (Snyder 10-26 then 3-16)."""
    e, k0 = cea_constants(lat_ts, a, f)
    x = np.asarray(E, dtype=np.float64) - fe
    y = np.asarray(N, dtype=np.float64) - fn
    x, y = np.broadcast_arrays(x, y)
    q = 2.0 * y * k0 / a
    phi = _authalic_phi(q, e)
    lon = np.degrees(x / (a * k0)) + lon0
    return lon - 360.0 * np.floor((lon + 180.0) / 360.0), np.degrees(phi)


# ---------------------------------------------------------------------------
# Sinusoidal, ellipsoidal (Snyder §30 eqs 30-8/30-9/30-10) — the
# MODIS / ESRI:54008 equal-area pseudocylindrical.  y is the meridian
# arc M(phi), evaluated through the SAME Krüger rectifying-latitude
# series the transverse-Mercator backend uses (A*xi at lam=0), so the
# two families share one series implementation and its tests.
# ---------------------------------------------------------------------------


def sinusoidal_forward(
    lon, lat, lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0,
):
    """lon/lat deg -> ellipsoidal sinusoidal meters:
    x = a lam cos(phi)/sqrt(1-e^2 sin^2 phi) (Snyder 30-8),
    y = M(phi) via the Krüger series (meridian arc == A*xi(0, phi))."""
    e2 = _TM_E * _TM_E
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = _wrap_lam(np.radians(np.asarray(lon, dtype=np.float64) - lon0))
    lam, phi = np.broadcast_arrays(lam, phi)
    xi, _ = _tm_xi_eta(np.zeros_like(phi), phi)
    E = fe + A_WGS84 * lam * _conic_m(phi, e2)
    N = fn + _TM_A * xi
    return E, N


def sinusoidal_inverse(
    E, N, lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0,
):
    """Ellipsoidal sinusoidal meters -> lon/lat deg: invert the
    rectifying latitude with the Krüger beta series at eta=0 (xi' is
    then the conformal latitude), recover phi through the shared
    _tm_tauf Newton solve, then lam = x / (a m(phi)).  Within float
    roundoff of the poles m(phi) -> 0 makes lam indeterminate (the
    whole parallel collapses to one point) — mapped to lon0, the same
    convention as the LAEA center special case; the 1e-12 threshold is
    ~6 nm of parallel circumference."""
    e2 = _TM_E * _TM_E
    x = np.asarray(E, dtype=np.float64) - fe
    y = np.asarray(N, dtype=np.float64) - fn
    x, y = np.broadcast_arrays(x, y)
    mu = y / _TM_A
    chi = mu
    for j, bj in enumerate(_TM_BETA, start=1):
        chi = chi - bj * np.sin(2.0 * j * mu)
    phi = np.arctan(_tm_tauf(np.tan(chi)))
    m = _conic_m(phi, e2)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.where(m > 1e-12, x / (A_WGS84 * m), 0.0)
    lon = np.degrees(lam) + lon0
    return lon - 360.0 * np.floor((lon + 180.0) / 360.0), np.degrees(phi)


# ---------------------------------------------------------------------------
# Azimuthal equidistant, spherical (Snyder §25 eqs 25-1..25-15) —
# ESRI:54032 World Azimuthal Equidistant (sphere of the WGS84
# semi-major axis, the same a-as-sphere convention as Mollweide/
# Robinson/Van-der-Grinten above).
# ---------------------------------------------------------------------------


def aeqd_forward(
    lon, lat, lat0: float = 0.0, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0, radius: float = R_SPHERE,
):
    """lon/lat deg -> oblique spherical AEQD meters.  k' = c/sin(c)
    (Snyder 25-2) with the c -> 0 limit k' = 1 taken explicitly; the
    defining property (plane distance from center == R * great-circle
    angle, azimuths true from center) is what the tests pin."""
    phi0 = np.radians(lat0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = _wrap_lam(np.radians(np.asarray(lon, dtype=np.float64) - lon0))
    lam, phi = np.broadcast_arrays(lam, phi)
    cosc = (np.sin(phi0) * np.sin(phi)
            + np.cos(phi0) * np.cos(phi) * np.cos(lam))
    c = np.arccos(np.clip(cosc, -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        kp = np.where(c > 0.0, c / np.sin(c), 1.0)
    E = fe + radius * kp * np.cos(phi) * np.sin(lam)
    N = fn + radius * kp * (np.cos(phi0) * np.sin(phi)
                            - np.sin(phi0) * np.cos(phi) * np.cos(lam))
    return E, N


def aeqd_inverse(
    E, N, lat0: float = 0.0, lon0: float = 0.0,
    fe: float = 0.0, fn: float = 0.0, radius: float = R_SPHERE,
):
    """Spherical AEQD meters -> lon/lat deg (Snyder 25-15 with
    c = rho/R; rho == 0 special-cased to the center)."""
    phi0 = np.radians(lat0)
    x = np.asarray(E, dtype=np.float64) - fe
    y = np.asarray(N, dtype=np.float64) - fn
    x, y = np.broadcast_arrays(x, y)
    rho = np.hypot(x, y)
    c = rho / radius
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(
            rho > 0.0,
            np.arcsin(np.clip(
                np.cos(c) * np.sin(phi0)
                + y * np.sin(c) * np.cos(phi0) / np.where(rho > 0.0, rho, 1.0),
                -1.0, 1.0,
            )),
            phi0,
        )
        lam = np.where(
            rho > 0.0,
            np.arctan2(
                x * np.sin(c),
                rho * np.cos(phi0) * np.cos(c) - y * np.sin(phi0) * np.sin(c),
            ),
            0.0,
        )
    lon = np.degrees(lam) + lon0
    return lon - 360.0 * np.floor((lon + 180.0) / 360.0), np.degrees(phi)


# ---------------------------------------------------------------------------
# proj4 string resolution (the reference's README passes proj4
# strings, not authority codes — README.md:139-141, 470-472)
# ---------------------------------------------------------------------------

# keys that change nothing for these spherical-on-WGS84 backends;
# datum/ellps/towgs84/R are NOT blanket-ignorable — their VALUES are
# vetted by _check_datum_free (a NAD27 datum or intl ellipsoid would
# silently shift coordinates; round-4 advisor fix)
_PROJ4_IGNORABLE = {
    "datum", "ellps", "units", "no_defs", "nodefs", "towgs84", "wktext", "type",
    "r",
}

# ellipsoid/datum spellings whose horizontal datum matches WGS84
# closely enough that these WGS84-sphere backends stay valid
_WGS84_LIKE = {"WGS84", "GRS80"}


def _check_datum_free(proj: dict, label: str) -> None:
    """Raise unless the parsed proj4 dict carries no datum shift vs
    WGS84: datum/ellps absent or WGS84/GRS80, towgs84 absent or all
    zeros, +R absent or the WGS84 semi-major axis.  Loud error over a
    silently shifted map (module policy)."""
    for key in ("datum", "ellps"):
        v = proj.get(key)
        if v is not None and v is not True and str(v).upper() not in _WGS84_LIKE:
            raise ValueError(
                f"+{key}={v} in {label} implies a datum shift these "
                "WGS84 analytic backends cannot honor (install pyproj)"
            )
    tw = proj.get("towgs84")
    if tw is not None and tw is not True:
        try:
            shifts = [float(t) for t in str(tw).split(",")]
        except ValueError:
            shifts = [1.0]
        if any(s != 0.0 for s in shifts):
            raise ValueError(
                f"+towgs84={tw} in {label} is a nonzero datum shift "
                "(install pyproj)"
            )
    r = proj.get("r")
    if r is not None and r is not True and float(r) != A_WGS84:
        raise ValueError(
            f"+R={r} in {label}: only the WGS84 semi-major sphere "
            f"(R={A_WGS84:.0f}) is supported analytically"
        )


def parse_proj4(s: str) -> dict | None:
    """'+proj=ortho +lat_0=-10 ...' -> {'proj': 'ortho', 'lat_0':
    -10.0, ...}; None if it doesn't look like a proj4 string.  The
    reference's README includes one malformed token ('no_defs'
    without '+', README.md:140) — tolerated like PROJ does."""
    s = str(s).strip()
    if "+proj=" not in s:
        return None
    out: dict = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        key, _, val = tok.partition("=")
        key = key.lower()
        if val == "":
            out.setdefault(key, True)
        elif key == "proj":
            out["proj"] = val.lower()
        else:
            try:
                out[key] = float(val)
            except ValueError:
                out[key] = val
    return out


def _offset_pair(fwd, inv, lon0=0.0, x0=0.0, y0=0.0, **kw):
    """Wrap a (forward, inverse) kernel with proj4 lon_0/x_0/y_0
    handling; zero params leave the arithmetic bit-identical."""

    def f(lon, lat):
        if lon0:
            lon = np.asarray(lon, dtype=np.float64) - lon0
        x, y = fwd(lon, lat, **kw)
        return (x + x0 if x0 else x), (y + y0 if y0 else y)

    def g(x, y):
        if x0:
            x = np.asarray(x, dtype=np.float64) - x0
        if y0:
            y = np.asarray(y, dtype=np.float64) - y0
        lon, lat = inv(x, y, **kw)
        return (lon + lon0 if lon0 else lon), lat

    return f, g


_PROJ4_BACKENDS = {
    "moll": (mollweide_forward, mollweide_inverse),
    "robin": (robinson_forward, robinson_inverse),
    "vandg": (vandergrinten_forward, vandergrinten_inverse),
}


def resolve_proj4_pair(fromcrs, tocrs):
    """(fromcrs, tocrs) proj4 strings -> AnalyticProjection backend,
    or None when the pair isn't an analytic lonlat<->projection pair.
    Raises ValueError when the projection is recognized but carries a
    parameter these backends can't honor (better a loud error than a
    silently wrong map)."""
    pf, pt = parse_proj4(str(fromcrs)), parse_proj4(str(tocrs))

    def is_lonlat(p):
        return p is not None and p.get("proj") in ("longlat", "latlong", "lonlat")

    if is_lonlat(pf) and pt is not None and not is_lonlat(pt):
        proj, lonlat_side, forward = pt, pf, True
    elif is_lonlat(pt) and pf is not None and not is_lonlat(pf):
        proj, lonlat_side, forward = pf, pt, False
    else:
        return None

    name = proj.get("proj")
    if name not in _PROJ4_BACKENDS and name not in (
        "ortho", "merc", "webmerc", "utm", "tmerc", "lcc", "aea", "laea",
        "cea", "sinu", "aeqd",
    ):
        return None
    # neither side may carry a datum shift vs WGS84 (advisor fix:
    # '+proj=longlat +datum=NAD27' or '+ellps=intl' must be loud)
    _check_datum_free(lonlat_side, "the lonlat CRS")
    _check_datum_free(proj, f"+proj={name}")
    known = {"proj", "lon_0", "x_0", "y_0"} | _PROJ4_IGNORABLE
    if name == "ortho":
        known = known | {"lat_0"}
    elif name == "utm":
        # '+proj=utm +zone=N [+south]' — lon_0/x_0/y_0 are FIXED by
        # the UTM convention; an explicit override means the caller
        # wants generic tmerc and should say so
        known = (known - {"lon_0", "x_0", "y_0"}) | {"zone", "south"}
    elif name == "tmerc":
        known = known | {"lat_0", "k", "k_0"}
    elif name in ("lcc", "aea"):
        # 2SP conics; PROJ's lcc defaults lat_2 = lat_1 (1SP cone)
        # and both default lat_0 = 0.  k_0 != 1 (the 1SP scale-factor
        # variant, EPSG 9801) is not implemented — loud error below.
        known = known | {"lat_0", "lat_1", "lat_2", "k", "k_0"}
    elif name == "laea":
        known = known | {"lat_0"}
    elif name == "cea":
        # ellipsoidal Lambert cylindrical equal-area (EPSG 9835);
        # PROJ's alternative +k_0 spelling of the standard parallel is
        # not implemented — loud error below
        known = known | {"lat_ts", "k", "k_0"}
    elif name == "aeqd":
        # the analytic backend is SPHERICAL (Snyder §25); PROJ's bare
        # '+proj=aeqd' on WGS84 is ellipsoidal (geodesic distances),
        # so the sphere must be DECLARED — same policy as +proj=merc
        known = known | {"lat_0", "a", "b"}
    elif name in ("merc", "webmerc"):
        # spherical web-Mercator only.  PROJ's bare '+proj=merc' is
        # ELLIPSOIDAL (~21 km max northing difference), so plain merc
        # must DECLARE the sphere: +a=+b=6378137 or +R=6378137
        # (advisor fix); '+proj=webmerc' is spherical by definition.
        known = known | {"a", "b", "lat_ts", "k", "k_0", "nadgrids"}
        declared_sphere = (
            ("a" in proj and "b" in proj)
            or float(proj.get("r", 0.0) if proj.get("r") is not True else 0.0)
            == A_WGS84
        )
        if (
            (name == "merc" and not declared_sphere)
            or float(proj.get("a", A_WGS84)) != A_WGS84
            or float(proj.get("b", A_WGS84)) != A_WGS84
            or float(proj.get("lat_ts", 0.0)) != 0.0
            or float(proj.get("k", proj.get("k_0", 1.0))) != 1.0
        ):
            raise ValueError(
                "+proj=merc supported analytically only as the DECLARED "
                "spherical web-Mercator (+a=6378137 +b=6378137 or "
                "+R=6378137, lat_ts=0, k=1); bare '+proj=merc' is "
                "ellipsoidal in PROJ — install pyproj for that"
            )
    extra = set(proj) - known
    if extra:
        raise ValueError(
            f"+proj={name} parameter(s) {sorted(extra)} not supported by the "
            "analytic backend (install pyproj for full PROJ semantics)"
        )
    lon0 = float(proj.get("lon_0", 0.0))
    x0 = float(proj.get("x_0", 0.0))
    y0 = float(proj.get("y_0", 0.0))
    if name == "utm":
        if "zone" not in proj:
            raise ValueError("+proj=utm requires +zone=1..60")
        zone = int(float(proj["zone"]))
        south = bool(proj.get("south", False))
        fwd = lambda lon, lat: utm_forward(lon, lat, zone, south=south)  # noqa: E731
        inv = lambda E, N: utm_inverse(E, N, zone, south=south)  # noqa: E731
        return AnalyticProjection(fwd, inv, forward=forward)
    if name == "tmerc":
        k0 = float(proj.get("k", proj.get("k_0", 1.0)))
        lat0 = float(proj.get("lat_0", 0.0))
        fwd = lambda lon, lat: transverse_mercator_forward(  # noqa: E731
            lon, lat, lon0=lon0, k0=k0, fe=x0, fn=y0, lat0=lat0
        )
        inv = lambda E, N: transverse_mercator_inverse(  # noqa: E731
            E, N, lon0=lon0, k0=k0, fe=x0, fn=y0, lat0=lat0
        )
        return AnalyticProjection(fwd, inv, forward=forward)
    if name in ("lcc", "aea"):
        if float(proj.get("k", proj.get("k_0", 1.0))) != 1.0:
            raise ValueError(
                f"+proj={name} with k_0 != 1 is the 1SP scale-factor "
                "variant (EPSG 9801) — not implemented analytically "
                "(install pyproj)"
            )
        if "lat_1" not in proj:
            raise ValueError(f"+proj={name} requires +lat_1")
        lat1 = float(proj["lat_1"])
        lat2 = float(proj.get("lat_2", lat1))
        lat0 = float(proj.get("lat_0", 0.0))
        kf, ki = (
            (lambert_conformal_forward, lambert_conformal_inverse)
            if name == "lcc"
            else (albers_forward, albers_inverse)
        )
        fwd = lambda lon, lat: kf(  # noqa: E731
            lon, lat, lat1, lat2, lat0=lat0, lon0=lon0, fe=x0, fn=y0
        )
        inv = lambda E, N: ki(  # noqa: E731
            E, N, lat1, lat2, lat0=lat0, lon0=lon0, fe=x0, fn=y0
        )
        return AnalyticProjection(fwd, inv, forward=forward)
    if name == "laea":
        lat0 = float(proj.get("lat_0", 0.0))
        fwd = lambda lon, lat: laea_forward(  # noqa: E731
            lon, lat, lat0=lat0, lon0=lon0, fe=x0, fn=y0
        )
        inv = lambda E, N: laea_inverse(  # noqa: E731
            E, N, lat0=lat0, lon0=lon0, fe=x0, fn=y0
        )
        return AnalyticProjection(fwd, inv, forward=forward)
    if name == "cea":
        if float(proj.get("k", proj.get("k_0", 1.0))) != 1.0:
            raise ValueError(
                "+proj=cea with k_0 != 1 (the direct-scale spelling of "
                "the standard parallel) is not implemented analytically "
                "(use +lat_ts, or install pyproj)"
            )
        lat_ts = float(proj.get("lat_ts", 0.0))
        fwd = lambda lon, lat: cea_forward(  # noqa: E731
            lon, lat, lat_ts=lat_ts, lon0=lon0, fe=x0, fn=y0
        )
        inv = lambda E, N: cea_inverse(  # noqa: E731
            E, N, lat_ts=lat_ts, lon0=lon0, fe=x0, fn=y0
        )
        return AnalyticProjection(fwd, inv, forward=forward)
    if name == "sinu":
        fwd = lambda lon, lat: sinusoidal_forward(  # noqa: E731
            lon, lat, lon0=lon0, fe=x0, fn=y0
        )
        inv = lambda E, N: sinusoidal_inverse(  # noqa: E731
            E, N, lon0=lon0, fe=x0, fn=y0
        )
        return AnalyticProjection(fwd, inv, forward=forward)
    if name == "aeqd":
        declared_sphere = (
            "r" in proj
            or ("a" in proj and "b" in proj and proj["a"] == proj["b"])
        )
        if not declared_sphere or float(proj.get("a", A_WGS84)) != A_WGS84:
            raise ValueError(
                "+proj=aeqd supported analytically only as the DECLARED "
                "sphere of the WGS84 semi-major axis (+R=6378137 or "
                "+a=6378137 +b=6378137); bare '+proj=aeqd' is ellipsoidal "
                "(geodesic) in PROJ — install pyproj for that"
            )
        lat0 = float(proj.get("lat_0", 0.0))
        fwd = lambda lon, lat: aeqd_forward(  # noqa: E731
            lon, lat, lat0=lat0, lon0=lon0, fe=x0, fn=y0
        )
        inv = lambda E, N: aeqd_inverse(  # noqa: E731
            E, N, lat0=lat0, lon0=lon0, fe=x0, fn=y0
        )
        return AnalyticProjection(fwd, inv, forward=forward)
    if name == "ortho":
        lat0 = float(proj.get("lat_0", 0.0))
        fwd, inv = _offset_pair(
            lambda lon, lat: orthographic_forward(lon, lat, lat0=lat0),
            lambda x, y: orthographic_inverse(x, y, lat0=lat0),
            lon0=lon0, x0=x0, y0=y0,
        )
    elif name in ("merc", "webmerc"):
        fwd, inv = _offset_pair(
            _webmercator_forward, _webmercator_inverse, lon0=lon0, x0=x0, y0=y0
        )
    else:
        fwd, inv = _offset_pair(*_PROJ4_BACKENDS[name], lon0=lon0, x0=x0, y0=y0)
    return AnalyticProjection(fwd, inv, forward=forward)


def _webmercator_forward(lon, lat, radius: float = R_SPHERE):
    """Same arithmetic as transforms._SphericalMercator(forward=True)
    (kept there for compatibility; duplicated formula is 4 lines)."""
    x = radius * np.radians(np.asarray(lon, dtype=np.float64))
    y = radius * np.log(
        np.tan(np.pi / 4.0 + np.radians(np.asarray(lat, dtype=np.float64)) / 2.0)
    )
    return x, y


def _webmercator_inverse(x, y, radius: float = R_SPHERE):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / radius)
    lat = np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / radius)) - np.pi / 2.0
    )
    return lon, lat


# ---------------------------------------------------------------------------
# Backend adapters (the _SphericalMercator .transform protocol)
# ---------------------------------------------------------------------------

class AnalyticProjection:
    """Adapter: (forward_fn, inverse_fn) pair -> the backend protocol
    MapProjection expects (.transform(x, y) -> (px, py))."""

    def __init__(self, fwd, inv, forward: bool):
        self._fwd = fwd
        self._inv = inv
        self.forward = forward

    def transform(self, x, y):
        fn = self._fwd if self.forward else self._inv
        return fn(x, y)


def _pair(fwd, inv):
    return (
        lambda: AnalyticProjection(fwd, inv, forward=True),
        lambda: AnalyticProjection(fwd, inv, forward=False),
    )


def _ps_pair(lat_ts, lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0):
    return _pair(
        lambda lon, lat: polar_stereographic_forward(
            lon, lat, lat_ts=lat_ts, lon0=lon0, fe=fe, fn=fn
        ),
        lambda E, N: polar_stereographic_inverse(
            E, N, lat_ts=lat_ts, lon0=lon0, fe=fe, fn=fn
        ),
    )


# (lonlat -> proj maker, proj -> lonlat maker) per projected CRS code
ANALYTIC_PROJECTIONS = {
    "ESRI:54009": _pair(mollweide_forward, mollweide_inverse),
    "ESRI:54030": _pair(robinson_forward, robinson_inverse),
    "ESRI:54029": _pair(vandergrinten_forward, vandergrinten_inverse),
    "EPSG:3995": _ps_pair(71.0),   # WGS 84 / Arctic Polar Stereographic
    "EPSG:3031": _ps_pair(-71.0),  # WGS 84 / Antarctic Polar Stereographic
    # WGS 84 / EPSG Norway Polar Stereographic — published EPSG
    # registry parameters (Polar Stereographic variant B, EPSG method
    # 9829): standard parallel 71°N, longitude of origin 18°E,
    # FE = FN = 2 000 000 m on WGS84.  Same GN7-2 §3.2.4 machinery as
    # 3995/3031, verified against the guidance note's variant-B worked
    # example (EPSG:3032 parameters: E 7255380.79, N 7053389.56) in
    # tests/test_projections.py.
    "EPSG:5939": _ps_pair(71.0, lon0=18.0, fe=2_000_000.0, fn=2_000_000.0),
    # ETRS89-extended / LCC Europe — published EPSG registry
    # parameters (LCC 2SP, EPSG method 9802): std parallels 35°N/65°N,
    # false origin 52°N 10°E, FE 4 000 000 m, FN 2 800 000 m, GRS80
    # (in _WGS84_LIKE; horizontal difference vs WGS84 is sub-meter,
    # inside every gate observable's rounding)
    "EPSG:3034": _pair(
        lambda lon, lat: lambert_conformal_forward(
            lon, lat, 35.0, 65.0, lat0=52.0, lon0=10.0,
            fe=4_000_000.0, fn=2_800_000.0,
        ),
        lambda E, N: lambert_conformal_inverse(
            E, N, 35.0, 65.0, lat0=52.0, lon0=10.0,
            fe=4_000_000.0, fn=2_800_000.0,
        ),
    ),
    # Africa Albers Equal Area Conic — published ESRI registry
    # parameters on WGS84: std parallels 20°N/-23°S, origin 0°N 25°E
    "ESRI:102022": _pair(
        lambda lon, lat: albers_forward(lon, lat, 20.0, -23.0, lon0=25.0),
        lambda E, N: albers_inverse(E, N, 20.0, -23.0, lon0=25.0),
    ),
    # ETRS89-extended / LAEA Europe (the EU standard statistics grid)
    # — published EPSG registry parameters (EPSG method 9820): center
    # 52°N 10°E, FE 4 321 000 m, FN 3 210 000 m, GRS80; verified
    # against the GN7-2 worked example (E 3962799.45, N 2999718.85)
    "EPSG:3035": _pair(
        lambda lon, lat: laea_forward(
            lon, lat, lat0=52.0, lon0=10.0, fe=4_321_000.0, fn=3_210_000.0
        ),
        lambda E, N: laea_inverse(
            E, N, lat0=52.0, lon0=10.0, fe=4_321_000.0, fn=3_210_000.0
        ),
    ),
    # WGS 84 / NSIDC EASE-Grid 2.0 North & South — published EPSG
    # registry parameters (Lambert azimuthal equal area, polar
    # aspects): center (±90°, 0°), FE = FN = 0, WGS84
    "EPSG:6931": _pair(
        lambda lon, lat: laea_forward(lon, lat, lat0=90.0),
        lambda E, N: laea_inverse(E, N, lat0=90.0),
    ),
    "EPSG:6932": _pair(
        lambda lon, lat: laea_forward(lon, lat, lat0=-90.0),
        lambda E, N: laea_inverse(E, N, lat0=-90.0),
    ),
    # WGS 84 / NSIDC EASE-Grid 2.0 Global — published EPSG registry
    # parameters (Lambert cylindrical equal area, EPSG method 9835):
    # standard parallel 30°N, lon0 = 0, FE = FN = 0, WGS84.  The
    # equal-area grid NSIDC publishes satellite products on.
    "EPSG:6933": _pair(
        lambda lon, lat: cea_forward(lon, lat, lat_ts=30.0),
        lambda E, N: cea_inverse(E, N, lat_ts=30.0),
    ),
    # World Sinusoidal — ESRI registry parameters on WGS84 (the MODIS
    # land-grid family uses the same formulas on a sphere)
    "ESRI:54008": _pair(sinusoidal_forward, sinusoidal_inverse),
    # World Azimuthal Equidistant — sphere of the WGS84 semi-major
    # axis (a-as-sphere, like the other ESRI:540xx world projections
    # above), centered on (0°, 0°)
    "ESRI:54032": _pair(aeqd_forward, aeqd_inverse),
}


def _utm_pair(zone: int, south: bool):
    # default-arg binding so each zone's lambdas capture THEIR zone
    return _pair(
        lambda lon, lat, z=zone, s=south: utm_forward(lon, lat, z, south=s),
        lambda E, N, z=zone, s=south: utm_inverse(E, N, z, south=s),
    )


# WGS 84 / UTM: EPSG:32601-32660 (north), EPSG:32701-32760 (south) —
# all 120 published codes, one Krüger-series backend parameterized by
# zone central meridian + hemisphere false northing
for _z in range(1, 61):
    ANALYTIC_PROJECTIONS[f"EPSG:{32600 + _z}"] = _utm_pair(_z, south=False)
    ANALYTIC_PROJECTIONS[f"EPSG:{32700 + _z}"] = _utm_pair(_z, south=True)
del _z
