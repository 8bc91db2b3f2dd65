"""Bowyer-Watson Delaunay triangulation (pure numpy).

The reference delegates triangulation to shapely/GEOS
(``/root/reference/transformio/transforms.py:656-660``); GEOS is not
available in this environment, so the engine carries its own
implementation.  For point sets in general position (no 4 cocircular
points) the Delaunay triangulation is UNIQUE, so triangle membership
— and therefore every TIN prediction strictly inside a triangle —
matches what GEOS would produce.  Only the *list order* of triangles
is implementation-defined; the reference's TIN gives last-triangle-
wins semantics for points exactly on shared edges, so we emit
triangles in a deterministic canonical order (sorted by centroid,
then vertices) to keep runs reproducible.

GCP counts are tiny (tens of points, fit on the driver; the fitted
triangle list is broadcast), so the O(n^2) insertion loop is
irrelevant to scale.
"""

from __future__ import annotations

import numpy as np

__all__ = ["delaunay_triangles"]


def _circumcircle_contains(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """True if (px,py) lies strictly inside the circumcircle of the
    CCW triangle (a,b,c) — the standard 3x3 in-circle determinant."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    det = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    return det > 0.0


def _ccw(pts, i, j, k) -> bool:
    (ax, ay), (bx, by), (cx, cy) = pts[i], pts[j], pts[k]
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0.0


def delaunay_triangles(points: np.ndarray) -> list:
    """Triangulate unique 2-D points; returns a list of triangles,
    each a list of three (x, y) float tuples of the ORIGINAL
    coordinates (duplicate input points are collapsed, matching
    MultiPoint semantics in the reference's shapely call)."""
    pts_arr = np.asarray(points, dtype=np.float64)
    # de-duplicate while keeping first-seen order
    seen = {}
    for x, y in pts_arr:
        seen.setdefault((float(x), float(y)), None)
    uniq = list(seen.keys())
    n = len(uniq)
    if n < 3:
        return []

    xs = np.array([p[0] for p in uniq])
    ys = np.array([p[1] for p in uniq])
    # super-triangle comfortably enclosing everything
    cx, cy = xs.mean(), ys.mean()
    span = max(xs.max() - xs.min(), ys.max() - ys.min(), 1.0) * 64.0
    pts = list(uniq) + [
        (cx - 2.0 * span, cy - span),
        (cx + 2.0 * span, cy - span),
        (cx, cy + 2.0 * span),
    ]
    s0, s1, s2 = n, n + 1, n + 2

    def canon(i, j, k):
        # store CCW with the smallest index first
        tri = (i, j, k) if _ccw(pts, i, j, k) else (i, k, j)
        m = tri.index(min(tri))
        return tri[m:] + tri[:m]

    triangles = {canon(s0, s1, s2)}

    for pi in range(n):
        px, py = pts[pi]
        bad = []
        for tri in triangles:
            a, b, c = (pts[t] for t in tri)
            if _circumcircle_contains(a[0], a[1], b[0], b[1], c[0], c[1], px, py):
                bad.append(tri)
        # boundary of the cavity = edges that belong to exactly one bad tri
        edge_count = {}
        for tri in bad:
            for e in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, (0, e))[0] + 1, e
        for tri in bad:
            triangles.discard(tri)
        for (count, e) in edge_count.values():
            if count == 1:
                triangles.add(canon(e[0], e[1], pi))

    out = []
    for tri in triangles:
        if s0 in tri or s1 in tri or s2 in tri:
            continue
        out.append([pts[i] for i in tri])
    # deterministic canonical order (see module docstring)
    out.sort(key=lambda t: (sum(p[0] for p in t) / 3.0, sum(p[1] for p in t) / 3.0, t))
    return out
