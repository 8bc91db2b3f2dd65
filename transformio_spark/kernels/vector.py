"""GeoJSON vector-geometry kernels (pure Python/numpy).

Behavioral parity with the reference's vector module
(``/root/reference/transformio/vector.py``): flat point iteration over
all 9 GeoJSON shapes, bbox, and deep transform with NaN/Inf point
dropping.

Parity-critical semantics preserved:
- polygon holes are iterated/transformed like exteriors
  (vector.py:23-26, 100-105);
- transformed points that come back NaN/Inf are DROPPED from their
  ring (vector.py:73-82) even when that leaves a degenerate/unclosed
  ring — the reference does it (e.g. TIN outside-hull points), so we
  replicate rather than "fix";
- emptied rings/parts are dropped (vector.py:97-116); Feature
  properties are copied through (vector.py:124-127).
"""

from __future__ import annotations

import numpy as np

__all__ = ["iter_points", "get_bbox", "transform"]


def _geometry_points(geom):
    gtype = geom["type"]
    coords = geom["coordinates"]
    if gtype == "Point":
        yield coords
    elif gtype in ("MultiPoint", "LineString"):
        yield from coords
    elif gtype == "MultiLineString":
        for line in coords:
            yield from line
    elif gtype == "Polygon":
        for ring in coords:
            yield from ring
    elif gtype == "MultiPolygon":
        for poly in coords:
            for ring in poly:
                yield from ring


def iter_points(geoj):
    """Flat generator over every coordinate of any GeoJSON value,
    including Feature/FeatureCollection/GeometryCollection wrappers
    (reference vector.py:4-50)."""
    gtype = geoj["type"]
    if gtype == "FeatureCollection":
        for feat in geoj["features"]:
            yield from _geometry_points(feat["geometry"])
    elif gtype == "GeometryCollection":
        for geom in geoj["geometries"]:
            yield from _geometry_points(geom)
    elif gtype == "Feature":
        yield from _geometry_points(geoj["geometry"])
    else:
        yield from _geometry_points(geoj)


def get_bbox(geoj):
    xs, ys = zip(*iter_points(geoj))
    return [min(xs), min(ys), max(xs), max(ys)]


def transform(geoj, trans):
    """Deep-transformed copy of a GeoJSON value (reference
    vector.py:58-144 semantics, see module docstring)."""
    if not geoj:
        return None

    def run_ring(coords):
        x, y = zip(*coords)
        px, py = trans.predict(x, y)
        bad = np.isnan(px) | np.isnan(py) | np.isinf(px) | np.isinf(py)
        return list(zip(px[~bad], py[~bad]))

    def run_geometry(geom):
        gtype = geom["type"]
        coords = geom["coordinates"]
        out = {"type": gtype, "coordinates": []}
        if gtype == "Point":
            pts = run_ring([coords])
            out["coordinates"] = pts[0] if pts else []
        elif gtype in ("MultiPoint", "LineString"):
            out["coordinates"] = run_ring(coords)
        elif gtype == "MultiLineString":
            lines = [run_ring(line) for line in coords]
            out["coordinates"] = [l for l in lines if l]
        elif gtype == "Polygon":
            rings = [run_ring(ring) for ring in coords]
            out["coordinates"] = [r for r in rings if r]
        elif gtype == "MultiPolygon":
            polys = [[run_ring(ring) for ring in poly] for poly in coords]
            polys = [[r for r in poly if r] for poly in polys]
            out["coordinates"] = [p for p in polys if p]
        return out

    gtype = geoj["type"]
    if gtype == "FeatureCollection":
        return {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "properties": f["properties"].copy(),
                    "geometry": run_geometry(f["geometry"]),
                }
                for f in geoj["features"]
            ],
        }
    if gtype == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [run_geometry(g) for g in geoj["geometries"]],
        }
    if gtype == "Feature":
        return {
            "type": "Feature",
            "properties": geoj["properties"].copy(),
            "geometry": run_geometry(geoj["geometry"]),
        }
    return run_geometry(geoj)
