"""GeoJSON rasterization (reference utils.py:7-74 ``draw_geojson``),
PIL-free.

The reference draws with PIL ImageDraw (ellipse / polygon / line).
PIL is unavailable in this sandbox, so marks are rasterized with
PER-PIXEL PREDICATES evaluated on the pixel grid:

- Point/MultiPoint -> filled disc of diameter ``fillsize`` (the
  reference draws an ellipse in a square bbox = a circle);
- Polygon exterior -> even-odd scanline fill + a distance-to-segment
  outline band of width ``outlinewidth``;
- geometry list / transform plumbing identical to the reference
  (FeatureCollection/GeometryCollection/Feature unwrap, geo->image
  via fitbounds().inverse()).

DOCUMENTED DEVIATION: PIL's sub-pixel edge conventions differ
slightly (ImageDraw uses its own scan conversion); pixel-level parity
is untestable without PIL.  The predicate formulation is chosen
because it makes the DISTRIBUTED twin (operators/raster.
rasterize_tiles) bit-equal to this whole-image kernel: a pixel's
color is a pure function of (pixel center, geometry), so tile windows
compose exactly.

Bounds/aspect logic replicates the reference exactly, including the
quirk that passing ``imbounds`` without ``im`` crashes (NameError on
``h``/``w`` in the reference, utils.py:18 — here a ValueError with a
message)."""

from __future__ import annotations

import numpy as np

from . import vector
from .warp import fitbounds

COLORS = {
    "blue": (0, 0, 255, 255),
    "red": (255, 0, 0, 255),
    "green": (0, 128, 0, 255),
    "black": (0, 0, 0, 255),
    "white": (255, 255, 255, 255),
    "yellow": (255, 255, 0, 255),
}


def _rgba(color) -> np.ndarray:
    if color is None:
        return None
    if isinstance(color, str):
        return np.array(COLORS[color], dtype=np.uint8)
    c = tuple(color)
    if len(c) == 3:
        c = c + (255,)
    return np.array(c, dtype=np.uint8)


def _pixel_grid(width: int, height: int, col0: int = 0, row0: int = 0):
    """Pixel-center coordinate grids for a (possibly windowed) region
    of the image — GLOBAL pixel coordinates so tile windows compose."""
    xs = np.arange(col0, col0 + width, dtype=np.float64)
    ys = np.arange(row0, row0 + height, dtype=np.float64)
    return np.meshgrid(xs, ys)


def disc_mask(cx, cy, radius, X, Y) -> np.ndarray:
    return (X - cx) ** 2 + (Y - cy) ** 2 <= radius * radius


def polygon_mask(ring, X, Y) -> np.ndarray:
    """Even-odd ray-cast fill over pixel centers — the same crossing
    rule as operators/spatial_join.ray_cast_inside, vectorized."""
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    crossings = np.zeros(X.shape, dtype=np.int64)
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        straddle = (y1 > Y) != (y2 > Y)
        t = (x2 - x1) * (Y - y1) - (X - x1) * (y2 - y1)
        dy_pos = y2 > y1
        cross = straddle & np.where(dy_pos, t > 0, t < 0)
        crossings += cross
    return (crossings % 2) == 1


def segment_band_mask(x1, y1, x2, y2, half_w, X, Y) -> np.ndarray:
    """Pixels within half_w of the segment (the outline stroke)."""
    dx, dy = x2 - x1, y2 - y1
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return disc_mask(x1, y1, half_w, X, Y)
    t = np.clip(((X - x1) * dx + (Y - y1) * dy) / L2, 0.0, 1.0)
    px, py = x1 + t * dx, y1 + t * dy
    return (X - px) ** 2 + (Y - py) ** 2 <= half_w * half_w


def render_geoms(
    geoms_img,
    out: np.ndarray,
    fillcolor="blue",
    fillsize=10,
    outlinecolor=None,
    outlinewidth=1,
    col0: int = 0,
    row0: int = 0,
) -> np.ndarray:
    """Paint image-space geometries into ``out`` (h, w, 4), later
    geometries over earlier ones (PIL draw-order semantics).
    ``col0``/``row0`` offset the pixel window for tiled rendering."""
    h, w = out.shape[:2]
    X, Y = _pixel_grid(w, h, col0, row0)
    fill = _rgba(fillcolor)
    outline = _rgba(outlinecolor)
    for geom in geoms_img:
        typ = geom["type"]
        if "Point" in typ:
            pts = geom["coordinates"] if "Multi" in typ else [geom["coordinates"]]
            r = fillsize / 2.0
            half_w = outlinewidth / 2.0
            for x, y in pts:
                m = disc_mask(x, y, r, X, Y)
                if fill is not None:
                    out[m] = fill
                if outline is not None:
                    # reference utils.py:42 draws the ellipse with
                    # outline=outlinecolor, width=outlinewidth; here an
                    # annulus band centered on the ideal circle (same
                    # convention as segment_band_mask) — PIL rasters
                    # the band inward from the bbox, a sub-pixel
                    # placement difference covered by the documented
                    # deviation above.
                    band = disc_mask(x, y, r + half_w, X, Y)
                    if r - half_w > 0:
                        band = band & ~disc_mask(x, y, r - half_w, X, Y)
                    out[band] = outline
        elif "Polygon" in typ:
            polys = geom["coordinates"] if "Multi" in typ else [geom["coordinates"]]
            for poly in polys:
                ext = poly[0]
                if fill is not None:
                    out[polygon_mask(ext, X, Y)] = fill
                if outline is not None:
                    ring = np.asarray(ext, dtype=np.float64)
                    half = outlinewidth / 2.0
                    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
                        out[segment_band_mask(x1, y1, x2, y2, half, X, Y)] = outline
        else:
            # reference utils.py:52 raises for LineString et al
            raise NotImplementedError(typ)
    return out


def _geom_list(geoj) -> list:
    geotype = geoj["type"]
    if geotype == "FeatureCollection":
        return [feat["geometry"] for feat in geoj["features"]]
    if geotype == "GeometryCollection":
        return geoj["geometries"]
    if geotype == "Feature":
        return [geoj["geometry"]]
    return [geoj]


def plan_draw(geoj, im_size=None, imbounds=None):
    """Driver-side planning shared by the single-array kernel and the
    tiled operator: bounds padding + aspect sizing exactly as the
    reference (utils.py:9-25), then geo->image transform and the
    image-space geometry list.  Returns (geoms_img, (w, h), imbounds)."""
    if imbounds is None:
        x1, y1, x2, y2 = vector.get_bbox(geoj)
        w, h = x2 - x1, y2 - y1
        pad = 0.05
        imbounds = (x1 - w * pad, y2 + h * pad, x2 + w * pad, y1 - h * pad)
    elif im_size is None:
        raise ValueError(
            "imbounds without im is unsupported (the reference crashes "
            "here with NameError, utils.py:18-21)"
        )
    if im_size is None:
        aspect = h / w
        width = 1000.0
        height = width * aspect
        width, height = int(width), int(height)
    else:
        width, height = im_size
    im2geo = fitbounds(width, height, list(imbounds))
    geo2im = im2geo.inverse()
    geoms_img = [vector.transform(g, geo2im) for g in _geom_list(geoj)]
    return geoms_img, (width, height), imbounds


def draw_geojson(
    geoj,
    im: np.ndarray | None = None,
    imbounds=None,
    fillcolor="blue",
    fillsize=10,
    outlinecolor=None,
    outlinewidth=1,
):
    """Reference utils.draw_geojson semantics over a numpy RGBA canvas.
    Returns (rgba (h, w, 4) uint8, imbounds)."""
    im_size = None if im is None else (im.shape[1], im.shape[0])
    geoms_img, (w, h), imbounds = plan_draw(geoj, im_size, imbounds)
    out = np.zeros((h, w, 4), dtype=np.uint8) if im is None else im
    render_geoms(
        geoms_img, out,
        fillcolor=fillcolor, fillsize=fillsize,
        outlinecolor=outlinecolor, outlinewidth=outlinewidth,
    )
    return out, imbounds
