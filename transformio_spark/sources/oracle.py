"""DuckDB oracle SQL builders.

Each builder returns ANSI SQL (DuckDB dialect) that recomputes a
pipeline result *numerically from doc_id* using the shared derivation
spec — semantically the same job the Spark engine runs end-to-end
through spans-string construction, regexp extraction, fitted-affine
decode, tiling and joins.  Agreement therefore validates the whole
Spark path, not just the final aggregate.

The driver registers the testdata parquet files as views named
``documents``, ``nation``, etc. — these texts reference those names.
"""

from __future__ import annotations

from ..functions.geo import haversine_km_sql
from ..functions.tiles import tile_id_sql
from . import synthspec


DOC_NUM_SQL = "(l_orderkey * 8 + l_linenumber)"


def points_cte() -> str:
    """CTE ``pts``: every extracted media point (primary + secondary),
    one row per media span, with doc_num, span_pos, lon, lat.  Docs
    derive from lineitem (see synth.DOC_NUM_SQL)."""
    e = synthspec.point_exprs_sql("doc_num")
    return f"""
pts AS (
    WITH ids AS (SELECT {DOC_NUM_SQL} AS doc_num FROM lineitem)
    SELECT doc_num, 0 AS span_pos,
           round({e['lon']}, 4) AS lon, round({e['lat']}, 4) AS lat
    FROM ids
    UNION ALL
    SELECT doc_num, 1 AS span_pos,
           {e['lon2']} AS lon, {e['lat2']} AS lat
    FROM ids WHERE {e['has_second']}
)"""


def boxes_cte() -> str:
    return """
boxes AS (
    SELECT n_nationkey AS region_id, n_name AS region_name,
           -180.0 + (n_nationkey % 5) * 72.0 AS lon_min,
           -180.0 + (n_nationkey % 5) * 72.0 + 72.0 AS lon_max,
           -85.0 + cast(floor(n_nationkey / 5) as int) * 34.0 AS lat_min,
           -85.0 + cast(floor(n_nationkey / 5) as int) * 34.0 + 34.0 AS lat_max
    FROM nation
)"""


def centers_cte() -> str:
    rows = ", ".join(
        f"({i}, {lon!r}, {lat!r})" for i, (lon, lat) in enumerate(synthspec.CITIES)
    )
    return f"""
centers AS (
    SELECT * FROM (VALUES {rows}) AS t(center_id, c_lon, c_lat)
)"""


def tile_counts_sql(zoom: int) -> str:
    tid = tile_id_sql("lon", "lat", zoom)
    return f"""
WITH {points_cte()}
SELECT {tid} AS tile_id, count(*) AS n_points
FROM pts
GROUP BY 1
ORDER BY n_points DESC, tile_id
LIMIT 100
"""


_E5 = "cast(round({c} * 100000e0, 0) as bigint)"


def region_join_counts_sql() -> str:
    plon = _E5.format(c="p.lon")
    plat = _E5.format(c="p.lat")
    return f"""
WITH {points_cte()}, {boxes_cte()}
SELECT b.region_id AS region_id, count(*) AS n_points
FROM pts p JOIN boxes b
  ON {plon} >= {_E5.format(c="b.lon_min")} AND {plon} < {_E5.format(c="b.lon_max")}
 AND {plat} >= {_E5.format(c="b.lat_min")} AND {plat} < {_E5.format(c="b.lat_max")}
GROUP BY 1
ORDER BY 1
"""


def pip_triangle_counts_sql() -> str:
    # integer-lattice sign test: tris vertices are bigint e5 coords
    x = _E5.format(c="p.lon")
    y = _E5.format(c="p.lat")
    c1 = f"(t.x2-t.x1)*({y}-t.y1)-(t.y2-t.y1)*({x}-t.x1)"
    c2 = f"(t.x3-t.x2)*({y}-t.y2)-(t.y3-t.y2)*({x}-t.x2)"
    c3 = f"(t.x1-t.x3)*({y}-t.y3)-(t.y1-t.y3)*({x}-t.x3)"
    return f"""
WITH {points_cte()}, {boxes_cte()},
tris AS (
    SELECT region_id, region_name,
           cast((lon_min + 8.0)  * 100000 as bigint) AS x1,
           cast((lat_min + 4.0)  * 100000 as bigint) AS y1,
           cast((lon_min + 64.0) * 100000 as bigint) AS x2,
           cast((lat_min + 10.0) * 100000 as bigint) AS y2,
           cast((lon_min + 30.0) * 100000 as bigint) AS x3,
           cast((lat_max - 4.0)  * 100000 as bigint) AS y3
    FROM boxes
)
SELECT t.region_id AS region_id, count(*) AS n_points
FROM pts p JOIN tris t
  ON ((({c1}) <= 0 AND ({c2}) <= 0 AND ({c3}) <= 0)
   OR (({c1}) >= 0 AND ({c2}) >= 0 AND ({c3}) >= 0))
GROUP BY 1
ORDER BY 1
"""


def pip_polygon_counts_sql() -> str:
    """Even-odd ray-cast PIP against the concave per-nation polygons —
    the exact integer crossing test mirrored from
    operators/spatial_join.ray_cast_inside, unrolled over the ring's 5
    edges (synthspec.POLYGON_OFFSETS)."""
    px = _E5.format(c="p.lon")
    py = _E5.format(c="p.lat")
    verts = [
        (f"g.vx{i}", f"g.vy{i}")
        for i in range(len(synthspec.POLYGON_OFFSETS) - 1)
    ]
    vert_cols = ", ".join(
        f"cast((lon_min + {dx}.0) * 100000 as bigint) AS vx{i}, "
        f"cast((lat_min + {dy}.0) * 100000 as bigint) AS vy{i}"
        for i, (dx, dy) in enumerate(synthspec.POLYGON_OFFSETS[:-1])
    )
    crossings = []
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        t = f"(({x2}-{x1})*(({py})-{y1}) - (({px})-{x1})*({y2}-{y1}))"
        crossings.append(
            f"(CASE WHEN (({y1} > ({py})) != ({y2} > ({py})))"
            f" AND ((({y2} > {y1}) AND {t} > 0)"
            f"   OR (({y2} < {y1}) AND {t} < 0)) THEN 1 ELSE 0 END)"
        )
    total = " + ".join(crossings)
    return f"""
WITH {points_cte()}, {boxes_cte()},
polys AS (SELECT region_id, {vert_cols} FROM boxes)
SELECT g.region_id AS region_id, count(*) AS n_points
FROM pts p JOIN polys g ON (({total}) % 2) = 1
GROUP BY 1
ORDER BY 1
"""


def knn_counts_sql() -> str:
    # doc_num is NOT unique (duplicate lineitem keys) — dedupe to
    # distinct points with multiplicity, rank per distinct point,
    # then weight the counts; a plain per-(doc,span) window would
    # silently collapse duplicates.
    hav = haversine_km_sql("p.lon", "p.lat", "c.c_lon", "c.c_lat")
    return f"""
WITH {points_cte()}, {centers_cte()},
pg AS (
    SELECT doc_num, span_pos, lon, lat, count(*) AS mult
    FROM pts GROUP BY 1, 2, 3, 4
),
ranked AS (
    SELECT p.mult, c.center_id,
           row_number() OVER (
               PARTITION BY p.doc_num, p.span_pos, p.lon, p.lat
               ORDER BY {hav} ASC, c.center_id ASC) AS rnk
    FROM pg p CROSS JOIN centers c
)
SELECT center_id, cast(sum(mult) as bigint) AS n_points
FROM ranked WHERE rnk = 1
GROUP BY 1
ORDER BY 1
"""


def hotspot_cell_share_sql(zoom: int) -> str:
    """Skew diagnostic: share of points in the top-10 cells (rounded)."""
    tid = tile_id_sql("lon", "lat", zoom)
    return f"""
WITH {points_cte()},
cells AS (
    SELECT {tid} AS tile_id, count(*) AS n FROM pts GROUP BY 1
),
top10 AS (
    SELECT n FROM cells ORDER BY n DESC, tile_id LIMIT 10
)
SELECT cast(round(cast((SELECT sum(n) FROM top10) as double)
       / (SELECT sum(n) FROM cells) * 1000000e0) as bigint) AS top10_share_e6
"""
