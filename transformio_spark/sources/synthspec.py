"""Deterministic derivation spec for the interleaved-docs corpus.

The BASELINE input is an Iceberg table
``docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json:input_hint).  The driver's testdata ships a flat
``documents`` table instead, so the engine derives the spans corpus
from it DETERMINISTICALLY — pure integer arithmetic on ``doc_id``, no
RNG state — which makes the exact same derivation expressible in
Spark (DataFrame API, sources/synth.py) and in DuckDB SQL
(sources/oracle.py).  The correctness gate then compares a true
end-to-end pipeline on both engines.

Numeric-safety invariants (these make floor/round decisions agree
between JVM-Spark and DuckDB bit-for-bit):

- all longitudes/latitudes live on a 1e-4-degree grid derived from
  integer arithmetic (u/10000.0 - 180.0), so printed ``%.4f`` media
  payloads round-trip losslessly;
- pixel payloads live on a 1e-2 grid linked to geo by the exact
  dyadic affine  lon = px_col/100 - 180,  lat = px_row/100 - 85;
- coordinates decoded via a FITTED transform are snapped back to the
  4-decimal payload grid before tiling (media_ref precision defines
  coordinate precision), so ~1e-12 fit noise can never flip a tile
  floor.

Skew (FIXTURES.md §1): 20% of docs (doc_id %% 5 == 0) are drawn from
a Zipf(s=1.3) mixture over 10 city centers with ±0.05° jitter — a
handful of tiles hold a large share of rows, exercising the explicit
salting join path.
"""

from __future__ import annotations

# primary coordinate lattice
LON_MULT = 7919
LON_MOD = 3_600_000  # lon = u/10000 - 180  (1e-4 grid)
LAT_MULT = 104_729
LAT_MOD = 1_700_000  # lat = v/10000 - 85

# secondary media span (present when doc_id % 3 == 2)
LON2_MULT = 15_485_863
LON2_ADD = 32_452_843
LAT2_MULT = 86_028_121
LAT2_ADD = 49_979_687

# hotspot mixture
HOT_EVERY = 5          # doc_id % 5 == 0 → hotspot doc (20%)
ZIPF_S = 1.3
ZIPF_MOD = 997
PX_EVERY_MOD = 10      # doc_id % 10 in {3,6,9} → px payload (30%)
PX_REMAINDERS = (3, 6, 9)

# (dlon, dlat) vertex offsets from (lon_min, lat_min) of the concave
# per-nation test polygon — CLOSED ring, e5-lattice vertices.  The
# notch at (+36, +14) between the two +28 top corners makes it
# genuinely non-convex, so the even-odd ray-cast (not a convex sign
# test) is required.
POLYGON_OFFSETS = [(6, 6), (66, 6), (66, 28), (36, 14), (6, 28), (6, 6)]

# 10 city centers, exactly 4 decimals (stay on the coordinate grid)
CITIES = [
    (139.6917, 35.6895),   # Tokyo
    (77.1025, 28.7041),    # Delhi
    (121.4737, 31.2304),   # Shanghai
    (-46.6333, -23.5505),  # Sao Paulo
    (-99.1332, 19.4326),   # Mexico City
    (31.2357, 30.0444),    # Cairo
    (72.8777, 19.0760),    # Mumbai
    (116.4074, 39.9042),   # Beijing
    (90.4125, 23.8103),    # Dhaka
    (135.5022, 34.6937),   # Osaka
]

# the exact pixel→geo affine linking px payloads to geo space
# (dyadic scale 0.01 → every arithmetic step is exact)
PX_AFFINE = [[0.01, 0.0, -180.0], [0.0, 0.01, -85.0], [0.0, 0.0, 1.0]]


def zipf_thresholds(n: int = 10, s: float = ZIPF_S, mod: int = ZIPF_MOD) -> list[int]:
    """Cumulative integer thresholds on (doc_id % mod) implementing a
    Zipf(s) choice over n cities; returned as exclusive upper bounds."""
    weights = [1.0 / (k ** s) for k in range(1, n + 1)]
    total = sum(weights)
    acc, out = 0.0, []
    for w in weights:
        acc += w / total
        out.append(int(round(acc * mod)))
    out[-1] = mod
    return out


ZIPF_THRESHOLDS = zipf_thresholds()


def city_case_sql(doc_id: str = "doc_id") -> tuple[str, str]:
    """CASE expressions choosing the hotspot city lon/lat from
    (doc_id %% ZIPF_MOD) — same text works in Spark SQL and DuckDB."""
    # NOTE: float literals use exponent form (…e0) everywhere in shared
    # SQL text — plain decimal literals parse as DECIMAL in both Spark
    # and DuckDB, with engine-specific precision rules; exponent
    # literals are DOUBLE in both.
    m = f"({doc_id} % {ZIPF_MOD})"
    lon_parts, lat_parts = [], []
    for i, th in enumerate(ZIPF_THRESHOLDS):
        lon_parts.append(f"WHEN {m} < {th} THEN {CITIES[i][0]!r}e0")
        lat_parts.append(f"WHEN {m} < {th} THEN {CITIES[i][1]!r}e0")
    return (
        "CASE " + " ".join(lon_parts) + " END",
        "CASE " + " ".join(lat_parts) + " END",
    )


def point_exprs_sql(doc_id: str = "doc_id") -> dict[str, str]:
    """The full coordinate derivation as SQL expression strings keyed
    by column name.  Shared verbatim by the Spark synth (via
    selectExpr) and the DuckDB oracle — one source of truth."""
    u = f"(({doc_id} * {LON_MULT}) % {LON_MOD})"
    v = f"(({doc_id} * {LAT_MULT}) % {LAT_MOD})"
    city_lon, city_lat = city_case_sql(doc_id)
    is_hot = f"({doc_id} % {HOT_EVERY} = 0)"
    base_lon = (
        f"CASE WHEN {is_hot} THEN ({city_lon}) + (({u} % 1000) - 500) / 10000e0 "
        f"ELSE {u} / 10000e0 - 180e0 END"
    )
    base_lat = (
        f"CASE WHEN {is_hot} THEN ({city_lat}) + (({v} % 1000) - 500) / 10000e0 "
        f"ELSE {v} / 10000e0 - 85e0 END"
    )
    u2 = f"(({doc_id} * {LON2_MULT} + {LON2_ADD}) % {LON_MOD})"
    v2 = f"(({doc_id} * {LAT2_MULT} + {LAT2_ADD}) % {LAT_MOD})"
    px_rem = ", ".join(str(r) for r in PX_REMAINDERS)
    return {
        "lon": base_lon,
        "lat": base_lat,
        "is_px": f"({doc_id} % {PX_EVERY_MOD}) IN ({px_rem})",
        "px_col": f"(({base_lon}) + 180e0) * 100e0",
        "px_row": f"(({base_lat}) + 85e0) * 100e0",
        "has_second": f"({doc_id} % 3 = 2)",
        "lon2": f"{u2} / 10000e0 - 180e0",
        "lat2": f"{v2} / 10000e0 - 85e0",
        "n_text_extra": f"({doc_id} % 3)",
    }


# GCPs linking pixel space to geo space under PX_AFFINE — exact grid
# corner/midpoint pairs (noise-free: the fitted affine recovers
# PX_AFFINE to ~1e-13, and decoded coords are snapped to the payload
# grid anyway).
GCPS_PX_GEO = [
    (0.0, 0.0, -180.0, -85.0),
    (36000.0, 0.0, 180.0, -85.0),
    (0.0, 17000.0, -180.0, 85.0),
    (36000.0, 17000.0, 180.0, 85.0),
    (18000.0, 8500.0, 0.0, 0.0),
    (9000.0, 4250.0, -90.0, -42.5),
    (27000.0, 12750.0, 90.0, 42.5),
    (18000.0, 17000.0, 0.0, 85.0),
]
