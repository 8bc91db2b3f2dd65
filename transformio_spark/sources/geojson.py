"""GeoJSON file connector.

The reference consumes GeoJSON dicts (vector.py, tests/data/*.geojson);
the engine's distributed equivalents:

- ``read_geojson``: FeatureCollection files → the exploded long point
  table (geom_id, part_id, ring_id, pt_seq, x, y) + a properties table.
  Files parse inside mapInPandas (one file per input row via wholetext
  — GeoJSON is a document format; at scale you'd land it to parquet
  once and keep the long table as the working layout).
- ``to_feature_json``: re-nested geometries → GeoJSON Feature strings
  (a Column expression building JSON via to_json of structs is not
  possible for ragged coordinate nesting, so assembly is a tiny
  per-row UDF over already-renested arrays).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LONG_SCHEMA = (
    "geom_id string, geom_type string, part_id int, ring_id int, "
    "pt_seq int, x double, y double"
)
PROPS_SCHEMA = "geom_id string, properties_json string"


def _geometry_parts(geom: dict) -> list:
    gtype = geom["type"]
    coords = geom["coordinates"]
    if gtype == "Point":
        return [[[coords]]]
    if gtype in ("MultiPoint", "LineString"):
        return [[coords]]
    if gtype in ("MultiLineString", "Polygon"):
        return [coords]
    if gtype == "MultiPolygon":
        return coords
    raise ValueError(f"unsupported geometry type: {gtype}")


def read_geojson(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse FeatureCollection file(s) at ``path`` into (points_long,
    properties) DataFrames.  geom_id = '<file_row>#<feature_index>'."""
    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "geom_id", "geom_type", "part_id", "ring_id", "pt_seq", "x", "y"
            )}
            for doc_i, text in enumerate(pdf["value"]):
                fc = json.loads(text)
                feats = (
                    fc["features"] if fc.get("type") == "FeatureCollection"
                    else [fc]
                )
                for fi, feat in enumerate(feats):
                    geom = feat.get("geometry", feat)
                    gid = f"{doc_i}#{fi}"
                    for pi, part in enumerate(_geometry_parts(geom)):
                        for ri, ring in enumerate(part):
                            for si, pt in enumerate(ring):
                                out["geom_id"].append(gid)
                                out["geom_type"].append(geom["type"])
                                out["part_id"].append(pi)
                                out["ring_id"].append(ri)
                                out["pt_seq"].append(si)
                                out["x"].append(float(pt[0]))
                                out["y"].append(float(pt[1]))
            yield pd.DataFrame(out)

    def parse_props(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"geom_id": [], "properties_json": []}
            for doc_i, text in enumerate(pdf["value"]):
                fc = json.loads(text)
                feats = (
                    fc["features"] if fc.get("type") == "FeatureCollection"
                    else [fc]
                )
                for fi, feat in enumerate(feats):
                    out["geom_id"].append(f"{doc_i}#{fi}")
                    out["properties_json"].append(
                        json.dumps(feat.get("properties", {}), sort_keys=True)
                    )
            yield pd.DataFrame(out)

    return raw.mapInPandas(parse, LONG_SCHEMA), raw.mapInPandas(
        parse_props, PROPS_SCHEMA
    )


def to_feature_json(nested: DataFrame, geom_type_map: dict[str, str]) -> DataFrame:
    """(geom_id, parts) renested rows → (geom_id, feature_json)."""

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"geom_id": [], "feature_json": []}
            # raw column arrays, not pdf.iterrows() (Series-per-row)
            for gid, row_parts in zip(
                pdf["geom_id"].to_numpy(), pdf["parts"].to_numpy()
            ):
                gtype = geom_type_map[gid]
                parts = [
                    [[[p["x"], p["y"]] for p in ring] for ring in part]
                    for part in row_parts
                ]
                if gtype == "Point":
                    coords = parts[0][0][0]
                elif gtype in ("MultiPoint", "LineString"):
                    coords = parts[0][0]
                elif gtype in ("MultiLineString", "Polygon"):
                    coords = parts[0]
                else:
                    coords = parts
                feat = {
                    "type": "Feature",
                    "properties": {},
                    "geometry": {"type": gtype, "coordinates": coords},
                }
                out["geom_id"].append(gid)
                out["feature_json"].append(json.dumps(feat))
            yield pd.DataFrame(out)

    return nested.mapInPandas(assemble, "geom_id string, feature_json string")
