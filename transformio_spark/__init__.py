"""transformio_spark — a PySpark-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference ``karimbahgat/transformio``
(vendored read-only at /root/reference), re-expressed Spark-first:

- ``kernels``   — pure-numpy coordinate-transform + accuracy math,
                  importable without Spark, behavior-par with the
                  reference's transforms.py / accuracy.py.
- ``functions`` — JVM-side Column expression builders (Catalyst
                  codegen path): affine/polynomial transforms,
                  haversine, tile/cell encoding, text metrics.
- ``operators`` — DataFrame-level operators: span coordinate
                  extraction, broadcast + range-partitioned salted
                  spatial joins, kNN, dedup, ANN similarity, tiled
                  raster warp.
- ``sources``   — deterministic synthetic generators for the
                  interleaved-docs corpus + parquet-backed catalog
                  with snapshot/lineage (Iceberg-compatible layout).
- ``plans``     — SparkSession builder and the resumable pipeline
                  runner (per-partition lineage checkpointing).
"""

__version__ = "0.1.0"
