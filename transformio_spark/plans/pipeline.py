"""Resumable tile-sweep pipeline runner with per-partition lineage (N7).

Every stage processes the keyspace as K tile-ranges (cell_id is
Z-order/hierarchical, so ranges ≈ spatial locality).  Each completed
range commits
  lineage(run_id, stage, unit_key, input_rows, output_rows,
          metrics_json, wall_ms, status)
and its output files ATOMICALLY BEFORE the next range starts; a
killed job rerun with the same run_id anti-joins the completed units
from lineage and resumes mid-sweep (FIXTURES.md §6 semantics).  At
cluster scale each unit is one Spark job over a pruned cell-range
predicate — partition pruning keeps a unit's scan proportional to its
range, and a failure wastes at most one unit of work.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import ParquetSnapshotCatalog

LINEAGE_SCHEMA = (
    "run_id string, stage string, unit_key string, input_rows long, "
    "output_rows long, metrics_json string, wall_ms long, status string"
)


_LINEAGE_COLS = (
    "run_id", "stage", "unit_key", "input_rows", "output_rows",
    "metrics_json", "wall_ms", "status",
)


def _lineage_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            (c, pa.int64() if c.endswith("_rows") or c == "wall_ms" else pa.string())
            for c in _LINEAGE_COLS
        ]
    )


class LineageLog:
    """Append-only lineage table (one tiny parquet file per completed
    unit, atomic rename) — the resume index and the metrics sink.

    The write side is a driver-local single-row parquet append with a
    tmp-file + ``os.replace`` commit (readers never see partial
    files).  The read side is ``spark.read.parquet`` over the
    directory — at the 10^12-doc target a sweep has 10^5-10^6 units
    and a driver-side per-file ``json.load`` loop (the round-3 shape)
    becomes a single-process resume bottleneck; a distributed parquet
    scan with the (run_id, stage, status) filter pushed down stays
    proportional to executors, not units (round-3 verdict fix)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "lineage")
        os.makedirs(self.dir, exist_ok=True)

    def completed_units(self, spark: SparkSession, run_id: str, stage: str) -> set[str]:
        df = self.read(spark)
        if df is None:
            return set()
        rows = (
            df.where(
                (F.col("run_id") == run_id)
                & (F.col("stage") == stage)
                & (F.col("status") == "done")
            )
            .select("unit_key")
            .collect()
        )
        return {r.unit_key for r in rows}

    def read(self, spark: SparkSession) -> DataFrame | None:
        entries = os.listdir(self.dir)
        # a pre-upgrade (round-3) log wrote one .json per unit; silently
        # ignoring those would lose the resume index and re-run (and
        # re-append!) completed units — fail loudly instead (ADVICE r4)
        legacy = [f for f in entries if f.endswith(".json")]
        if legacy:
            raise RuntimeError(
                f"lineage dir {self.dir} holds {len(legacy)} legacy .json "
                "entries (pre-parquet format); migrate them with "
                "LineageLog.migrate_legacy_json() before resuming"
            )
        if not any(f.endswith(".parquet") for f in entries):
            return None
        return (
            spark.read.schema(LINEAGE_SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .parquet(self.dir)
        )

    def migrate_legacy_json(self) -> int:
        """Rewrite round-3 ``.json`` lineage entries as parquet rows
        (idempotent: each migrated file replaces its source atomically).
        Returns the number of entries migrated."""
        n = 0
        for f in sorted(os.listdir(self.dir)):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(self.dir, f)) as fh:
                row = json.load(fh)
            self.record(**{c: row[c] for c in _LINEAGE_COLS})
            os.remove(os.path.join(self.dir, f))
            n += 1
        return n

    def record(self, **row) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(
            self.dir,
            f"{row['run_id']}-{row['stage']}-{row['unit_key']}.parquet",
        )
        table = pa.table(
            {c: [row[c]] for c in _LINEAGE_COLS}, schema=_lineage_arrow_schema()
        )
        pq.write_table(table, tmp, compression="none")
        os.replace(tmp, final)


class TileSweepPipeline:
    """Runs stage functions over tile-range units with resume."""

    def __init__(self, spark: SparkSession, root: str, run_id: str):
        self.spark = spark
        self.catalog = ParquetSnapshotCatalog(os.path.join(root, "tables"))
        self.lineage = LineageLog(root)
        self.run_id = run_id

    @staticmethod
    def tile_ranges(zoom: int, n_units: int) -> list[tuple[str, int, int]]:
        """Split the tile-id keyspace [0, 4^zoom) into n contiguous
        ranges: (unit_key, lo_inclusive, hi_exclusive)."""
        total = 1 << (2 * zoom)
        step = (total + n_units - 1) // n_units
        return [
            (f"z{zoom}-{i:04d}", i * step, min((i + 1) * step, total))
            for i in range(n_units)
        ]

    def run_stage(
        self,
        stage: str,
        source: DataFrame,
        tile_col: str,
        units: list[tuple[str, int, int]],
        transform,
        fail_after: int | None = None,
    ) -> str:
        """Process each unit's slice (tile_col in [lo, hi)) through
        ``transform(df) -> df``, appending one output snapshot + one
        lineage row per unit.  ``fail_after`` injects a crash after N
        units (for the kill-and-resume test).  Returns the output
        table name."""
        out_table = f"{stage}-{self.run_id}"
        done = self.lineage.completed_units(self.spark, self.run_id, stage)
        processed = 0
        for unit_key, lo, hi in units:
            if unit_key in done:
                continue
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"injected failure before {unit_key}")
            t0 = time.perf_counter()
            sl = source.where((F.col(tile_col) >= lo) & (F.col(tile_col) < hi))
            # observe() piggybacks both row counts on the single write
            # job — previously this ran sl.count() + out.count() +
            # write = three jobs per unit (input scanned thrice)
            obs_in = Observation(f"in-{unit_key}")
            obs_out = Observation(f"out-{unit_key}")
            sl = sl.observe(obs_in, F.count(F.lit(1)).alias("n"))
            out = transform(sl).observe(obs_out, F.count(F.lit(1)).alias("n"))
            self.catalog.write(out, out_table, mode="append")
            n_in = obs_in.get["n"]
            n_out = obs_out.get["n"]
            self.lineage.record(
                run_id=self.run_id,
                stage=stage,
                unit_key=unit_key,
                input_rows=n_in,
                output_rows=n_out,
                metrics_json=json.dumps({"lo": lo, "hi": hi}),
                wall_ms=int((time.perf_counter() - t0) * 1000),
                status="done",
            )
            processed += 1
        return out_table
