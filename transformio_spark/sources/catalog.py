"""Snapshot table catalog over parquet directories.

The engine's design target is Iceberg (BASELINE.json: "Iceberg
tables", "checkpoints ... to Iceberg"); no Iceberg runtime jar ships
in this sandbox, so the catalog abstracts the three Iceberg behaviors
the engine relies on — atomic snapshot commits, append-only lineage,
and reading a consistent snapshot — over plain parquet directories
with an atomically-renamed manifest.  The call surface is
deliberately Iceberg-shaped: on a cluster with
``org.apache.iceberg.spark.SparkCatalog`` configured, ``IcebergCatalog``
(same interface, ``spark.table``/``writeTo`` underneath) slots in and
nothing downstream changes.

Layout:  <root>/<table>/snap-<NNNN>/part-*.parquet
         <root>/<table>/MANIFEST.json   (atomic rename commit)
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetSnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "MANIFEST.json")

    def _manifest(self, name: str) -> dict:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return {"snapshots": [], "current": None}
        with open(p) as f:
            return json.load(f)

    def _commit(self, name: str, manifest: dict) -> None:
        tmp = self._manifest_path(name) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(name))  # atomic commit

    def exists(self, name: str) -> bool:
        return self._manifest(name)["current"] is not None

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> str:
        """Write a new snapshot and atomically commit it.  ``append``
        makes the new snapshot = previous files + new files (Iceberg
        append-snapshot semantics) without rewriting old data."""
        man = self._manifest(name)
        snap_id = len(man["snapshots"])
        snap_dir = os.path.join(self._tdir(name), f"snap-{snap_id:05d}")
        df.write.mode("overwrite").parquet(snap_dir)
        files = [snap_dir]
        if mode == "append" and man["current"] is not None:
            files = man["snapshots"][man["current"]]["files"] + files
        man["snapshots"].append(
            {"id": snap_id, "files": files, "ts": time.time(), "mode": mode}
        )
        man["current"] = snap_id
        self._commit(name, man)
        return snap_dir

    def read(self, spark: SparkSession, name: str, snapshot: int | None = None) -> DataFrame:
        man = self._manifest(name)
        idx = man["current"] if snapshot is None else snapshot
        if idx is None:
            raise FileNotFoundError(f"table {name} has no snapshot")
        return spark.read.parquet(*man["snapshots"][idx]["files"])

    def snapshots(self, name: str) -> list[dict]:
        return self._manifest(name)["snapshots"]

    def rollback(self, name: str, snapshot: int) -> None:
        """Roll the table back to an earlier snapshot — Iceberg-style:
        the rollback is itself a NEW snapshot entry referencing the
        old file set (history is never rewritten; a later reader of
        the log sees the rollback as an event)."""
        man = self._manifest(name)
        if not (0 <= snapshot < len(man["snapshots"])):
            raise ValueError(f"no snapshot {snapshot} in table {name}")
        src = man["snapshots"][snapshot]
        man["snapshots"].append(
            {
                "id": len(man["snapshots"]),
                "files": list(src["files"]),
                "ts": time.time(),
                "mode": f"rollback-to-{snapshot}",
            }
        )
        man["current"] = man["snapshots"][-1]["id"]
        self._commit(name, man)

    def read_incremental(
        self,
        spark: SparkSession,
        name: str,
        from_snapshot: int,
        to_snapshot: int | None = None,
    ) -> DataFrame:
        """Rows ADDED after ``from_snapshot`` up to ``to_snapshot``
        (default current) — the Iceberg incremental-scan shape a
        resumed sweep or downstream CDC consumer reads, proportional
        to the delta instead of the table.

        Valid only over APPEND-ONLY snapshot ranges: an intervening
        overwrite/rollback snapshot rewrites the file set, so a
        file-set difference would return pre-existing rows as "added"
        (Iceberg's own incremental scan raises on non-append
        snapshots the same way) — such ranges raise ValueError
        (ADVICE r4)."""
        man = self._manifest(name)
        to_idx = man["current"] if to_snapshot is None else to_snapshot
        if to_idx is None:
            raise FileNotFoundError(f"table {name} has no snapshot")
        if not (0 <= from_snapshot < len(man["snapshots"])):
            raise ValueError(f"no snapshot {from_snapshot} in table {name}")
        if not (from_snapshot <= to_idx < len(man["snapshots"])):
            raise ValueError(
                f"invalid snapshot range ({from_snapshot}, {to_idx}] in table {name}"
            )
        non_append = [
            s["id"] for s in man["snapshots"][from_snapshot + 1 : to_idx + 1]
            if s["mode"] != "append"
        ]
        if non_append:
            raise ValueError(
                f"incremental read over ({from_snapshot}, {to_idx}] of table "
                f"{name} crosses non-append snapshots {non_append}; "
                "incremental scans are defined only for append-only ranges"
            )
        base = set(man["snapshots"][from_snapshot]["files"])
        delta = [
            f for f in man["snapshots"][to_idx]["files"] if f not in base
        ]
        if not delta:
            return spark.read.parquet(
                *man["snapshots"][to_idx]["files"]
            ).limit(0)
        return spark.read.parquet(*delta)


class IcebergCatalog:
    """The same call surface as :class:`ParquetSnapshotCatalog`, backed
    by a real Iceberg catalog (``org.apache.iceberg.spark.SparkCatalog``
    configured on the session; the runtime jar is not present in this
    sandbox, so these paths are exercised there only via the shared
    interface-conformance tests' contract on the parquet stand-in).

    Snapshot addressing: the parquet catalog uses dense ordinals
    (0, 1, 2, ...); Iceberg uses sparse ``snapshot_id`` longs.  This
    adapter preserves the ordinal API — ordinal *i* is the *i*-th entry
    of ``<table>.snapshots`` ordered by ``committed_at`` — so pipeline
    code is portable between the two."""

    def __init__(self, spark: SparkSession, catalog: str = "spark_catalog",
                 namespace: str = "default"):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def _qual(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _snaps(self, name: str) -> list[dict]:
        rows = (
            self.spark.table(f"{self._qual(name)}.snapshots")
            .orderBy("committed_at")
            .collect()
        )
        return [
            {
                "id": i,
                "snapshot_id": r.snapshot_id,
                "ts": r.committed_at.timestamp(),
                "mode": r.operation,  # append / overwrite / replace
            }
            for i, r in enumerate(rows)
        ]

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._qual(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> str:
        w = df.writeTo(self._qual(name))
        if not self.exists(name):
            w.using("iceberg").create()
        elif mode == "append":
            w.append()
        else:
            w.overwritePartitions() if mode == "overwrite_partitions" else w.replace()
        return self._qual(name)

    def read(self, spark: SparkSession, name: str,
             snapshot: int | None = None) -> DataFrame:
        if snapshot is None:
            return spark.table(self._qual(name))
        snaps = self._snaps(name)
        if not (0 <= snapshot < len(snaps)):
            raise ValueError(f"no snapshot {snapshot} in table {name}")
        return (
            spark.read.option("snapshot-id", snaps[snapshot]["snapshot_id"])
            .table(self._qual(name))
        )

    def snapshots(self, name: str) -> list[dict]:
        return self._snaps(name)

    def rollback(self, name: str, snapshot: int) -> None:
        snaps = self._snaps(name)
        if not (0 <= snapshot < len(snaps)):
            raise ValueError(f"no snapshot {snapshot} in table {name}")
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot"
            f"('{self.namespace}.{name}', {snaps[snapshot]['snapshot_id']})"
        )

    def read_incremental(
        self,
        spark: SparkSession,
        name: str,
        from_snapshot: int,
        to_snapshot: int | None = None,
    ) -> DataFrame:
        """Iceberg native incremental scan (append-only ranges; Iceberg
        itself raises on overwrite snapshots in range, matching the
        parquet catalog's ValueError contract)."""
        snaps = self._snaps(name)
        if not (0 <= from_snapshot < len(snaps)):
            raise ValueError(f"no snapshot {from_snapshot} in table {name}")
        to_idx = len(snaps) - 1 if to_snapshot is None else to_snapshot
        if not (from_snapshot <= to_idx < len(snaps)):
            raise ValueError(
                f"invalid snapshot range ({from_snapshot}, {to_idx}] in table {name}"
            )
        non_append = [
            s["id"] for s in snaps[from_snapshot + 1 : to_idx + 1]
            if s["mode"] != "append"
        ]
        if non_append:
            raise ValueError(
                f"incremental read over ({from_snapshot}, {to_idx}] of table "
                f"{name} crosses non-append snapshots {non_append}; "
                "incremental scans are defined only for append-only ranges"
            )
        return (
            spark.read
            .option("start-snapshot-id", snaps[from_snapshot]["snapshot_id"])
            .option("end-snapshot-id", snaps[to_idx]["snapshot_id"])
            .table(self._qual(name))
        )
