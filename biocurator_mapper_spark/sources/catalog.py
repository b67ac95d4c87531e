"""Parquet-backed table catalog with atomic pointer swaps.

Prod target is Iceberg (ACID snapshot commits, `writeTo(...).createOrReplace`,
partition transforms); this sandbox has no Iceberg runtime jar, so the same
guarantees are provided at the interface level over parquet directories:

- every write lands in a fresh ``<table>/v_<n>`` directory;
- a tiny ``POINTER`` file names the live version and is replaced atomically
  (tmp file + ``os.replace`` — the exact mechanism the reference uses for its
  zero-downtime collection pointer swap, ``app/config_updater.py:36-93``);
- readers resolve the pointer first, so a half-written version is never
  visible (snapshot isolation per table);
- ``append`` tables (e.g. ``_metrics``/``_checkpoints`` commit logs) add
  parquet files under one directory — append-only, order-free.

Swapping this class for an Iceberg catalog changes no pipeline code: only
``write_replace/read/append`` call sites.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _pointer_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "POINTER")

    def write_replace(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> str:
        """Write a new version and atomically swap the pointer to it."""
        tdir = self._table_dir(table)
        os.makedirs(tdir, exist_ok=True)
        version = f"v_{uuid.uuid4().hex[:12]}"
        vdir = os.path.join(tdir, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(vdir)
        tmp = self._pointer_path(table) + f".tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path(table))
        return version

    def current_version(self, table: str) -> str | None:
        try:
            with open(self._pointer_path(table)) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return None

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    def read(self, table: str, version: str | None = None) -> DataFrame:
        """Read the live version, or time-travel to a named one (every
        ``write_replace`` keeps its immutable ``v_*`` directory until
        ``vacuum_table`` retires it — Iceberg snapshot-read semantics)."""
        if version is None:
            version = self.current_version(table)
        if version is None:
            raise FileNotFoundError(f"table {table} has no committed version")
        vdir = os.path.join(self._table_dir(table), version)
        if not os.path.isdir(vdir):
            raise FileNotFoundError(f"table {table} has no version {version}")
        return self.spark.read.parquet(vdir)

    def versions(self, table: str) -> list[str]:
        """All retained versions, oldest first (commit-time order)."""
        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        vs = [n for n in os.listdir(tdir) if n.startswith("v_")]
        return sorted(vs, key=lambda n: os.path.getmtime(os.path.join(tdir, n)))

    def vacuum_table(self, table: str, keep: int = 2) -> list[str]:
        """Retire all but the newest ``keep`` versions (never the live one).
        Returns removed version names."""
        import shutil

        live = self.current_version(table)
        vs = self.versions(table)
        removable = [v for v in vs[:-keep] if v != live] if keep > 0 else [
            v for v in vs if v != live
        ]
        for v in removable:
            shutil.rmtree(os.path.join(self._table_dir(table), v))
        return removable

    # ------------------------------------------------------------ append log
    def append(self, df: DataFrame, table: str) -> None:
        """Append-only commit log (metrics / checkpoints)."""
        df.write.mode("append").parquet(os.path.join(self._table_dir(table), "log"))

    def read_log(self, table: str) -> DataFrame | None:
        path = os.path.join(self._table_dir(table), "log")
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return None
