"""Snapshot-pointer parquet table with MERGE semantics.

The sandbox has no Iceberg runtime jar, so this module emulates the three
MERGE shapes the engine needs on plain parquet. On a real cluster each
method is one Iceberg statement (noted per method); the call sites don't
change. Snapshot isolation: every write lands in a fresh
``snapshots/<n>`` directory and a tiny ``LATEST`` pointer file flips last,
so readers never observe a half-written table and failed writes are
invisible (the reference gets this for free from SQLite transactions,
db/__init__.py:110-116).

Reference sinks emulated:
- K1 insert-or-ignore (first-write-wins)  db/__init__.py:67-123
- K2/K3 upsert (last-write-wins)          db/data_dms.py:293-327,
                                          db/data_sync.py:151-166
- K5 schema evolution (new columns added on write)
                                          db/data_dms.py:403-426
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class ParquetMergeTable:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        self._snap_dir = os.path.join(path, "snapshots")
        self._pointer = os.path.join(path, "LATEST")

    # -- snapshot bookkeeping -------------------------------------------------

    def _latest_id(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self) -> bool:
        return self._latest_id() is not None

    def read(self) -> DataFrame | None:
        sid = self._latest_id()
        if sid is None:
            return None
        return self.spark.read.parquet(os.path.join(self._snap_dir, f"{sid:06d}"))

    def _commit(self, df: DataFrame) -> None:
        sid = (self._latest_id() or 0) + 1
        out = os.path.join(self._snap_dir, f"{sid:06d}")
        df.write.mode("overwrite").parquet(out)
        os.makedirs(self.path, exist_ok=True)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, self._pointer)  # atomic pointer flip

    # -- MERGE shapes ---------------------------------------------------------

    @staticmethod
    def _align(cur: DataFrame, upd: DataFrame) -> tuple[DataFrame, DataFrame]:
        """K5 schema evolution: output schema = union of columns; absent
        values '' (the reference's ALTER TABLE ADD COLUMN + TEXT-only
        types, db/data_dms.py:369-400)."""
        for c in upd.columns:
            if c not in cur.columns:
                cur = cur.withColumn(c, F.lit(""))
        for c in cur.columns:
            if c not in upd.columns:
                upd = upd.withColumn(c, F.lit(""))
        return cur, upd.select(cur.columns)

    def overwrite(self, df: DataFrame) -> None:
        self._commit(df)

    def insert_ignore(self, updates: DataFrame, keys: list[str]) -> None:
        """Iceberg: MERGE INTO ... WHEN NOT MATCHED THEN INSERT.

        Also dedups within the batch (first wins by arbitrary-but-stable
        key order is NOT assumed — callers pre-dedup when order matters)."""
        updates = updates.dropDuplicates(keys)
        cur = self.read()
        if cur is None:
            self._commit(updates)
            return
        cur, updates = self._align(cur, updates)
        fresh = updates.join(cur.select(keys).dropDuplicates(keys), on=keys, how="left_anti")
        self._commit(cur.unionByName(fresh))

    def upsert(self, updates: DataFrame, keys: list[str]) -> None:
        """Iceberg: MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
        INSERT (last-write-wins on the key)."""
        updates = updates.dropDuplicates(keys)
        cur = self.read()
        if cur is None:
            self._commit(updates)
            return
        cur, updates = self._align(cur, updates)
        kept = cur.join(updates.select(keys).dropDuplicates(keys), on=keys, how="left_anti")
        self._commit(kept.unionByName(updates))

    def append(self, updates: DataFrame) -> None:
        cur = self.read()
        if cur is None:
            self._commit(updates)
            return
        cur, updates = self._align(cur, updates)
        self._commit(cur.unionByName(updates))

    # -- retention (K7) ---------------------------------------------------------

    def snapshot_ids(self) -> list[int]:
        try:
            return sorted(int(d) for d in os.listdir(self._snap_dir) if d.isdigit())
        except FileNotFoundError:
            return []

    def expire_snapshots(self, keep_n: int = 2) -> list[int]:
        """K7 retention: delete all but the newest ``keep_n`` snapshots
        and never the one LATEST points to. Iceberg:
        ``CALL system.expire_snapshots(table, retain_last => keep_n)``.

        Reference analog: social_ocr.py:31-53 prunes collected artifacts
        older than the retention window; here expiry is metadata-only —
        readers pinned to LATEST are unaffected (snapshot isolation), and
        a crash mid-expiry just leaves extra directories for the next run.
        Returns the expired snapshot ids."""
        import shutil

        keep_n = max(1, keep_n)
        latest = self._latest_id()
        ids = self.snapshot_ids()
        keep = set(ids[-keep_n:])
        if latest is not None:
            keep.add(latest)
        expired = [i for i in ids if i not in keep]
        for i in expired:
            shutil.rmtree(os.path.join(self._snap_dir, f"{i:06d}"), ignore_errors=True)
        return expired
