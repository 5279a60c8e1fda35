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


class BucketedMergeTable(ParquetMergeTable):
    """Copy-on-write MERGE at hash-bucket granularity — the scale path.

    ``ParquetMergeTable`` rewrites the WHOLE table per merge (fine as a
    semantics spec, fatal at 10^12 rows). This variant partitions every
    snapshot by ``pmod(xxhash64(keys), n_buckets)`` and a merge:

    1. computes the update batch's touched buckets (a bounded
       ``<= n_buckets`` driver-side list — metadata, not data),
    2. reads ONLY those bucket partitions of the current snapshot
       (partition pruning: the merge's read cost is proportional to the
       touched data, not the table),
    3. writes ONLY those buckets into the new snapshot directory, and
    4. hard-links every untouched bucket's parquet files from the
       previous snapshot (file-level reuse, no data copied or moved).

    This is exactly what Iceberg's copy-on-write ``MERGE INTO`` does —
    rewrite affected files, carry unaffected files forward in the new
    snapshot's manifest — with the directory tree standing in for the
    manifest. Snapshot isolation is unchanged (fresh directory + atomic
    ``LATEST`` pointer flip; hard-linked files survive
    ``expire_snapshots`` of either endpoint because deletion only unlinks
    one name). On a real cluster each method is still the single Iceberg
    statement noted on the parent; the bucket count maps to
    ``PARTITIONED BY (bucket(n_buckets, keys...))``.

    Merge keys are pinned at table construction (they define the
    physical layout, as in Iceberg); ``n_buckets`` is pinned by the first
    commit via a ``BUCKETS`` file so reopening is layout-stable.

    Reference parity: same K1/K2/K3 first/last-write-wins semantics as
    the parent (db/__init__.py:67-123, db/data_dms.py:293-327); the
    reference's SQLite upserts are row-level in one file — bucketed
    copy-on-write is the distributed re-expression.
    """

    BUCKET_COL = "_mt_bucket"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        n_buckets: int = 64,
    ) -> None:
        super().__init__(spark, path)
        self.keys = list(keys)
        self._buckets_file = os.path.join(path, "BUCKETS")
        try:
            with open(self._buckets_file) as f:
                self.n_buckets = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            self.n_buckets = n_buckets

    # -- layout helpers -------------------------------------------------------

    def _bucket_expr(self, cols: list | None = None):
        cols = cols if cols is not None else [F.col(k) for k in self.keys]
        return F.pmod(
            F.xxhash64(*[c.cast("string") for c in cols]), F.lit(self.n_buckets)
        ).cast("int")

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.BUCKET_COL, self._bucket_expr())

    def _read_raw(self) -> DataFrame | None:
        """Current snapshot WITH the bucket partition column."""
        return super().read()

    def read(self) -> DataFrame | None:
        df = self._read_raw()
        return None if df is None else df.drop(self.BUCKET_COL)

    def lookup(self, **key_values) -> DataFrame:
        """Point read by full key: the bucket predicate folds to a literal,
        so the scan prunes to ONE partition of ``n_buckets`` (assert
        PartitionFilters in the plan) — the emulated form of Iceberg's
        bucket-transform partition pruning."""
        df = self._read_raw()
        if df is None:
            raise FileNotFoundError(f"no snapshot at {self.path}")
        # type the literal as the stored column before hashing: stored
        # buckets hash col.cast('string'), and Spark's string cast differs
        # from Python str() for bool ('true' vs 'True'), floats and
        # timestamps — a str()-hashed literal would prune to the WRONG
        # bucket and silently return zero rows (ADVICE r3)
        dtypes = {f.name: f.dataType for f in df.schema.fields}
        target = self._bucket_expr(
            [F.lit(key_values[k]).cast(dtypes[k]) for k in self.keys]
        )
        df = df.where(F.col(self.BUCKET_COL) == target)
        for k, v in key_values.items():
            df = df.where(F.col(k) == v)
        return df.drop(self.BUCKET_COL)

    # -- copy-on-write commit -------------------------------------------------

    def _commit_buckets(
        self, merged: DataFrame, touched: set[int], prev_sid: int | None
    ) -> None:
        """Write ``merged`` (touched buckets only, bucket column present)
        as the new snapshot; hard-link every other bucket's files from
        the previous snapshot."""
        sid = (self._latest_id() or 0) + 1
        out = os.path.join(self._snap_dir, f"{sid:06d}")
        # align tasks with buckets before partitionBy: without this every
        # task writes one file PER bucket it holds (tasks x buckets tiny
        # files — measured 10x slower than the flat rewrite at 256
        # buckets); after it each bucket is one file written by one task.
        # mode('overwrite'): a crash between this write and the LATEST
        # pointer flip leaves a stale snapshots/<sid> that the next merge
        # recomputes — errorifexists would wedge the table permanently
        # (ADVICE r3). Overwrite only unlinks the NEW directory's names;
        # hard-linked files in older snapshots keep their own links.
        merged.repartition(F.col(self.BUCKET_COL)).write.mode(
            "overwrite"
        ).partitionBy(self.BUCKET_COL).parquet(out)
        if prev_sid is not None:
            prev = os.path.join(self._snap_dir, f"{prev_sid:06d}")
            for d in os.listdir(prev):
                if not d.startswith(f"{self.BUCKET_COL}="):
                    continue
                if int(d.split("=", 1)[1]) in touched:
                    continue
                os.makedirs(os.path.join(out, d), exist_ok=True)
                for fn in os.listdir(os.path.join(prev, d)):
                    if fn.endswith(".parquet"):
                        os.link(os.path.join(prev, d, fn), os.path.join(out, d, fn))
        os.makedirs(self.path, exist_ok=True)
        if not os.path.exists(self._buckets_file):
            with open(self._buckets_file, "w") as f:
                f.write(str(self.n_buckets))
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, self._pointer)  # atomic pointer flip

    def _touched(self, updates_b: DataFrame) -> set[int]:
        # bounded by n_buckets: metadata-sized driver collect by design
        return {
            r[0] for r in updates_b.select(self.BUCKET_COL).distinct().collect()
        }

    def _merge(self, updates: DataFrame, updates_win: bool) -> None:
        updates = updates.dropDuplicates(self.keys)
        prev = self._latest_id()
        if prev is None:
            self._commit_buckets(self._with_bucket(updates), set(), None)
            return
        cur = self._read_raw()
        if set(cur.columns) - {self.BUCKET_COL} != set(updates.columns):
            # K5 schema evolution changes every file's schema — fall back
            # to a full rewrite for this (rare) merge, like Iceberg's
            # non-metadata-compatible type changes. Layout is preserved.
            cur_flat, updates = self._align(cur.drop(self.BUCKET_COL), updates)
            if updates_win:
                kept = cur_flat.join(
                    updates.select(self.keys).dropDuplicates(self.keys),
                    on=self.keys,
                    how="left_anti",
                )
                merged = kept.unionByName(updates)
            else:
                fresh = updates.join(
                    cur_flat.select(self.keys).dropDuplicates(self.keys),
                    on=self.keys,
                    how="left_anti",
                )
                merged = cur_flat.unionByName(fresh)
            self._commit_buckets(
                self._with_bucket(merged), set(range(self.n_buckets)), prev
            )
            return
        updates_b = self._with_bucket(updates)
        touched = self._touched(updates_b)
        if len(touched) >= max(1, self.n_buckets // 2):
            # Scattered batch: hash bucketing spreads ANY large key set
            # near-uniformly, so copy-on-write degrades to ~full rewrite —
            # skip the pruned-read + per-bucket link machinery and rewrite
            # all buckets in one job (Iceberg has the same property; the
            # production answer for large scattered batches is
            # merge-on-read, out of scope for the stand-in).
            touched = set(range(self.n_buckets))
        # partition-pruned read: only the touched buckets are scanned
        cur_t = cur.where(F.col(self.BUCKET_COL).isin(sorted(touched)))
        if updates_win:
            kept = cur_t.join(
                updates_b.select(self.keys).dropDuplicates(self.keys),
                on=self.keys,
                how="left_anti",
            )
            merged = kept.unionByName(updates_b.select(kept.columns))
        else:
            fresh = updates_b.join(
                cur_t.select(self.keys).dropDuplicates(self.keys),
                on=self.keys,
                how="left_anti",
            )
            merged = cur_t.unionByName(fresh.select(cur_t.columns))
        self._commit_buckets(merged, touched, prev)

    # -- MERGE shapes (same semantics/statements as the parent) ---------------

    def insert_ignore(self, updates: DataFrame, keys: list[str] | None = None) -> None:
        if keys is not None and list(keys) != self.keys:
            raise ValueError(f"table is bucketed by {self.keys}, got {keys}")
        self._merge(updates, updates_win=False)

    def upsert(self, updates: DataFrame, keys: list[str] | None = None) -> None:
        if keys is not None and list(keys) != self.keys:
            raise ValueError(f"table is bucketed by {self.keys}, got {keys}")
        self._merge(updates, updates_win=True)

    def append(self, updates: DataFrame) -> None:
        prev = self._latest_id()
        if prev is None:
            self._commit_buckets(self._with_bucket(updates), set(), None)
            return
        cur = self._read_raw()
        if set(cur.columns) - {self.BUCKET_COL} != set(updates.columns):
            cur_flat, updates = self._align(cur.drop(self.BUCKET_COL), updates)
            self._commit_buckets(
                self._with_bucket(cur_flat.unionByName(updates)),
                set(range(self.n_buckets)),
                prev,
            )
            return
        updates_b = self._with_bucket(updates)
        touched = self._touched(updates_b)
        if len(touched) >= max(1, self.n_buckets // 2):
            touched = set(range(self.n_buckets))  # scattered: see _merge
        cur_t = cur.where(F.col(self.BUCKET_COL).isin(sorted(touched)))
        self._commit_buckets(
            cur_t.unionByName(updates_b.select(cur_t.columns)), touched, prev
        )

    def overwrite(self, df: DataFrame) -> None:
        self._commit_buckets(
            self._with_bucket(df), set(range(self.n_buckets)), self._latest_id()
        )
