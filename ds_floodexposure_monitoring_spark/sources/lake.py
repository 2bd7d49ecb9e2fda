"""Iceberg-semantics lake table over parquet + JSON snapshot metadata.

No Iceberg/Delta jars are installable in this environment (SURVEY.md
env facts), so the table format is implemented from scratch with the
same *semantics*, behind a narrow interface a real Iceberg catalog could
replace:

- **Snapshots**: ``metadata/v%08d.json`` lists every data file with
  per-file row counts and min/max merge-key stats (Iceberg manifest
  analog). ``metadata/HEAD`` names the current version.
- **Atomic commit**: write-new-then-``os.replace`` of HEAD — atomic on
  POSIX; single-writer assumption documented (Iceberg uses a catalog
  CAS for the same purpose).
- **Schema evolution**: each snapshot carries the full schema history;
  each data file is tagged with the schema version it was written
  under. Scans read per-version file groups and align them to the
  current schema (add-column → null, widen → cast) — schema-on-read,
  old files never rewritten.
- **Time travel**: ``scan(version=k)`` reads snapshot k's file list
  with snapshot k's schema.
- **Bucketed layout**: data files live in ``data/.../b=<bucket>`` where
  ``bucket = pmod(xxhash64(key_0), n_buckets)``. MERGE prunes to the
  buckets + key ranges a batch touches (the generalization of the
  reference's "recompute only changed region-days" scan avoidance,
  reference: src/datasources/floodscan.py:196-213), and bucket count
  bounds file-rewrite parallelism at scale (SURVEY.md §4).

The reference analog of this whole layer is the Postgres table with a
UNIQUE merge key (reference: src/utils/database.py:33-54) plus the
object store of per-(iso3, date) blobs (src/datasources/floodscan.py:346-352).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.evolve import align_to_schema

LSN_COL = "_lsn"  # internal column persisted in data files for cross-batch LWW
TOMBSTONE_COL = "_tombstone"  # persisted delete marker: a tombstone must keep
# competing by LSN across batches (a stale pre-delete update arriving later
# must NOT resurrect the row), so deletes are retained as hidden rows and
# filtered at scan — Iceberg merge-on-read delete-file analog.
INTERNAL_COLS = (LSN_COL, TOMBSTONE_COL)


@dataclass(frozen=True)
class DataFile:
    path: str  # relative to table root
    bucket: int
    rows: int
    min_key: str | None
    max_key: str | None
    schema_version: int

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "bucket": self.bucket,
            "rows": self.rows,
            "min_key": self.min_key,
            "max_key": self.max_key,
            "schema_version": self.schema_version,
        }

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(
            d["path"], d["bucket"], d["rows"], d.get("min_key"), d.get("max_key"), d["schema_version"]
        )


def _atomic_write(path: str, data: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class LakeTable:
    """A bucketed, snapshot-versioned, merge-keyed lake table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._meta_dir = os.path.join(self.path, "metadata")
        self._head: dict | None = None  # cached current snapshot

    # ---------------------------------------------------------- lifecycle
    # Default bucket-hash seed. Decorrelates table bucketing from any
    # upstream sharding that uses the same hash family: the changelog
    # shards on pmod(xxhash64(conv_id), n_shards), so an UNSEEDED
    # pmod(xxhash64(conv_id), n_buckets) makes each source shard map to
    # only n_buckets/n_shards buckets — a batch drawn from few shards
    # would then write (and later merge-prune) only a sliver of the
    # bucket space, throttling write parallelism. Stored per table in
    # the snapshot metadata (0 = legacy unseeded hash).
    BUCKET_SEED = 1315423911

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        merge_keys: tuple[str, ...] = ("conv_id", "turn_idx"),
        n_buckets: int = 64,
    ) -> "LakeTable":
        t = cls(spark, path)
        if os.path.exists(os.path.join(t._meta_dir, "HEAD")):
            raise FileExistsError(f"table already exists at {path}")
        os.makedirs(t._meta_dir, exist_ok=True)
        os.makedirs(os.path.join(t.path, "data"), exist_ok=True)
        snap = {
            "version": 1,
            "snapshot_id": uuid.uuid4().hex,
            "parent": None,
            "batch_id": None,
            "merge_keys": list(merge_keys),
            "n_buckets": n_buckets,
            "bucket_seed": cls.BUCKET_SEED,
            "schema_version": 1,
            "schemas": {"1": json.loads(schema.json())},
            "files": [],
            "requires_resolve": False,
            "summary": {"operation": "create", "total_rows": 0},
        }
        t._write_snapshot(snap)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        t.current()  # raises if missing
        return t

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(os.path.abspath(path), "metadata", "HEAD"))

    # ---------------------------------------------------------- snapshots
    def _snap_path(self, version: int) -> str:
        return os.path.join(self._meta_dir, f"v{version:08d}.json")

    def _write_snapshot(self, snap: dict) -> None:
        _atomic_write(self._snap_path(snap["version"]), json.dumps(snap, indent=1))
        _atomic_write(os.path.join(self._meta_dir, "HEAD"), str(snap["version"]))
        self._head = snap

    def current(self) -> dict:
        with open(os.path.join(self._meta_dir, "HEAD")) as f:
            version = int(f.read().strip())
        if self._head is not None and self._head["version"] == version:
            return self._head
        self._head = self.snapshot(version)
        return self._head

    def snapshot(self, version: int) -> dict:
        with open(self._snap_path(version)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        out = []
        v = 1
        while os.path.exists(self._snap_path(v)):
            out.append(self.snapshot(v))
            v += 1
        return out

    # ---------------------------------------------------------- properties
    @property
    def version(self) -> int:
        return self.current()["version"]

    @property
    def merge_keys(self) -> list[str]:
        return self.current()["merge_keys"]

    @property
    def n_buckets(self) -> int:
        return self.current()["n_buckets"]

    def schema(self, snapshot: dict | None = None) -> T.StructType:
        snap = snapshot or self.current()
        return T.StructType.fromJson(snap["schemas"][str(snap["schema_version"])])

    def schema_for_version(self, schema_version: int, snapshot: dict | None = None) -> T.StructType:
        snap = snapshot or self.current()
        return T.StructType.fromJson(snap["schemas"][str(schema_version)])

    def files(self, snapshot: dict | None = None) -> list[DataFile]:
        snap = snapshot or self.current()
        return [DataFile.from_json(d) for d in snap["files"]]

    def total_rows(self) -> int:
        return sum(f.rows for f in self.files())

    def bucket_expr(self, key_col: str | None = None) -> F.Column:
        """bucket = pmod(xxhash64(first merge key[, seed]), n_buckets)."""
        key = key_col or self.merge_keys[0]
        seed = self.current().get("bucket_seed", 0)
        h = F.xxhash64(F.col(key), F.lit(seed)) if seed else F.xxhash64(F.col(key))
        return F.pmod(h, F.lit(self.n_buckets)).cast("int")

    # ---------------------------------------------------------- scan
    def scan(
        self,
        version: int | None = None,
        include_internal: bool = False,
        files: list[DataFile] | None = None,
    ) -> DataFrame:
        """Read the table (optionally a past snapshot / a pruned file set).

        Files are grouped by the schema version they were written under;
        each group is read with its exact stored schema (so parquet
        type/presence differences never trip the reader), aligned to the
        snapshot's current schema, and unioned. Catalyst still gets
        column pruning + filter pushdown per group. Tombstoned (deleted)
        rows are filtered out unless ``include_internal``.
        """
        snap = self.current() if version is None else self.snapshot(version)
        flist = files if files is not None else self.files(snap)
        target = self.schema(snap)
        internal_fields = [
            T.StructField(LSN_COL, T.LongType(), True),
            T.StructField(TOMBSTONE_COL, T.BooleanType(), True),
        ]
        if not flist:
            out_schema = T.StructType(target.fields + (internal_fields if include_internal else []))
            return self.spark.createDataFrame([], out_schema)

        by_schema: dict[int, list[str]] = {}
        for f in flist:
            by_schema.setdefault(f.schema_version, []).append(os.path.join(self.path, f.path))
        parts: list[DataFrame] = []
        for sv, paths in sorted(by_schema.items()):
            stored = self.schema_for_version(sv, snap)
            read_schema = T.StructType(stored.fields + internal_fields)
            df = self.spark.read.schema(read_schema).parquet(*paths)
            parts.append(align_to_schema(df, target, keep_extra=[LSN_COL, TOMBSTONE_COL]))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if snap.get("requires_resolve", False):
            # merge-on-read: delta files overlap by key; resolve
            # last-writer-wins by LSN before anything else sees the rows
            # (one hash agg with map-side partials; LSN ties cannot
            # carry divergent payloads per CDC contract)
            from ..operators.dedup import dedup_last_writer

            out = dedup_last_writer(out, keys=snap["merge_keys"], order_cols=(LSN_COL,))
        if not include_internal:
            # IS NULL OR = false is a pushable predicate (Or(IsNull,
            # EqualTo) reaches the parquet row-group stats); the
            # equivalent ~coalesce(col, false) is not
            out = out.where(
                F.col(TOMBSTONE_COL).isNull() | (F.col(TOMBSTONE_COL) == F.lit(False))
            ).drop(LSN_COL, TOMBSTONE_COL)
        return out

    # ---------------------------------------------------------- commit
    def commit(
        self,
        removed_paths: set[str],
        added_files: list[DataFile],
        new_schema: T.StructType | None = None,
        batch_id: str | None = None,
        operation: str = "merge",
        summary_extra: dict | None = None,
        requires_resolve: bool | None = None,
    ) -> dict:
        """Replace-files commit: untouched files carry over unchanged.

        Single-writer atomicity via POSIX rename of HEAD (documented
        assumption; a catalog CAS replaces this on a real deployment).
        """
        cur = self.current()
        kept = [d for d in cur["files"] if d["path"] not in removed_paths]
        schemas = dict(cur["schemas"])
        schema_version = cur["schema_version"]
        if new_schema is not None and json.loads(new_schema.json()) != schemas[str(schema_version)]:
            schema_version += 1
            schemas[str(schema_version)] = json.loads(new_schema.json())
        files = kept + [f.to_json() for f in added_files]
        if requires_resolve is None:
            requires_resolve = cur.get("requires_resolve", False)
        snap = {
            "version": cur["version"] + 1,
            "snapshot_id": uuid.uuid4().hex,
            "parent": cur["snapshot_id"],
            "batch_id": batch_id,
            "merge_keys": cur["merge_keys"],
            "n_buckets": cur["n_buckets"],
            "bucket_seed": cur.get("bucket_seed", 0),
            "schema_version": schema_version,
            "schemas": schemas,
            "files": files,
            "requires_resolve": requires_resolve,
            "summary": {
                "operation": operation,
                "total_rows": sum(d["rows"] for d in files),
                "removed_files": len(removed_paths),
                "added_files": len(added_files),
                **(summary_extra or {}),
            },
        }
        self._write_snapshot(snap)
        return snap

    def committed_batch_ids(self) -> set[str]:
        return {s["batch_id"] for s in self.snapshots() if s.get("batch_id")}

    # ---------------------------------------------------------- write helper
    def write_data_files(
        self, df: DataFrame, write_schema: T.StructType, schema_version: int
    ) -> list[DataFile]:
        """Write rows (table-schema columns + _lsn + 'b' bucket + '_split')
        as new parquet data files and return their metadata.

        ``_split`` is the skew-splitting column (operators/skew.py): the
        repartition on (b, _split) bounds file size and spreads a hot
        bucket over several tasks/files. Per-file row counts and min/max
        merge-key stats come from the parquet FOOTERS (metadata-only, no
        second scan of the written data — the per-batch job count is part
        of the fixed cost that caps micro-batch throughput). On a real
        multi-node deployment these stats ride back in task commit
        messages, Iceberg-writer style; footer reads are the local-FS
        equivalent.
        """
        commit_dir = f"data/c{uuid.uuid4().hex[:12]}"
        out_dir = os.path.join(self.path, commit_dir)
        key0 = self.merge_keys[0]

        (
            df.repartition(F.col("b"), F.col("_split"))
            .drop("_split")
            .write.mode("overwrite")
            .partitionBy("b")
            .parquet(out_dir)
        )

        import glob as _glob
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def _stat(fpath: str) -> DataFile | None:
            md = pq.ParquetFile(fpath).metadata
            if md.num_rows == 0:
                os.remove(fpath)
                return None
            key_ix = next(
                i for i in range(md.num_columns)
                if md.schema.column(i).name == key0
            )
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(key_ix).statistics
                if st is None or not st.has_min_max:
                    mn = mx = None
                    break  # stats unavailable -> no pruning bounds for this file
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if isinstance(mn, bytes):
                mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
            rel = os.path.relpath(fpath, self.path)
            bucket = int(rel.split("b=")[1].split("/")[0])
            return DataFile(rel, bucket, md.num_rows, mn, mx, schema_version)

        paths = _glob.glob(os.path.join(out_dir, "b=*", "*.parquet"))
        if not paths:
            return []
        with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
            return [f for f in ex.map(_stat, paths) if f is not None]
