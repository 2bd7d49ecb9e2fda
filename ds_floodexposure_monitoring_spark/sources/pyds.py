"""Python Data Source API adapter: the lake as a first-class Spark format.

``spark.read.format("lake")`` / ``spark.readStream.format("lake_cdc")``
over :class:`~.lake.LakeTable` directories, built on PySpark 4's Python
Data Source API (``pyspark.sql.datasource``) — so the engine's tables
compose with plain ``spark.read`` pipelines, SQL ``CREATE TEMPORARY
VIEW ... USING lake``, and Structured Streaming without importing this
package's classes at the call site.

Why this is scale-correct (not a convenience shim):

- **Partition = bucket, fold local, zero shuffle.** The lake hash-
  buckets rows by merge key, so every version of a key lives in exactly
  one bucket. Each ``InputPartition`` is one bucket; the merge-on-read
  LWW / partial-update fold runs *inside* the partition over Arrow
  buffers — the resolve that costs a key-partitioned exchange in the
  DataFrame scan path costs **no shuffle at all** here. On a resolved
  snapshot (no fold pending) partitions degrade to one per FILE, i.e.
  plain parallel parquet.
- **Filter pushdown prunes FILES, not just rows.** ``pushFilters``
  keeps equality / IN / range predicates on the first merge key and
  probes each data file's manifest entry — the key's BUCKET first (the
  exact on-write ``pmod(xxhash64(key, seed), n)`` hash, recomputed by a
  pure-Python XXH64 whose bit-parity with Spark's expression is pinned
  by tests), then the min/max key envelope, then the manifest key
  bloom — before any I/O: the full :meth:`LakeTable.prune_for_keys`
  pruning stack with no Spark job at all. Pruning on the first merge
  key is MOR-sound: every version of a key carries the key, so a kept
  file set always contains each surviving key's full version chain.
  All filters are returned to Spark for re-application, so bloom
  false-keeps can never leak rows.
- **Offsets are snapshot versions.** The streaming source checkpoints
  ``{"version": v}``; each micro-batch is the exact snapshot diff
  ``(start, end]`` (the same semantics as :meth:`LakeTable.
  scan_changes` — Delta CDF / Iceberg changelog analog), computed
  per changed bucket inside the partition. Replays are deterministic
  as long as both snapshots are retained (``expire_snapshots``
  bounds how far back a checkpoint may resume — the source fails
  loudly past the horizon rather than silently emitting a wrong diff).

The per-bucket fold holds one bucket's rows in executor memory
(Arrow-columnar); ``n_buckets`` at table create is the knob that bounds
it, exactly as it bounds write parallelism. Reference analog: the
repo's blob layer reads each ``{iso3}`` exposure parquet whole per
process (src/utils/blob.py, src/datasources/floodscan.py) — here each
bucket is that unit, and 64+ of them read in parallel.

Pickling contract (why this module imports NOTHING from ``.lake`` at
module level): the DataSource object is unpickled inside Spark's
data-source worker processes — including the streaming source RUNNER,
which (unlike task workers) never receives ``addPyFile`` includes, so
a by-reference pickle of anything in this package dies there with
ModuleNotFoundError. ``register_lake_sources`` therefore registers
this module for cloudpickle BY-VALUE pickling, and the module keeps
its transitive pickle graph self-contained: local mirrors of the lake
format's internal column names (pinned to ``sources.lake``'s by
``tests/test_pyds.py``), pure-json snapshot readers, and plain-dict
partition payloads carried by the base ``InputPartition`` (so the
runner can re-pickle partitions with the stock pickler). Heavier lake
helpers (bloom probes) are imported lazily inside driver/task-side
functions, which DO have the package available."""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

BATCH_FORMAT = "lake"
CDC_FORMAT = "lake_cdc"

# Local mirrors of sources/lake.py's internal column names (LSN_COL,
# TOMBSTONE_COL, DML_SEQ_COL, FLSN_PREFIX) — mirrored, not imported,
# for the by-value pickling contract above; tests pin them equal.
_LSN = "_lsn"
_TOMBSTONE = "_tombstone"
_DML_SEQ = "_dml_seq"
_FLSN_PREFIX = "_flsn_"


def _flsn(c: str) -> str:
    return _FLSN_PREFIX + c


# --------------------------------------------------------------------------
# pure-json snapshot metadata (runner-safe: stdlib only)
# --------------------------------------------------------------------------


def _head_version(root: str, branch: str) -> int:
    name = "HEAD" if branch == "main" else f"HEAD.{branch}"
    with open(os.path.join(root, "metadata", name)) as f:
        return int(f.read().strip())


def _load_snap(root: str, version: int) -> dict:
    path = os.path.join(root, "metadata", f"v{version:08d}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        # the scan_changes retention contract, surfaced with the remedy:
        # a checkpoint that outlived expire_snapshots must fail loudly
        # (silently diffing from a newer base would emit a WRONG feed)
        raise ValueError(
            f"snapshot v{version} of lake table {root} is not retained "
            "(expired by expire_snapshots). A lake_cdc checkpoint or "
            "version option pointing at it cannot resume exactly; reset "
            "the checkpoint / pick a retained version, or lengthen "
            "snapshot retention past the consumer's max lag."
        ) from None


def _version_at(root: str, branch: str, ts: float) -> int:
    """TIMESTAMP AS OF on this branch's ancestry (LakeTable.version_at
    semantics): newest retained snapshot with committed_at <= ts,
    falling back to the metadata file's mtime for legacy snapshots."""
    import glob

    by_id: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(root, "metadata", "v*.json"))):
        with open(p) as f:
            s = json.load(f)
        by_id[s["snapshot_id"]] = s
    cur: dict | None = _load_snap(root, _head_version(root, branch))
    while cur is not None:
        at = cur.get("committed_at")
        if at is None:
            try:
                at = os.path.getmtime(
                    os.path.join(root, "metadata", f"v{cur['version']:08d}.json")
                )
            except FileNotFoundError:
                break
        if at <= ts:
            return cur["version"]
        cur = by_id.get(cur.get("parent"))
    raise ValueError(
        f"no retained snapshot at or before {ts}: history has been "
        "expired past the requested time"
    )


def _snapshot_ctx(snap: dict) -> dict:
    """Self-contained read context for one snapshot (no metadata re-reads
    on workers — partitions carry the exact file list, so a query reads
    one immutable snapshot regardless of concurrent commits)."""
    needed_svs = {d["schema_version"] for d in snap["files"]}
    needed_svs.add(snap["schema_version"])
    return {
        "schemas": {str(sv): snap["schemas"][str(sv)] for sv in needed_svs},
        "target_sv": snap["schema_version"],
        "renames": list(snap.get("renames", [])),
        "keys": list(snap["merge_keys"]),
        "pu": snap.get("merge_engine", "lww") == "partial-update",
        "resolve": bool(snap.get("requires_resolve", False)),
    }


# --------------------------------------------------------------------------
# executor-side Arrow kernels (no SparkSession, no JVM, no .lake)
# --------------------------------------------------------------------------


def _mapped_name(name: str, sv: int, renames: list[dict]) -> str:
    """Forward-map a stored column name through renames committed after
    this file's schema version (chained, in commit order) — mirrors
    LakeTable.scan's withColumnRenamed chain exactly."""
    for r in renames:
        if sv < r["at_schema_version"]:
            if name == r["from"]:
                name = r["to"]
            elif name == _flsn(r["from"]):
                name = _flsn(r["to"])
    return name


def _nullable(schema: T.StructType) -> T.StructType:
    """Relax nullability: a parquet-backed scan reads every column as
    nullable, and scan()'s output schema reflects that — mirror it so
    format("lake") and LakeTable.scan are drop-in interchangeable."""
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schema.fields]
    )


def _read_arrow_schema(ctx: dict, target_json: dict | None = None):
    """(aligned arrow schema incl. internal cols, spark target schema)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    target = _nullable(
        T.StructType.fromJson(target_json or ctx["schemas"][str(ctx["target_sv"])])
    )
    fields = list(to_arrow_schema(target))
    fields += [
        pa.field(_LSN, pa.int64()),
        pa.field(_TOMBSTONE, pa.bool_()),
        pa.field(_DML_SEQ, pa.int64()),
    ]
    if ctx["pu"]:
        fields += [
            pa.field(_flsn(f.name), pa.int64())
            for f in target.fields
            if f.name not in ctx["keys"]
        ]
    return pa.schema(fields), target


def _read_aligned(root: str, paths: list[str], svs: list[int], ctx: dict,
                  target_json: dict | None = None) -> "pa.Table":
    """Read data files into ONE aligned Arrow table: stored columns are
    forward-renamed, missing columns null-filled, narrower types cast up
    — the pure-Arrow mirror of scan()'s per-schema-group read +
    align_to_schema (operators/evolve.py:94)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    schema, _ = _read_arrow_schema(ctx, target_json)
    wanted = set(schema.names)
    parts = []
    for path, sv in zip(paths, svs):
        pf = pq.ParquetFile(os.path.join(root, path))
        phys = pf.schema_arrow.names
        cols = [n for n in phys if _mapped_name(n, sv, ctx["renames"]) in wanted]
        tbl = pf.read(columns=cols)
        tbl = tbl.rename_columns(
            [_mapped_name(n, sv, ctx["renames"]) for n in tbl.column_names]
        )
        arrays = []
        for fld in schema:
            if fld.name in tbl.column_names:
                col = tbl.column(fld.name)
                if col.type != fld.type:
                    col = pc.cast(col, fld.type)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(tbl.num_rows, fld.type))
        parts.append(pa.Table.from_arrays(arrays, schema=schema))
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts)


def _group_edges(tbl: "pa.Table", keys: list[str], last: bool):
    """Boolean mask over a KEY-SORTED table marking each group's first
    (``last=False``) or last (``last=True``) row."""
    import numpy as np

    n = tbl.num_rows
    mask = np.zeros(n, dtype=bool)
    if n == 0:
        return mask
    same = np.ones(n - 1, dtype=bool)
    for k in keys:
        a = tbl[k].to_numpy(zero_copy_only=False)
        same &= a[1:] == a[:-1]
    if last:
        mask[-1] = True
        mask[:-1] = ~same
    else:
        mask[0] = True
        mask[1:] = ~same
    return mask


def _fold_lww(tbl: "pa.Table", keys: list[str]) -> "pa.Table":
    """Bucket-local last-writer-wins by (LSN, dml_seq): sort keys asc +
    ordering desc (nulls last, so a null LSN loses — matching the JVM
    fold's null-smallest struct ordering), keep each group's first row.
    One in-memory sort, no shuffle: the bucket is key-complete."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return tbl
    i = tbl.column_names.index(_DML_SEQ)
    tbl = tbl.set_column(i, _DML_SEQ, pc.fill_null(tbl[_DML_SEQ], 0))
    idx = pc.sort_indices(
        pa.table({
            **{k: tbl[k] for k in keys},
            _LSN: tbl[_LSN],
            _DML_SEQ: tbl[_DML_SEQ],
        }),
        sort_keys=[(k, "ascending") for k in keys]
        + [(_LSN, "descending"), (_DML_SEQ, "descending")],
        null_placement="at_end",
    )
    s = tbl.take(idx)
    return s.filter(pa.array(_group_edges(s, keys, last=False)))


def _fold_pu(tbl: "pa.Table", keys: list[str], payload: list[str]) -> "pa.Table":
    """Bucket-local partial-update fold: each field independently keeps
    its value at max (per-field LSN, dml_seq), null-ordering-skipped —
    byte-equivalent to scan()'s max_by fold (sources/lake.py). One sort
    per field + per internal column; each pass sorts keys asc then the
    ordering asc with nulls FIRST, so the group's LAST row is the
    winner (or the all-null representative, whose value is null by the
    writer invariant: a field never written has a null per-field LSN
    and a null value)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = tbl.schema
    if tbl.num_rows == 0:
        return tbl
    i = tbl.column_names.index(_DML_SEQ)
    tbl = tbl.set_column(i, _DML_SEQ, pc.fill_null(tbl[_DML_SEQ], 0))

    def last_by(order_cols: list[str], grab: list[str]) -> dict:
        sub = pa.table(
            {**{k: tbl[k] for k in keys}, **{c: tbl[c] for c in order_cols},
             **{c: tbl[c] for c in grab if c not in order_cols}}
        )
        idx = pc.sort_indices(
            sub,
            sort_keys=[(k, "ascending") for k in keys]
            + [(c, "ascending") for c in order_cols],
            null_placement="at_start",
        )
        s = sub.take(idx)
        mask = pa.array(_group_edges(s, keys, last=True))
        out = {k: s[k].filter(mask) for k in keys}
        for c in grab:
            out[c] = s[c].filter(mask)
        return out

    cols: dict = {}
    first = True
    for c in payload:
        got = last_by([_flsn(c), _DML_SEQ], [c, _flsn(c)])
        if first:
            for k in keys:
                cols[k] = got[k]
            first = False
        cols[c] = got[c]
        cols[_flsn(c)] = got[_flsn(c)]
    # row-level internals: max over the group (tombstone as any-true)
    t_i = tbl.column_names.index(_TOMBSTONE)
    tbl = tbl.set_column(t_i, _TOMBSTONE, pc.fill_null(tbl[_TOMBSTONE], False))
    for c in (_LSN, _TOMBSTONE, _DML_SEQ):
        got = last_by([c], [c])
        if first:
            for k in keys:
                cols[k] = got[k]
            first = False
        cols[c] = got[c]
    arrays = [cols[f.name] for f in schema]
    return pa.Table.from_arrays(arrays, schema=schema)


def _resolve_partition(root, paths, svs, ctx, target_json=None) -> "pa.Table":
    """Aligned + (if pending) MOR-resolved rows of one bucket, WITH
    internal columns; tombstoned rows retained (callers decide)."""
    tbl = _read_aligned(root, paths, svs, ctx, target_json)
    if ctx["resolve"]:
        if ctx["pu"]:
            payload = [
                n for n in tbl.column_names
                if n not in ctx["keys"]
                and n not in (_LSN, _TOMBSTONE, _DML_SEQ)
                and not n.startswith(_FLSN_PREFIX)
            ]
            tbl = _fold_pu(tbl, ctx["keys"], payload)
        else:
            tbl = _fold_lww(tbl, ctx["keys"])
    return tbl


def _live_project(tbl: "pa.Table", ctx: dict, target_json: dict | None = None):
    """Drop tombstoned rows and internal columns; emit target schema."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.pandas.types import to_arrow_schema

    target = _nullable(
        T.StructType.fromJson(target_json or ctx["schemas"][str(ctx["target_sv"])])
    )
    out_schema = to_arrow_schema(target)
    dead = pc.fill_null(tbl[_TOMBSTONE], False)
    live = tbl.filter(pc.invert(dead))
    return pa.Table.from_arrays(
        [live[f.name] for f in out_schema], schema=out_schema
    )


# --------------------------------------------------------------------------
# XXH64 (public spec), matching Spark's xxhash64 expression bit-for-bit —
# lets pushFilters compute a key's BUCKET driver-side with no Spark job,
# so a point lookup prunes to one bucket's files before range/bloom even
# run. Scalar Python: pushFilters sees a handful of literals, never rows.
# Parity with org.apache.spark.sql.catalyst.expressions.XxHash64 is
# pinned by tests/test_pyds.py over random strings/longs/ints.
# --------------------------------------------------------------------------

_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


def _xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: an 8-byte input."""
    value &= _M64
    h = (seed + _XP5 + 8) & _M64
    h ^= (_rotl64((value * _XP2) & _M64, 31) * _XP1) & _M64
    h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
    return _xxh_fmix(h)


def _xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: a 4-byte input (int/short/byte literals and
    columns all take this path)."""
    value &= 0xFFFFFFFF
    h = (seed + _XP5 + 4) & _M64
    h ^= (value * _XP1) & _M64
    h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
    return _xxh_fmix(h)


def _xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark hashUnsafeBytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            k = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl64((v1 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl64((v2 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl64((v3 + k * _XP2) & _M64, 31) * _XP1) & _M64
            k = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl64((v4 + k * _XP2) & _M64, 31) * _XP1) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XP2) & _M64, 31) * _XP1) & _M64
            h = ((h * _XP1) + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl64((k * _XP2) & _M64, 31) * _XP1) & _M64
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    return _xxh_fmix(h)


def _spark_xxhash64(value, kind: str, seed_lit: int | None) -> int:
    """``xxhash64(key[, lit(seed)])`` as Spark evaluates it: fold over
    children starting from seed 42 — the key via its TYPE's path
    (``kind`` in 'string' | 'long' | 'int'; int/short/byte columns all
    take the 4-byte path), then the seed literal via the int path (the
    engine's BUCKET_SEED fits in int32, so ``F.lit`` makes it an
    IntegerType child)."""
    h = 42
    if kind == "long":
        h = _xxh64_long(int(value), h)
    elif kind == "int":
        h = _xxh64_int(int(value), h)
    else:
        h = _xxh64_bytes(str(value).encode("utf-8"), h)
    if seed_lit:
        if -(1 << 31) <= seed_lit < (1 << 31):
            h = _xxh64_int(seed_lit, h)
        else:
            h = _xxh64_long(seed_lit, h)
    return h


def _bucket_of(value, kind: str, seed_lit: int, n_buckets: int) -> int:
    """pmod(xxhash64(...), n_buckets) on the SIGNED hash (Java pmod ==
    Python %, for positive modulus)."""
    h = _spark_xxhash64(value, kind, seed_lit or None)
    if h >= 1 << 63:
        h -= 1 << 64
    return h % n_buckets


# --------------------------------------------------------------------------
# batch source: spark.read.format("lake")
# --------------------------------------------------------------------------


def _prune_files(entries: list[dict], key_kind: str | None,
                 eq_values: list, lo, hi,
                 n_buckets: int = 0, bucket_seed: int = 0) -> list[dict]:
    """Metadata-only file skip on the first merge key: BUCKET (the exact
    on-write pmod(xxhash64) hash, recomputed in pure Python — parity
    pinned by tests), then min/max range envelope, then manifest bloom
    probe. Zero file I/O, zero Spark jobs. Sound on any snapshot —
    every version of a key carries the key, the bucket hash is exact,
    and a negative bloom probe proves absence (prune_for_keys'
    argument). ``entries`` are raw manifest-entry dicts. Lazily imports
    the bloom kernels from sources.lake — this runs driver/plan-side
    where the package is importable, never in the include-less stream
    runner."""
    import base64

    from ds_floodexposure_monitoring_spark.sources.lake import (
        _bloom_hash64,
        _bloom_might_contain,
    )

    integral_key = key_kind in ("long", "int")
    hashes = (
        [int(h) for h in _bloom_hash64(eq_values, integral=integral_key)]
        if eq_values
        else []
    )
    bucket_set = (
        {_bucket_of(v, key_kind, bucket_seed, n_buckets) for v in eq_values}
        if eq_values and key_kind and n_buckets
        else None
    )
    out = []
    for f in entries:
        if bucket_set is not None and f.get("bucket") not in bucket_set:
            continue
        mn, mx = f.get("min_key"), f.get("max_key")
        if mn is not None and mx is not None:
            if eq_values and all(v < mn or v > mx for v in eq_values):
                continue
            if lo is not None and mx < lo:
                continue
            if hi is not None and mn > hi:
                continue
        if eq_values and f.get("key_bloom"):
            raw = base64.b64decode(f["key_bloom"])
            if not any(_bloom_might_contain(raw, h) for h in hashes):
                continue
        out.append(f)
    return out


class _LakeBatchReader(DataSourceReader):
    """Implements pushFilters, so reads REQUIRE
    spark.sql.python.filterPushdown.enabled=true (register_lake_sources
    sets it; Spark fails loudly naming the conf otherwise)."""

    def __init__(self, root: str, snap: dict):
        self.root = root
        self.ctx = _snapshot_ctx(snap)
        self.entries = list(snap["files"])
        schema = T.StructType.fromJson(snap["schemas"][str(snap["schema_version"])])
        key0 = snap["merge_keys"][0]
        self.key0 = key0
        kt = next(f.dataType for f in schema.fields if f.name == key0)
        if isinstance(kt, T.StringType):
            self.key_kind: str | None = "string"
        elif isinstance(kt, T.LongType):
            self.key_kind = "long"
        elif isinstance(kt, (T.IntegerType, T.ShortType, T.ByteType)):
            # int/short/byte columns all take Spark's 4-byte hash path
            self.key_kind = "int"
        else:
            self.key_kind = None  # no metadata pruning for exotic key types
        self.n_buckets = int(snap.get("n_buckets", 0))
        self.bucket_seed = int(snap.get("bucket_seed", 0))

    def pushFilters(self, filters):
        key0 = self.key0
        eq_values: list = []
        lo = hi = None
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == (key0,):
                eq_values.append(f.value)
            elif isinstance(f, In) and f.attribute == (key0,):
                eq_values.extend(f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and f.attribute == (key0,):
                lo = f.value if lo is None else max(lo, f.value)
            elif isinstance(f, (LessThan, LessThanOrEqual)) and f.attribute == (key0,):
                hi = f.value if hi is None else min(hi, f.value)
        if eq_values or lo is not None or hi is not None:
            self.entries = _prune_files(
                self.entries, self.key_kind, eq_values, lo, hi,
                n_buckets=self.n_buckets, bucket_seed=self.bucket_seed,
            )
        # hand every filter back: Spark re-applies them row-level, so
        # bloom false-keeps and untouched predicates stay correct
        return filters

    def partitions(self):
        if not self.ctx["resolve"]:
            # resolved snapshot: no fold pending — file-granular
            # parallelism, exactly like a plain parquet scan
            return [
                InputPartition({
                    "root": self.root,
                    "paths": [f["path"]],
                    "svs": [f["schema_version"]],
                    "ctx": self.ctx,
                })
                for f in self.entries
            ]
        by_bucket: dict[int, list[dict]] = {}
        for f in self.entries:
            by_bucket.setdefault(f["bucket"], []).append(f)
        return [
            InputPartition({
                "root": self.root,
                "paths": [f["path"] for f in fs],
                "svs": [f["schema_version"] for f in fs],
                "ctx": self.ctx,
            })
            for _, fs in sorted(by_bucket.items())
        ]

    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        if partition is None:  # empty table: Spark still runs one task
            return
        p = partition.value
        tbl = _resolve_partition(p["root"], p["paths"], p["svs"], p["ctx"])
        out = _live_project(tbl, p["ctx"])
        yield from out.to_batches(max_chunksize=1 << 16)


class LakeDataSource(DataSource):
    """``spark.read.format("lake").load(path)``.

    Options: ``path`` (table root), ``branch`` (default main),
    ``version`` (time travel by snapshot version), ``timestampAsOf``
    (ISO timestamp or unix seconds — TIMESTAMP AS OF analog)."""

    @classmethod
    def name(cls) -> str:
        return BATCH_FORMAT

    def _snap(self) -> dict:
        if not hasattr(self, "_pinned"):
            root = os.path.abspath(self.options["path"])
            branch = self.options.get("branch", "main")
            v = self.options.get("version")
            if v is not None:
                v = int(v)
            else:
                ts = self.options.get("timestampasof")
                if ts is not None:
                    try:
                        ts = float(ts)
                    except ValueError:
                        import datetime as _dt

                        dtv = _dt.datetime.fromisoformat(ts)
                        if dtv.tzinfo is None:
                            dtv = dtv.replace(tzinfo=_dt.timezone.utc)
                        ts = dtv.timestamp()
                    v = _version_at(root, branch, ts)
                else:
                    v = _head_version(root, branch)
            self._pinned = _load_snap(root, v)
        return self._pinned

    def schema(self) -> T.StructType:
        snap = self._snap()
        return _nullable(
            T.StructType.fromJson(snap["schemas"][str(snap["schema_version"])])
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _LakeBatchReader(
            os.path.abspath(self.options["path"]), self._snap()
        )


# --------------------------------------------------------------------------
# change-feed source: spark.read / readStream .format("lake_cdc")
# --------------------------------------------------------------------------


def _diff_partitions(
    root: str, old_snap: dict, new_snap: dict, target_json: dict
) -> list[InputPartition]:
    """One partition per bucket whose FILE SET differs between the two
    snapshots (identical sets cannot differ in content — metadata-only
    pruning, same rule as scan_changes)."""
    by_bucket: dict[int, tuple[list, list]] = {}
    for i, snap in enumerate((old_snap, new_snap)):
        for d in snap["files"]:
            by_bucket.setdefault(d["bucket"], ([], []))[i].append(d)
    # old side maps through the NEW snapshot's renames: a rename committed
    # between the two snapshots must forward-map old files so the diff
    # compares the same logical column (scan_changes' rule)
    old_ctx = {
        **_snapshot_ctx(old_snap),
        "renames": list(new_snap.get("renames", [])),
    }
    new_ctx = _snapshot_ctx(new_snap)
    out = []
    for b, (olds, news) in sorted(by_bucket.items()):
        if {d["path"] for d in olds} == {d["path"] for d in news}:
            continue
        out.append(
            InputPartition({
                "root": root,
                "old_paths": [d["path"] for d in olds],
                "old_svs": [d["schema_version"] for d in olds],
                "old_ctx": old_ctx,
                "new_paths": [d["path"] for d in news],
                "new_svs": [d["schema_version"] for d in news],
                "new_ctx": new_ctx,
                "target_json": target_json,
            })
        )
    return out


def _diff_schema(target: T.StructType, keys: list[str]) -> T.StructType:
    fields = [f for f in target.fields if f.name in keys]
    fields += [f for f in target.fields if f.name not in keys]
    fields += [
        T.StructField("change_lsn", T.LongType(), True),
        T.StructField("change_type", T.StringType(), True),
    ]
    return _nullable(T.StructType(fields))


def _read_diff(partition: InputPartition) -> Iterator["pa.RecordBatch"]:
    """Bucket-local snapshot diff: resolve both sides in Arrow, classify
    insert/update/delete in pandas (Arrow-backed dtypes — no int64→
    float64 precision loss), emit post-image rows (pre-image for
    deletes) — the exact scan_changes semantics, zero shuffle."""
    if partition is None:  # no changed buckets: Spark still runs one task
        return
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    p = partition.value
    ctx_n = p["new_ctx"]
    keys = ctx_n["keys"]
    target = T.StructType.fromJson(p["target_json"])
    data_cols = [f.name for f in target.fields if f.name not in keys]

    def side(paths, svs, ctx) -> pd.DataFrame:
        tbl = _resolve_partition(p["root"], paths, svs, ctx, p["target_json"])
        df = tbl.to_pandas(types_mapper=pd.ArrowDtype)
        df[_TOMBSTONE] = df[_TOMBSTONE].fillna(False).astype(bool)
        return df[keys + data_cols + [_LSN, _TOMBSTONE]]

    o = side(p["old_paths"], p["old_svs"], p["old_ctx"])
    n = side(p["new_paths"], p["new_svs"], ctx_n)
    j = o.merge(n, on=keys, how="outer", suffixes=("_o", "_n"), indicator=True)
    old_present = j["_merge"].isin(("left_only", "both")).to_numpy()
    new_present = j["_merge"].isin(("right_only", "both")).to_numpy()
    old_alive = old_present & ~j[f"{_TOMBSTONE}_o"].fillna(False).to_numpy(dtype=bool)
    new_alive = new_present & ~j[f"{_TOMBSTONE}_n"].fillna(False).to_numpy(dtype=bool)

    payload_changed = np.zeros(len(j), dtype=bool)
    for c in data_cols:
        a, b = j[f"{c}_o"], j[f"{c}_n"]
        eq = (a == b).fillna(False).to_numpy(dtype=bool)
        both_na = (a.isna() & b.isna()).to_numpy(dtype=bool)
        payload_changed |= ~(eq | both_na)
    lsn_o = j[f"{_LSN}_o"]
    lsn_n = j[f"{_LSN}_n"]
    lsn_moved = ~(lsn_o == lsn_n).fillna(False).to_numpy(dtype=bool)

    insert = ~old_alive & new_alive
    update = old_alive & new_alive & (lsn_moved | payload_changed)
    delete = old_alive & ~new_alive
    change = np.select(
        [insert, update, delete], ["insert", "update", "delete"], default=""
    )
    keep = change != ""
    j = j[keep]
    change = change[keep]
    is_del = change == "delete"

    out = {k: j[k] for k in keys}
    for c in data_cols:
        out[c] = j[f"{c}_n"].where(~is_del, j[f"{c}_o"])
    out["change_lsn"] = lsn_n[keep].where(
        ~is_del | lsn_n[keep].notna(), lsn_o[keep]
    )
    out["change_type"] = pd.Series(change, index=j.index)
    out_schema = to_arrow_schema(_diff_schema(target, keys))
    res = pa.Table.from_pandas(
        pd.DataFrame(out), schema=out_schema, preserve_index=False
    )
    yield from res.to_batches(max_chunksize=1 << 16)


class _LakeCDCBatchReader(DataSourceReader):
    def __init__(self, root, old_snap, new_snap, target_json):
        self.root = root
        self.old_snap = old_snap
        self.new_snap = new_snap
        self.target_json = target_json

    def partitions(self):
        return _diff_partitions(
            self.root, self.old_snap, self.new_snap, self.target_json
        )

    def read(self, partition):
        yield from _read_diff(partition)


class _LakeCDCStreamReader(DataSourceStreamReader):
    """Change-feed tail: offsets are snapshot versions; each micro-batch
    is the per-bucket snapshot diff. Exactly-once downstream composition:
    the offset checkpoint + deterministic diff replay give the same
    batch on recovery (snapshots must be retained past the checkpoint —
    the same contract as scan_changes). Runs inside Spark's streaming
    source runner process: stdlib + pyspark only."""

    def __init__(self, root: str, branch: str, start_version: int, target_json: dict):
        self.root = root
        self.branch = branch
        self.start_version = start_version
        self.target_json = target_json

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        # Always the true head — no maxOffsetsPerTrigger-style clamping:
        # this API hands latestOffset() no current-offset argument, so a
        # restarted reader cannot clamp relative to the checkpoint and a
        # clamp computed from its own (stale) start option could land
        # BEHIND the committed offset, planning an inverted diff. Snapshot
        # diffs are cheap per extra version anyway (bucket-pruned), so a
        # long-idle checkpoint catches up in one correct batch.
        return {"version": _head_version(self.root, self.branch)}

    def partitions(self, start: dict, end: dict):
        if start["version"] == end["version"]:
            return []
        return _diff_partitions(
            self.root,
            _load_snap(self.root, start["version"]),
            _load_snap(self.root, end["version"]),
            self.target_json,
        )

    def read(self, partition):
        yield from _read_diff(partition)

    def commit(self, end: dict) -> None:
        pass


class LakeCDCDataSource(DataSource):
    """Snapshot-diff change feed as a Spark source.

    Batch: ``spark.read.format("lake_cdc").option("fromVersion", v)
    [.option("toVersion", w)].load(path)`` — the scan_changes analog.
    Streaming: ``spark.readStream.format("lake_cdc")
    [.option("startingVersion", v)].load(path)`` — tail the table;
    default starts at the CURRENT head (only new changes)."""

    @classmethod
    def name(cls) -> str:
        return CDC_FORMAT

    def _root(self) -> str:
        return os.path.abspath(self.options["path"])

    def _branch(self) -> str:
        return self.options.get("branch", "main")

    def _to_snap(self) -> dict:
        to_v = self.options.get("toversion")
        v = int(to_v) if to_v is not None else _head_version(
            self._root(), self._branch()
        )
        return _load_snap(self._root(), v)

    def schema(self) -> T.StructType:
        snap = self._to_snap()
        target = T.StructType.fromJson(
            snap["schemas"][str(snap["schema_version"])]
        )
        return _diff_schema(target, snap["merge_keys"])

    def reader(self, schema: T.StructType) -> DataSourceReader:
        from_v = self.options.get("fromversion")
        if from_v is None:
            raise ValueError(
                "lake_cdc batch read requires option fromVersion "
                "(use readStream for continuous tailing)"
            )
        new_snap = self._to_snap()
        old_snap = _load_snap(self._root(), int(from_v))
        if old_snap["version"] > new_snap["version"]:
            raise ValueError(
                f"fromVersion {old_snap['version']} > toVersion "
                f"{new_snap['version']}"
            )
        return _LakeCDCBatchReader(
            self._root(),
            old_snap,
            new_snap,
            new_snap["schemas"][str(new_snap["schema_version"])],
        )

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        sv = self.options.get("startingversion")
        ts = self.options.get("startingtimestamp")
        if sv is not None:
            start = int(sv)
        elif ts is not None:
            try:
                tsv = float(ts)
            except ValueError:
                import datetime as _dt

                dtv = _dt.datetime.fromisoformat(ts)
                if dtv.tzinfo is None:
                    dtv = dtv.replace(tzinfo=_dt.timezone.utc)
                tsv = dtv.timestamp()
            start = _version_at(self._root(), self._branch(), tsv)
        else:
            start = _head_version(self._root(), self._branch())
        snap = self._to_snap()
        return _LakeCDCStreamReader(
            self._root(),
            self._branch(),
            start,
            snap["schemas"][str(snap["schema_version"])],
        )


# --------------------------------------------------------------------------
# registration
# --------------------------------------------------------------------------

_SHIPPED = None  # WeakSet of SparkContexts already carrying the zip


def _ensure_shipped(spark) -> None:
    """Ship the package zip to Python workers (``sc.addPyFile``): task
    workers unpickle partition payloads and lazy lake imports by module
    name, so a session whose workers lack the repo on sys.path needs
    the ``spark-submit --py-files`` analog (same mechanism as
    ``__spark_entry__``). The include-less stream-runner process is
    covered separately by the by-value pickling contract (module
    docstring)."""
    global _SHIPPED
    import tempfile
    import weakref
    import zipfile

    if _SHIPPED is None:
        _SHIPPED = weakref.WeakSet()
    sc = spark.sparkContext
    if sc in _SHIPPED:
        return
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"dsfm-pyds-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg):
                for fname in sorted(files):
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        z.write(
                            full,
                            os.path.relpath(full, os.path.dirname(pkg)),
                        )
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _SHIPPED.add(sc)


def register_lake_sources(spark) -> None:
    """Register ``lake`` (batch table reads) and ``lake_cdc`` (batch +
    streaming change feed) on the session. Idempotent. Enables
    ``spark.sql.python.filterPushdown.enabled`` (runtime-settable; the
    batch reader's file pruning requires it) and registers this module
    for cloudpickle by-value pickling so the streaming source runner —
    which receives no pyFiles — can unpickle the source."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    _ensure_shipped(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeDataSource)
    spark.dataSource.register(LakeCDCDataSource)
