"""Streaming FROM a TransactionalLake — the Delta-streaming-source
analog, as a Spark 4 Python data source (format ``lake_changes``).

``spark.readStream.format("lake_changes").option("path", ...)`` turns
the lake's commit log into an exactly-once micro-batch stream: the
OFFSET is the commit version, each batch covers the commit range
[startOffset, endOffset), and every add-file in that range becomes
one input partition read executor-side with pyarrow. Because the log
and its data files are immutable, a replayed batch re-reads exactly
the same bytes — determinism is the recovery contract, the same
property the repo's synthetic tick source demonstrates
(pysource.py).

Semantics follow Delta's streaming source: the stream is
APPEND-DRIVEN. A data-changing commit that removes or positionally
deletes rows (delete/update/merge/overwrite/restore/deletion-vector
commits) FAILS the stream unless ``ignore_deletes=true``, in which
case its added files still stream and the removals are skipped
(Delta's ignoreChanges). Pure layout maintenance — compact /
set_partitioning — moves bytes, not rows, and is always skipped.

Output schema = the table's committed schema (hive partition columns
restored from the directory names, evolved columns null-filled on
pre-evolution files) plus ``_commit_version``. With
``with_row_ids=true`` (requires ``enable_row_tracking()``) each row
additionally carries its stable ``_row_id`` and
``_row_commit_version`` — row lineage in the stream, computed
executor-side at the Arrow level (base + row-index, coalesced with
the materialized id a rewrite carried).

Scale: the driver touches only the commit JSON (O(new commits) per
trigger); row bytes move straight from parquet to Arrow batches in
the Python workers, one partition per (file, commit).

Admission control (r11, Delta ``maxFilesPerTrigger`` parity):
``max_files_per_trigger`` / ``max_rows_per_trigger`` cap how far
each micro-batch advances, so a restart against a deep backlog
drains as a ladder of bounded batches instead of one giant
catch-up batch (the row cap reads the log's per-file row counts —
no file opens). A single commit larger than the cap streams alone:
a commit is the atomic unit. CAVEAT: ``trigger(availableNow=True)``
snapshots ONE ``latestOffset()`` as the run's end (the Python
source API has no ReadLimit handshake), so an availableNow run
consumes at most one cap step; use a processing-time trigger for
continuous capped draining, or — for the Delta
``Trigger.AvailableNow``-style one-call backlog drain —
:func:`drain_available`, which loops availableNow passes over a
shared checkpoint until the committed offset stops advancing (r12).
The checkpoint makes the ladder exactly-once either way.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

LOG_DIR = "_txn_log"
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, LOG_DIR)


def _commit_versions(table_path: str) -> list[int]:
    lp = _log_path(table_path)
    if not os.path.isdir(lp):
        return []
    return sorted(
        int(f.split(".")[0]) for f in os.listdir(lp) if f.endswith(".json")
    )


def _read_commit(table_path: str, v: int) -> dict:
    with open(os.path.join(_log_path(table_path), f"{v:08d}.json")) as fh:
        return json.load(fh)


def _latest_checkpoint(table_path: str) -> dict | None:
    lp = _log_path(table_path)
    if not os.path.isdir(lp):
        return None
    cps = sorted(
        (f for f in os.listdir(lp) if f.endswith(".checkpoint")),
        reverse=True,
    )
    for name in cps:
        try:
            with open(os.path.join(lp, name)) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
    return None


def _column_map(table_path: str) -> dict[str, str] | None:
    """Active logical -> physical column map (column-mapping tables),
    None when the feature is unused — the newest checkpoint's doc
    plus the commit tail, last doc wins (mirrors
    ``TransactionalLake._column_mapping_doc``)."""
    cp = _latest_checkpoint(table_path)
    doc = cp.get("column_mapping") if cp else None
    start = cp["version"] + 1 if cp else 0
    for v in _commit_versions(table_path):
        if v < start:
            continue
        c = _read_commit(table_path, v)
        if c.get("column_mapping") is not None:
            doc = c["column_mapping"]
    return dict(doc["cols"]) if doc else None


def _table_schema(table_path: str) -> StructType:
    """Latest committed schema, read straight from the log (newest
    commit carrying one, else the newest checkpoint's history).
    Column-mapping tables project to LOGICAL names — same contract
    as ``snapshot()``; the per-file reads still key on the physical
    names, which never change, so a mid-stream rename cannot break
    a running stream (it keeps its start-time schema until
    restart, like any Structured Streaming schema)."""
    # the table schema is the MERGED batch-schema history (r10: a
    # narrow batch landing last must not hide evolved columns from
    # the stream), newest type wins per field, first-seen order
    history: list[str] = []
    cp = _latest_checkpoint(table_path)
    start = 0
    if cp and cp.get("schemas"):
        history.extend(cp["schemas"])
        start = cp["version"] + 1
    for v in _commit_versions(table_path):
        if v < start:
            continue
        c = _read_commit(table_path, v)
        if c.get("schema_history"):
            history.extend(c["schema_history"])
        elif c.get("schema"):
            history.append(c["schema"])
    if not history:
        raise ValueError(
            f"lake_changes: no committed schema found at {table_path!r}"
        )
    # same union fold as the lake's own reads (widest type wins on a
    # widen_column_type history, newest otherwise)
    from market_data_lakehouse_spark.txnlog import TransactionalLake

    phys = StructType.fromJson(
        {
            "type": "struct",
            "fields": TransactionalLake._merged_fields(history),
        }
    )
    cmap = _column_map(table_path)
    if cmap is None:
        return phys
    by_phys = {f.name: f for f in phys.fields}
    out = StructType()
    for logical, physical in cmap.items():
        f = by_phys.get(physical)
        if f is not None:
            out.add(logical, f.dataType, f.nullable)
    return out


def _row_base_map(table_path: str) -> dict[str, list[int]]:
    """Immutable per-file base row-id map (row tracking): the newest
    checkpoint's folded map plus every commit's ``row_base``
    assignments. Empty when the feature is unused. Per-file bases
    are write-once, so a plain union fold is exact."""
    out: dict[str, list[int]] = {}
    cp = _latest_checkpoint(table_path)
    start = 0
    if cp:
        start = cp["version"] + 1
        if cp.get("row_tracking"):
            out.update(
                {f: list(b) for f, b in cp["row_tracking"]["base"].items()}
            )
    for v in _commit_versions(table_path):
        if v < start:
            continue
        for f, b in _read_commit(table_path, v).get(
            "row_base", {}
        ).items():
            out[f] = list(b)
    return out


class _AddFilePartition(InputPartition):
    def __init__(
        self,
        abs_path: str,
        rel_path: str,
        version: int,
        row_base: list[int] | None = None,
    ):
        self.abs_path = abs_path
        self.rel_path = rel_path
        self.version = version
        self.row_base = row_base


class LakeChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lake_changes requires option 'path'")
        self.start_version = int(options.get("starting_version", 0))
        st = options.get("starting_timestamp")
        if st is not None:
            # Delta startingTimestamp semantics: begin at the first
            # commit AT OR AFTER the timestamp (commit times are
            # monotonic — the log clamps them, so this resolution is
            # stable under writer clock skew). ISO string or epoch.
            if "starting_version" in options:
                raise ValueError(
                    "lake_changes: pass starting_version OR "
                    "starting_timestamp, not both"
                )
            try:
                target = float(st)
            except ValueError:
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(st)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                target = dt.timestamp()
            versions = _commit_versions(self.path)
            self.start_version = (versions[-1] + 1) if versions else 0
            for v in versions:
                if _read_commit(self.path, v).get("timestamp", 0) >= target:
                    self.start_version = v
                    break
        self.ignore_deletes = (
            str(options.get("ignore_deletes", "false")).lower() == "true"
        )
        # Admission control (Delta maxFilesPerTrigger parity, plus a
        # row-count twin powered by the log's per-file row counts):
        # latestOffset caps how far each micro-batch may advance.
        # The Python source API exposes no ReadLimit, so the cap
        # works off a RATCHETING CURSOR: it starts at the stream's
        # own start, advances by at most one cap per trigger, and
        # fast-forwards whenever partitions()/commit() reveal the
        # engine's true position. After a restart with backlog, the
        # cursor may briefly trail the checkpointed offset — those
        # triggers plan no batch and the cursor climbs at cap rate
        # until it passes it; no stall, no loss, and every REAL
        # batch stays within the cap (its [start, end) sits inside
        # one cursor step).
        mf = options.get("max_files_per_trigger")
        mr = options.get("max_rows_per_trigger")
        self.max_files = int(mf) if mf is not None else None
        self.max_rows = int(mr) if mr is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("max_files_per_trigger must be >= 1")
        if self.max_rows is not None and self.max_rows < 1:
            raise ValueError("max_rows_per_trigger must be >= 1")
        self._cursor = self.start_version
        self.with_row_ids = (
            str(options.get("with_row_ids", "false")).lower() == "true"
        )
        # immutable per-file base row-id map, seeded at stream start;
        # partitions() extends it from each planned commit's own
        # row_base so files added mid-stream resolve without a refold
        self._row_base: dict[str, list[int]] = (
            _row_base_map(self.path) if self.with_row_ids else {}
        )
        if self.with_row_ids and not self._row_base:
            raise ValueError(
                "lake_changes: with_row_ids=true requires "
                "enable_row_tracking() on the source table"
            )
        self.schema = schema
        # logical -> physical translation for column-mapping tables:
        # schema names are logical, parquet/partition-dir names are
        # physical (resolved once at stream start; physical names
        # never change, so this stays valid for the stream's life)
        self.cmap = _column_map(self.path) or {}
        # An Arrow type is only ever needed for a column that must be
        # SYNTHESIZED at read time — a hive partition value restored
        # from the directory name, or an evolved column null-filled
        # into a pre-evolution file. A column physically present in
        # every parquet file passes through as-is and needs no
        # conversion, so an exotic type must NOT block the whole
        # stream at construction (ADVICE r8 — it previously streamed
        # fine). Which columns are synthesized depends on each
        # commit's file layout, unknowable here: warn now with the
        # exact failure condition, keep the hard, attributable
        # TypeError at the point an Arrow type is actually required.
        for f in schema.fields:
            try:
                _arrow_type(f.dataType)
            except TypeError:
                import warnings

                warnings.warn(
                    f"lake_changes: column {f.name!r} has type "
                    f"{f.dataType.simpleString()!r} with no Arrow "
                    "mapping; the stream will fail at read time IF "
                    "this column must be restored from a partition "
                    "path or null-filled into a pre-evolution file",
                    stacklevel=2,
                )

    # -- offsets --------------------------------------------------------
    def initialOffset(self):
        versions = _commit_versions(self.path)
        oldest = versions[0] if versions else 0
        cp = _latest_checkpoint(self.path)
        if self.start_version < oldest and cp is not None and (
            self.start_version <= cp["version"]
        ):
            raise ValueError(
                f"lake_changes from v{self.start_version} predates log "
                f"retention (oldest retained commit: v{oldest})"
            )
        return {"version": self.start_version}

    def latestOffset(self):
        versions = _commit_versions(self.path)
        head_next = (versions[-1] + 1) if versions else 0
        if self.max_files is None and self.max_rows is None:
            return {"version": head_next}
        end = max(self._cursor, self.start_version)
        files = rows = 0
        while end < head_next:
            try:
                c = _read_commit(self.path, end)
            except FileNotFoundError:
                break  # below retention: partitions() owns the error
            adds = c.get("add", [])
            f_n = len(adds)
            r_n = sum(c.get("rows", {}).get(f, 0) for f in adds)
            over = (
                self.max_files is not None
                and files + f_n > self.max_files
            ) or (
                self.max_rows is not None and rows + r_n > self.max_rows
            )
            if over and (files or rows):
                break  # cap reached; next trigger continues here
            # a single commit bigger than the cap still advances
            # alone — a commit is the atomic streaming unit
            files += f_n
            rows += r_n
            end += 1
            if (
                self.max_files is not None and files >= self.max_files
            ) or (self.max_rows is not None and rows >= self.max_rows):
                break
        self._cursor = end
        return {"version": end}

    # -- planning -------------------------------------------------------
    def partitions(self, start, end):
        # the engine's true position: fast-forward the rate-limit
        # cursor (restart with backlog self-heals here)
        self._cursor = max(self._cursor, end["version"])
        parts: list[_AddFilePartition] = []
        for v in range(start["version"], end["version"]):
            try:
                c = _read_commit(self.path, v)
            except FileNotFoundError:
                raise ValueError(
                    f"lake_changes: commit v{v} was removed by log "
                    "retention mid-stream; restart from a newer "
                    "starting_version"
                )
            if c.get("op") in ("compact", "cluster", "set_partitioning"):
                continue  # layout maintenance moves bytes, not rows
            if (
                c.get("remove") or c.get("dv") or c.get("dv_reset")
            ) and not self.ignore_deletes:
                # dv_reset (restore across vectors) can change row
                # visibility with an EMPTY add/remove diff, so it must
                # trip the same guard as file removals and vectors
                raise ValueError(
                    f"lake_changes: commit v{v} ({c.get('op')}) removes "
                    "or positionally deletes rows; this source streams "
                    "appends — set ignore_deletes=true to stream added "
                    "files anyway (Delta ignoreChanges semantics)"
                )
            if self.with_row_ids:
                for f, b in c.get("row_base", {}).items():
                    self._row_base[f] = list(b)
            for rel in c.get("add", []):
                rb = None
                if self.with_row_ids:
                    rb = self._row_base.get(rel)
                    if rb is None:
                        raise ValueError(
                            f"lake_changes: no base row id for {rel!r} "
                            f"(commit v{v}) — the file predates row "
                            "tracking; start the stream at or after "
                            "the enabling commit"
                        )
                parts.append(
                    _AddFilePartition(
                        os.path.join(self.path, rel), rel, v, rb
                    )
                )
        return parts

    def commit(self, end):
        # the log is the source of truth; nothing to acknowledge —
        # but a completed batch is a position signal for the
        # rate-limit cursor
        self._cursor = max(self._cursor, end["version"])

    # -- executor-side read --------------------------------------------
    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.abs_path)
        n = tbl.num_rows
        # hive partition values live in the directory names
        part_vals: dict[str, str | None] = {}
        for seg in partition.rel_path.split(os.sep)[:-1]:
            if "=" in seg:
                col, raw = seg.split("=", 1)
                raw = unquote(raw)
                part_vals[col] = None if raw == HIVE_NULL else raw
        cols = []
        for field in self.schema.fields:
            phys = self.cmap.get(field.name, field.name)
            if field.name == "_commit_version":
                cols.append(
                    pa.array([partition.version] * n, type=pa.int64())
                )
            elif field.name == "_row_id" and partition.row_base:
                # base + row-index-in-file, unless the row carried a
                # materialized id through a rewrite
                base = int(partition.row_base[0])
                fresh = pa.array(
                    range(base, base + n), type=pa.int64()
                )
                if "_rt_row_id" in tbl.column_names:
                    import pyarrow.compute as pc

                    cols.append(
                        pc.coalesce(
                            tbl.column("_rt_row_id").combine_chunks(),
                            fresh,
                        )
                    )
                else:
                    cols.append(fresh)
            elif field.name == "_row_commit_version" and partition.row_base:
                dv = pa.array(
                    [int(partition.row_base[1])] * n, type=pa.int64()
                )
                if "_rt_row_ver" in tbl.column_names:
                    import pyarrow.compute as pc

                    cols.append(
                        pc.coalesce(
                            tbl.column("_rt_row_ver").combine_chunks(),
                            dv,
                        )
                    )
                else:
                    cols.append(dv)
            elif phys in tbl.column_names:
                col = tbl.column(phys)
                try:
                    want = _arrow_type(field.dataType)
                    if col.type != want:
                        # widened table: narrow files upcast to the
                        # declared (merged) schema type
                        col = col.cast(want)
                except TypeError:
                    pass  # complex type with no direct mapping
                cols.append(col)
            elif phys in part_vals:
                simple = field.dataType.simpleString()
                v = _parse_part_value(part_vals[phys], simple)
                cols.append(
                    pa.array([v] * n, type=_arrow_type(field.dataType))
                )
            else:
                # evolved column absent from this pre-evolution file
                cols.append(pa.nulls(n, type=_arrow_type(field.dataType)))
        yield from pa.Table.from_arrays(
            cols, names=[f.name for f in self.schema.fields]
        ).to_batches()


_DECIMAL_RE = __import__("re").compile(r"^decimal\((\d+),(\d+)\)$")


def _arrow_type(dt):
    """Arrow type for a Spark DataType. Raises on a type this source
    cannot restore (partition value) or null-fill (evolved column)
    rather than silently degrading to pa.string(), which would
    diverge from the declared output schema at executor read time
    with an opaque Arrow cast error. Complex types fall back to
    pyspark's own Spark->Arrow mapping."""
    import pyarrow as pa

    spark_simple = dt.simpleString()
    m = _DECIMAL_RE.match(spark_simple)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    t = {
        "string": pa.string(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
        "timestamp_ntz": pa.timestamp("us"),
    }.get(spark_simple)
    if t is None:
        try:
            from pyspark.sql.pandas.types import to_arrow_type

            return to_arrow_type(dt)
        except Exception:
            raise TypeError(
                f"lake_changes: unsupported column type "
                f"{spark_simple!r} for partition-value restore / "
                "evolved-column null fill"
            ) from None
    return t


def _parse_part_value(raw: str | None, spark_simple: str):
    """Decode one hive directory partition value to the python value
    matching the declared Spark type. Mirrors Spark's own partition
    path codec (`yyyy-MM-dd HH:mm:ss[.SSSSSS]` for timestamps, plain
    decimal strings for DECIMAL) so a timestamp- or decimal-
    partitioned lake streams with typed columns instead of raising
    at executor read time."""
    if raw is None:
        return None
    if spark_simple in ("bigint", "int", "smallint", "tinyint"):
        return int(raw)
    if spark_simple in ("double", "float"):
        return float(raw)
    if spark_simple == "boolean":
        return raw.lower() == "true"
    if spark_simple == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    if spark_simple in ("timestamp", "timestamp_ntz"):
        import datetime

        return datetime.datetime.fromisoformat(raw)
    if _DECIMAL_RE.match(spark_simple):
        import decimal

        return decimal.Decimal(raw)
    if spark_simple == "string":
        return raw
    raise TypeError(
        f"lake_changes: unsupported partition column type "
        f"{spark_simple!r} (value {raw!r})"
    )


class LakeChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lake_changes"

    def schema(self) -> StructType:
        base = _table_schema(self.options["path"])
        rt = (
            str(self.options.get("with_row_ids", "false")).lower()
            == "true"
        )
        return StructType(
            [
                # force nullable: a column evolved in at commit N is
                # null-filled on files from commits < N regardless of
                # how strictly its introducing batch typed it
                *[
                    StructField(f.name, f.dataType, True, f.metadata)
                    for f in base.fields
                ],
                StructField("_commit_version", LongType()),
                *(
                    [
                        StructField("_row_id", LongType()),
                        StructField("_row_commit_version", LongType()),
                    ]
                    if rt
                    else []
                ),
            ]
        )

    def streamReader(self, schema):
        return LakeChangesStreamReader(self.options, schema)


def register_lake_changes_source(spark) -> None:
    """Idempotently register the ``lake_changes`` format."""
    spark.dataSource.register(LakeChangesDataSource)


# ---------------------------------------------------------------------------
# availableNow drain for rate-limited streams (r12, VERDICT directive 4).
#
# Delta's Trigger.AvailableNow + maxFilesPerTrigger drains a whole
# backlog as a ladder of bounded batches in ONE invocation because the
# JVM source speaks the ReadLimit handshake. The Python data-source API
# has no such handshake, so here one availableNow run snapshots ONE
# capped latestOffset() and consumes a single cap step (the documented
# caveat above). drain_available() closes the usability gap: it loops
# availableNow passes over a SHARED checkpoint until the committed
# offset stops advancing. The checkpoint is what makes the ladder
# exactly-once across passes — a replayed pass re-plans the same batch
# from the same offsets, and immutable commits re-read the same bytes.
# ---------------------------------------------------------------------------


def _latest_checkpoint_entry(checkpoint_dir: str, sub: str) -> tuple | None:
    """(batch_id, file content) of the newest entry in a checkpoint
    metadata log (``offsets`` / ``commits``), or None if empty."""
    d = os.path.join(checkpoint_dir, sub)
    if not os.path.isdir(d):
        return None
    ids = [int(f) for f in os.listdir(d) if f.isdigit()]
    if not ids:
        return None
    top = max(ids)
    with open(os.path.join(d, str(top))) as fh:
        return (top, fh.read())


def drain_available(
    stream_fn,
    checkpoint_dir: str,
    max_passes: int = 10_000,
    timeout_per_pass: float = 600.0,
) -> int:
    """Fully drain a (possibly rate-limited) backlog with availableNow
    passes — the one-invocation equivalent of Delta's
    ``Trigger.AvailableNow`` + ``maxFilesPerTrigger`` ladder.

    ``stream_fn()`` must START and return a fresh ``StreamingQuery``
    each call: same source, same sink, same ``checkpointLocation=``
    ``checkpoint_dir``, ``trigger(availableNow=True)``. The helper
    runs passes back-to-back; each consumes one cap step (one bounded
    micro-batch), and the loop ends when a pass commits nothing new —
    detected from the checkpoint's own metadata log, not from sink
    row counts, so an empty-by-design batch still terminates and a
    slow sink never false-stops. Exactly-once across passes is the
    checkpoint's guarantee; the helper adds no state of its own.

    Returns the total number of committed micro-batches in the
    checkpoint (across ALL passes, including any earlier run that
    shared it). Raises ``RuntimeError`` after ``max_passes`` without
    quiescence — a backlog that outruns the cap forever is a sizing
    bug the caller should see, not an infinite loop."""
    prev = _latest_checkpoint_entry(checkpoint_dir, "commits")
    for _ in range(max_passes):
        q = stream_fn()
        try:
            # availableNow self-terminates at its snapshotted end
            if not q.awaitTermination(timeout_per_pass):
                raise RuntimeError(
                    f"availableNow pass exceeded {timeout_per_pass}s "
                    "without terminating"
                )
        finally:
            q.stop()
        cur = _latest_checkpoint_entry(checkpoint_dir, "commits")
        if cur == prev:
            return (cur[0] + 1) if cur is not None else 0
        prev = cur
    raise RuntimeError(
        f"backlog did not quiesce within {max_passes} availableNow "
        "passes (cap too small for the ingest rate?)"
    )
