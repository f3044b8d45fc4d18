"""Custom Python DataSource (Spark 4 DataSource API) — [ext] source surface.

``synthetic_docs``: a deterministic, partitioned document generator
registered as a first-class ``spark.read.format(...)`` source. This is the
idiomatic Spark-4 replacement for the driver-side "build a list, then
``createDataFrame``" pattern: partitions generate rows INSIDE executor
tasks, so a 10⁹-row synthetic corpus never exists on the driver, and the
generator parallelism is just the ``partitions`` option.

Three API surfaces demonstrated, all production-relevant:

- ``partitions()`` — splits the id range into executor-side tasks
  (the scale lever: generation is embarrassingly parallel);
- ``pushFilters()`` — accepts ``EqualTo``/``GreaterThan`` on ``doc_id`` so
  point/range reads skip generating non-matching partitions entirely
  (partition pruning inside a Python source);
- ``read()`` — yields pyarrow ``RecordBatch``es (the vectorized Arrow
  path), not per-row tuples.

Everything is hash-deterministic: same options ⇒ identical rows on every
read, any partitioning, any cluster — the property the dedup/ANN tests
rely on for synthetic fixtures.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    WriterCommitMessage,
)

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window stream filter column vector query group order data dup"
).split()
_LANGS = ("en", "de", "fr", "es")

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _word(doc_id: int, j: int) -> str:
    h = hashlib.md5(f"{doc_id}:{j}".encode()).digest()
    return _VOCAB[h[0] % len(_VOCAB)]


def _row(doc_id: int) -> tuple[int, str, str, str, int]:
    h = hashlib.md5(f"doc:{doc_id}".encode()).digest()
    n_words = 5 + h[1] % 20
    text = " ".join(_word(doc_id, j) for j in range(n_words))
    return (
        doc_id,
        text,
        _LANGS[h[2] % len(_LANGS)],
        f"src{h[3] % 5}",
        len(text),
    )


@dataclass
class _IdRange(InputPartition):
    start: int
    end: int


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("partitions", 8))
        # doc_id bounds refined by pushed filters (partition pruning)
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept doc_id point/range predicates; everything else stays with
        Spark (returned = unsupported, evaluated post-scan as usual)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("doc_id",):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan) and f.attribute == ("doc_id",):
                self.lo = max(self.lo, int(f.value) + 1)
            else:
                yield f

    def partitions(self) -> list[_IdRange]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_partitions)
        span = max(1, (hi - lo + n - 1) // n)
        out = []
        for s in range(lo, hi, span):
            out.append(_IdRange(s, min(s + span, hi)))
        return out or [_IdRange(0, 0)]

    def read(self, partition: _IdRange):  # -> Iterator[pyarrow.RecordBatch]
        import pyarrow as pa

        rows = [_row(i) for i in range(partition.start, partition.end)]
        if not rows:
            return iter(())
        cols = list(zip(*rows))
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], pa.int64()),
                pa.array(cols[1], pa.string()),
                pa.array(cols[2], pa.string()),
                pa.array(cols[3], pa.string()),
                pa.array(cols[4], pa.int64()),
            ],
            names=["doc_id", "text", "lang", "source", "n_chars"],
        )
        return iter([batch])


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    """Idempotent registration: ``spark.read.format('synthetic_docs')``.

    A reader implementing ``pushFilters`` requires
    ``spark.sql.python.filterPushdown.enabled`` (a runtime SQL conf, off by
    default in Spark 4.1); set it here so the source works on ANY session,
    not just ones from our factory."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Streaming half of the API: a micro-batch event generator with offsets.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("view", "click", "purchase")
_EVENTS_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _event_row(i: int) -> tuple[int, int, str, float]:
    h = hashlib.md5(f"ev:{i}".encode()).digest()
    return (
        i,
        h[0] % 50,
        _EVENT_TYPES[h[1] % len(_EVENT_TYPES)],
        round(int.from_bytes(h[2:4], "big") / 655.36, 4),  # 0..100
    )


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset-managed micro-batch source: each trigger advances the offset
    by ``rows_per_batch`` ids; ``partitions(start, end)`` splits the id range
    into executor tasks; generation is hash-deterministic, so a replayed
    range (checkpoint recovery) yields byte-identical rows — the property
    that makes the source exactly-once under retries.

    Reader-local offset state lives on the driver for the lifetime of one
    query run; across restarts Spark supplies the checkpointed ``start``,
    and ranges already committed are simply never asked for again."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_partitions = int(options.get("partitions", 4))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._current += self.rows_per_batch
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [_IdRange(0, 0)]
        n = max(1, self.n_partitions)
        span = max(1, (hi - lo + n - 1) // n)
        return [_IdRange(s, min(s + span, hi)) for s in range(lo, hi, span)]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield _event_row(i)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: ranges are recomputable by construction


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _EVENTS_SCHEMA

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_events(spark) -> None:
    """Idempotent registration: ``spark.readStream.format('synthetic_events')``."""
    spark.dataSource.register(SyntheticEventsDataSource)


# ---- jsonl_dir: Python DataSource WRITER with an atomic commit protocol ----

_MANIFEST = "_MANIFEST.json"


def _parse_flat_ddl(ddl: str):
    """Session-free parser for the legacy manifest's flat DDL schema
    ("id bigint, name string, tags array<string>"). Splits on top-level
    commas only (angle-bracket depth aware) so array/map element types
    survive; nested structs were never legal in legacy manifests (the
    writer rejected them)."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        MapType,
        ShortType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    atomic = {
        "string": StringType(),
        "bigint": LongType(),
        "long": LongType(),
        "int": IntegerType(),
        "integer": IntegerType(),
        "smallint": ShortType(),
        "short": ShortType(),
        "double": DoubleType(),
        "float": FloatType(),
        "boolean": BooleanType(),
        "binary": BinaryType(),
        "date": DateType(),
        "timestamp": TimestampType(),
    }

    def parse_type(t: str):
        t = t.strip().lower()
        if t in atomic:
            return atomic[t]
        if t.startswith("decimal(") and t.endswith(")"):
            p, s = t[len("decimal(") : -1].split(",")
            return DecimalType(int(p), int(s))
        if t.startswith("array<") and t.endswith(">"):
            return ArrayType(parse_type(t[len("array<") : -1]))
        if t.startswith("map<") and t.endswith(">"):
            inner = t[len("map<") : -1]
            depth = 0
            for i, ch in enumerate(inner):
                if ch in "<(":
                    depth += 1
                elif ch in ">)":
                    depth -= 1
                elif ch == "," and depth == 0:
                    return MapType(parse_type(inner[:i]), parse_type(inner[i + 1 :]))
        raise ValueError(f"legacy jsonl_dir manifest: unsupported DDL type {t!r}")

    # split on top-level commas only: both angle brackets (array/map) and
    # parentheses (decimal(p,s)) nest commas that must not split fields
    fields = []
    depth = 0
    start = 0
    parts = []
    for i, ch in enumerate(ddl):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(ddl[start:i])
            start = i + 1
    parts.append(ddl[start:])
    for part in parts:
        name, _, typ = part.strip().partition(" ")
        fields.append(StructField(name.strip(), parse_type(typ)))
    return StructType(fields)


@dataclass
class _FileCommit(WriterCommitMessage):
    """WriterCommitMessage payload: one temp file written by one task."""

    tmp_path: str
    rows: int


class JsonlDirWriter(DataSourceWriter):
    """Task-side writer: each task writes a uniquely-named TEMP file and
    returns it in its commit message. Nothing becomes visible until the
    driver's ``commit()`` renames the temp files and writes the manifest —
    so a retried/zombie task's orphan file is simply never manifested.
    This mirrors the manifest-as-atomic-pointer idea of cloud-storage
    committers, but unlike those it RELIES on driver and executors sharing
    one local filesystem (``os.replace`` of a task-written temp path on
    the driver): local mode / shared-NFS only. A cloud deployment would
    write temp objects and commit by manifest without renames.

    ``mode("overwrite")`` replaces the directory's committed contents
    (old part files are deleted at commit). ``mode("append")`` writes
    fresh uniquely-named part files and MERGES them into the existing
    manifest — prior committed rows stay visible."""

    def __init__(self, options: dict, schema_json: str, field_names: list[str], overwrite: bool) -> None:
        self.path = options["path"]
        self.schema_json = schema_json
        self.field_names = field_names
        self.overwrite = overwrite
        # batch id distinguishes this commit's part files from any prior
        # append's (task files are temp-named; finals get the batch prefix)
        import uuid

        self.batch_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.field_names, row))) + "\n")
                n += 1
        return _FileCommit(tmp_path=tmp, rows=n)

    def commit(self, messages) -> None:
        # SINGLE-WRITER-PER-PATH contract (like the local-FS caveat in the
        # class docstring): append does a read-modify-write of the
        # manifest with no lock, so two concurrent append jobs on the same
        # path can interleave and one batch's files drop from the manifest
        # (orphaned but invisible — the reader is manifest-driven, so no
        # wrong rows, just lost writes). Serialize appends externally.
        import json
        import os

        manifest_path = os.path.join(self.path, _MANIFEST)
        prior = None
        if os.path.exists(manifest_path):
            with open(manifest_path, encoding="utf-8") as fh:
                prior = json.load(fh)

        # validate BEFORE any rename so a rejected commit leaves no
        # orphaned part files — only temp files, which we remove here
        if (
            not self.overwrite
            and prior is not None
            and prior["columns"] != self.field_names
        ):
            for msg in messages:
                try:
                    os.remove(msg.tmp_path)
                except FileNotFoundError:
                    pass
            raise ValueError(
                f"jsonl_dir append: column mismatch — committed "
                f"{prior['columns']}, appending {self.field_names}"
            )

        finals = []
        total = 0
        for i, msg in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{self.batch_id}-{i:05d}.jsonl"
            )
            os.replace(msg.tmp_path, final)
            finals.append(os.path.basename(final))
            total += msg.rows

        if self.overwrite:
            # drop the previously committed files; the new manifest is the
            # atomic switch, so delete AFTER it lands
            old_files = list(prior["files"]) if prior else []
            manifest = {
                "schema_json": self.schema_json,
                "files": finals,
                "rows": total,
                "columns": self.field_names,
            }
        else:
            old_files = []
            manifest = {
                "schema_json": self.schema_json,
                "files": (prior["files"] if prior else []) + finals,
                "rows": (prior["rows"] if prior else 0) + total,
                "columns": self.field_names,
            }
        tmp_manifest = manifest_path + ".tmp"
        with open(tmp_manifest, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp_manifest, manifest_path)
        for name in old_files:
            if name in finals:  # paranoia: never delete a just-committed file
                continue
            try:
                os.remove(os.path.join(self.path, name))
            except FileNotFoundError:
                pass

    def abort(self, messages) -> None:
        import os

        for msg in messages:
            try:
                os.remove(msg.tmp_path)
            except FileNotFoundError:
                pass


class JsonlDirReader(DataSourceReader):
    """Committed-files-only read path: rows come from exactly the files the
    manifest names — uncommitted temp files are invisible even if they
    survived a crash."""

    def __init__(self, options: dict) -> None:
        import json
        import os

        self.path = options["path"]
        with open(os.path.join(self.path, _MANIFEST), encoding="utf-8") as fh:
            self.manifest = json.load(fh)

    def partitions(self):
        return [InputPartition(f) for f in self.manifest["files"]]

    def read(self, partition):
        import json
        import os

        cols = self.manifest["columns"]
        with open(os.path.join(self.path, partition.value), encoding="utf-8") as fh:
            for line in fh:
                rec = json.loads(line)
                yield tuple(rec[c] for c in cols)


class JsonlDirDataSource(DataSource):
    """``jsonl_dir``: manifest-committed JSONL directory (batch write+read)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def schema(self):
        import json
        import os

        from pyspark.sql.types import StructType

        with open(os.path.join(self.options["path"], _MANIFEST), encoding="utf-8") as fh:
            manifest = json.load(fh)
        # schema.json() round-trips ANY type (nested structs/maps/arrays);
        # the previous simpleString munging corrupted non-flat schemas.
        # Directories written before the schema_json migration carry a DDL
        # string under the legacy 'schema' key — honor both.
        if "schema_json" in manifest:
            return StructType.fromJson(json.loads(manifest["schema_json"]))
        if "schema" in manifest:
            # legacy manifests hold a FLAT DDL string (the old writer's
            # simpleString output). StructType.fromDDL needs a live
            # SparkSession, which this hook may not have (it can run in a
            # sessionless Python worker) — parse the flat form directly.
            return _parse_flat_ddl(manifest["schema"])
        raise ValueError(
            f"jsonl_dir manifest at {self.options['path']!r} has neither "
            "'schema_json' nor legacy 'schema' — not a jsonl_dir directory?"
        )

    def reader(self, schema) -> JsonlDirReader:
        return JsonlDirReader(self.options)

    @staticmethod
    def _validate_schema(schema) -> None:
        from pyspark.sql.types import ArrayType, MapType, StructType

        # the JSONL value encoding covers atomics and arrays/maps OF
        # atomics; struct-typed fields would hit json.dumps as Row objects
        # task-side — reject them here with a clear contract error
        for f in schema.fields:
            t = f.dataType
            inner = (
                t.elementType if isinstance(t, ArrayType)
                else t.valueType if isinstance(t, MapType)
                else t
            )
            if isinstance(t, StructType) or isinstance(
                inner, (StructType, ArrayType, MapType)
            ):
                raise ValueError(
                    f"jsonl_dir: unsupported field type for {f.name!r}: "
                    f"{t.simpleString()} (atomics and arrays/maps of "
                    "atomics only)"
                )

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        self._validate_schema(schema)
        return JsonlDirWriter(
            self.options,
            schema.json(),
            [f.name for f in schema.fields],
            overwrite,
        )

    def streamWriter(self, schema, overwrite: bool) -> "JsonlDirStreamWriter":
        self._validate_schema(schema)
        return JsonlDirStreamWriter(
            self.options, schema.json(), [f.name for f in schema.fields]
        )


class JsonlDirStreamWriter(DataSourceStreamWriter):
    """Streaming half of the ``jsonl_dir`` sink: one manifest-committed
    batch of part files per epoch, EXACTLY-ONCE under replay.

    Tasks write temp files and return commit messages (same shape as the
    batch writer); the driver-side ``commit(messages, batchId)`` renames
    them to epoch-prefixed part names and merges the manifest — unless
    the manifest already records ``batchId``, in which case the epoch is
    a post-failure REPLAY and its files are discarded instead of
    double-appended (generation is deterministic upstream, so the
    already-committed rows are the same rows). Same single-writer-per-
    path and local-FS contracts as the batch writer. The manifest's
    epoch list grows one entry per trigger — long-running deployments
    would compact it to a high-watermark (only the max batchId matters
    for replay detection, since Spark replays at most the LAST epoch);
    kept explicit here for auditability at test scale."""

    def __init__(self, options: dict, schema_json: str, field_names: list[str]) -> None:
        self.path = options["path"]
        self.schema_json = schema_json
        self.field_names = field_names

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.field_names, row))) + "\n")
                n += 1
        return _FileCommit(tmp_path=tmp, rows=n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest_path = os.path.join(self.path, _MANIFEST)
        prior = None
        if os.path.exists(manifest_path):
            with open(manifest_path, encoding="utf-8") as fh:
                prior = json.load(fh)
        committed_epochs = list(prior.get("epochs", [])) if prior else []
        if batchId in committed_epochs:
            # replayed epoch: drop the duplicate temp files, keep manifest
            for msg in messages:
                try:
                    os.remove(msg.tmp_path)
                except FileNotFoundError:
                    pass
            return
        finals = []
        total = 0
        for i, msg in enumerate(messages):
            final = os.path.join(
                self.path, f"part-e{batchId:08d}-{i:05d}.jsonl"
            )
            os.replace(msg.tmp_path, final)
            finals.append(os.path.basename(final))
            total += msg.rows
        manifest = {
            "schema_json": self.schema_json,
            "files": (prior["files"] if prior else []) + finals,
            "rows": (prior["rows"] if prior else 0) + total,
            "columns": self.field_names,
            "epochs": committed_epochs + [batchId],
        }
        tmp_manifest = manifest_path + ".tmp"
        with open(tmp_manifest, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp_manifest, manifest_path)

    def abort(self, messages, batchId: int) -> None:
        import os

        for msg in messages:
            try:
                os.remove(msg.tmp_path)
            except FileNotFoundError:
                pass


def register_jsonl_dir(spark) -> None:
    """Idempotent registration of the ``jsonl_dir`` batch write+read source."""
    spark.dataSource.register(JsonlDirDataSource)


def vacuum_jsonl_dir(path: str) -> list[str]:
    """Delete files a ``jsonl_dir`` directory holds but its manifest does
    not reference: leftover ``_tmp-*`` task files from crashed/zombie
    writers and part files orphaned by an interleaved concurrent append
    (see the single-writer contract on ``JsonlDirWriter.commit``). The
    manifest-driven reader never sees these, so vacuuming only reclaims
    space — it cannot change query results. Returns the removed names.

    Run only while no write is in flight (an in-flight writer's temp
    files look like orphans)."""
    import json
    import os

    with open(os.path.join(path, _MANIFEST), encoding="utf-8") as fh:
        manifest = json.load(fh)
    keep = set(manifest["files"]) | {_MANIFEST}
    removed = []
    for name in sorted(os.listdir(path)):
        if name in keep or not (
            name.startswith("_tmp-") or name.startswith("part-")
        ):
            continue
        os.remove(os.path.join(path, name))
        removed.append(name)
    return removed
