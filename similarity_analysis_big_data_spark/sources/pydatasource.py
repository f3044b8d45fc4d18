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
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
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
