"""Registered multimodal queries (north-star [ext]).

``multimodal_binary_metadata`` is pure column math on the payload bytes, so
it gets a full DuckDB oracle. ``multimodal_fake_features`` crosses into the
Arrow/pandas worker (mapInPandas) — rows-only check here, with the value
semantics pinned by unit tests (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, extract_features
from ..sources.readers import load_table
from .registry import register


@register(
    "multimodal_binary_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest,
               substr(text, 1, 4) AS header_text
        FROM documents
    """,
    doc="[ext] opaque-binary metadata extraction: payload size, content digest, "
    "header probe — the typed-metadata side of a multimodal column.",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    return payloads.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.decode(F.expr("substring(payload, 1, 4)"), "UTF-8").alias("header_text"),
    )


def _md5_byte_sql(i: int) -> str:
    """DuckDB SQL for byte ``i`` of md5(text) as a BIGINT (hex-pair decode
    via strpos — portable, no 0x-cast dependence)."""
    hi = f"strpos('0123456789abcdef', substr(md5(text), {2 * i + 1}, 1)) - 1"
    lo = f"strpos('0123456789abcdef', substr(md5(text), {2 * i + 2}, 1)) - 1"
    return f"CAST(({hi}) * 16 + ({lo}) AS BIGINT)"


_FAKE_FEATURES_ORACLE = (
    "SELECT doc_id,\n"
    "       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,\n"
    "       substr(lower(hex(encode(text))), 1, 8) AS header,\n"
    + ",\n".join(f"       {_md5_byte_sql(i)} AS f{i}" for i in range(8))
    + "\nFROM documents"
)


@register(
    "multimodal_fake_features",
    # The fake decoder's feature i is float32(md5_byte_i / 255); multiplying
    # back by 255 and rounding recovers the exact byte (float32 error « 0.5),
    # so the mapInPandas output is checkable against a pure-SQL md5 decode.
    oracle=_FAKE_FEATURES_ORACLE,
    doc="[ext] Arrow-batched feature extraction over binary payloads "
    "(mapInPandas; decode stubbed behind a deterministic fake — the Spark "
    "plumbing, schema and batching are real). Registered surface emits the "
    "features as exact integer bytes f0..f7 so the output is scalar-sortable "
    "AND fully oracle-checked; the raw array<float> form stays available via "
    "operators.multimodal.extract_features for downstream ANN.",
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    feats = extract_features(payloads)
    byte_cols = [
        F.round(F.element_at("feature", i + 1).cast("double") * 255.0, 0)
        .cast("long")
        .alias(f"f{i}")
        for i in range(8)
    ]
    return feats.select("doc_id", "n_bytes", "header", *byte_cols)


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH sizes AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames
            FROM documents
        ),
        idx AS (
            SELECT doc_id, n_bytes, n_frames,
                   unnest(range(0, n_frames, 4)) AS frame_idx
            FROM sizes
        )
        SELECT doc_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(least(16, n_bytes - frame_idx * 16) AS BIGINT) AS frame_bytes,
               n_frames
        FROM idx
    """,
    doc="[ext] video-style frame sampling (every 4th 16-byte chunk) through the "
    "row-EXPANDING mapInPandas path; the emitted frame METADATA (index, size, "
    "count) is oracle-checked — the bytes themselves are pinned by unit tests "
    "(DuckDB substr is character-based, so byte slices of multibyte text "
    "can't cross engines).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    return sample_frames(payloads, frame_bytes=16, every_n=4).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length("frame").cast("long").alias("frame_bytes"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )
