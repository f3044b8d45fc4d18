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


@register(
    "multimodal_fake_features",
    oracle=None,  # mapInPandas path; value semantics pinned by unit tests
    doc="[ext] Arrow-batched feature extraction over binary payloads "
    "(mapInPandas; decode stubbed behind a deterministic fake — the Spark "
    "plumbing, schema and batching are real).",
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    return extract_features(payloads)
