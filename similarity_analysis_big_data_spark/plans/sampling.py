"""Deterministic sampling / split assignment (north-star [ext]).

Training-data pipelines need REPRODUCIBLE sampling: the same document must
land in the same split on every run, on any cluster layout, with no seed
shipped around. ``rand()``-based sampling can't promise that (row order and
partitioning leak in); hashing the key can. Both queries use the
cross-engine md5 hash family (functions/hashing.py), so the exact member
set — not just the sample rate — is oracle-checked against DuckDB.

Scale: a hash-mod predicate is a narrow map — no shuffle, no state, prunes
before any downstream join. At 100 TB this is THE way to carve train/val/
test or per-stratum subsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql
from ..sources.readers import load_table
from .registry import register

TRAIN_PCT = 80
VAL_PCT = 10  # test = the remaining 10


@register(
    "train_val_test_split",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, lang,
                   {md5_long_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
            FROM documents
        )
        SELECT doc_id, lang, bucket,
               CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                    WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    doc="[ext] deterministic 80/10/10 train/val/test assignment: md5(doc_id) "
    "mod 100 — reproducible across runs/engines/partitionings, no seed, no "
    "shuffle; the full member assignment is oracle-checked.",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(F.col("bucket") < TRAIN_PCT, "train")
        .when(F.col("bucket") < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", bucket.alias("bucket")).withColumn(
        "split", split
    )


@register(
    "stratified_sample_by_lang",
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {md5_long_sql("lang || ':' || CAST(doc_id AS VARCHAR)")} % 5 = 0
    """,
    doc="[ext] deterministic stratified sampling: ~20% of EACH lang stratum "
    "via md5(lang:doc_id) mod 5 — the hash key includes the stratum so "
    "per-stratum rates stay independent; exact member set oracle-checked "
    "(the scalable twin of sampleBy, which is seed/partition-dependent).",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: predicate-only — no shuffle, prunes at the scan boundary; the
    stratum-salted key avoids correlated membership across strata (the same
    doc_id is not privileged in every language)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))
    return docs.filter(md5_long(key) % 5 == 0).select("doc_id", "lang", "source")
