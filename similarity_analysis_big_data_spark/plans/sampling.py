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


WRS_K = 50  # weighted sample size
WRS_M = 2_147_483_647  # uniform-grid modulus (2^31 - 1)


@register(
    "weighted_reservoir_sample",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   ln(CAST(1 + ({md5_long_sql("'wrs:' || CAST(doc_id AS VARCHAR)")}
                               % {WRS_M}) AS DOUBLE) / {WRS_M + 1})
                       / n_chars AS sort_key
            FROM documents
        )
        SELECT doc_id, lang, n_chars, round(sort_key, 9) AS sort_key
        FROM keyed
        ORDER BY sort_key DESC, doc_id
        LIMIT {WRS_K}
    """,
    doc=f"[ext] weighted sampling without replacement (Efraimidis–Spirakis "
    f"A-ES): top-{WRS_K} documents by ln(u)/weight with u a DETERMINISTIC "
    "md5-derived uniform, weight = n_chars — longer documents "
    "proportionally likelier, yet the exact member set is reproducible on "
    "any engine/partitioning and oracle-checked (a seeded rand() can "
    "promise neither).",
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: compiles to TakeOrderedAndProject — each task keeps its local
    top-K and only K rows per task merge at the coordinator; no global
    sort, no full shuffle, one pass. That IS the distributed reservoir:
    A-ES's per-item keys make 'take the K largest keys' equivalent to
    sequential weighted sampling, so the order-sensitive classic algorithm
    becomes an order-free, mergeable top-K."""
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string")))
    u = (1 + h % WRS_M).cast("double") / F.lit(float(WRS_M + 1))
    key = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            key.alias("sort_key"),
        )
        .orderBy(F.desc("sort_key"), F.asc("doc_id"))
        .limit(WRS_K)
        .withColumn("sort_key", F.round("sort_key", 9))
    )
