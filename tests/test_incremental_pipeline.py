"""Multi-batch incremental ingest integration test.

Simulates three "daily" batches flowing through the production dedup
story: each batch exact-dedups against the materialized digest store,
then near-dup-probes the materialized LSH band index (base x delta only),
and the accepted docs are appended to both state tables — parquet between
runs, exactly as a scheduler would operate the engine. Asserts the
invariants the batch queries can't see on their own:

- no accepted doc exactly duplicates an earlier-accepted doc;
- no accepted doc near-duplicates (exact Jaccard >= 0.5) an
  earlier-accepted doc;
- replaying a batch against the updated state accepts ZERO docs
  (idempotent ingest — the at-least-once scheduler case).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from similarity_analysis_big_data_spark.functions.text import tokenize
from similarity_analysis_big_data_spark.operators.dedup import (
    jaccard_pairs,
    lsh_band_entries,
    minhash_signatures,
)
from similarity_analysis_big_data_spark.sources.readers import load_table

JACCARD_T = 0.5


def _toks(docs):
    return docs.select(
        "doc_id", F.array_distinct(tokenize(F.lower("text"))).alias("toks")
    )


def _shingles(docs):
    return _toks(docs).select("doc_id", F.explode("toks").alias("shingle"))


def _band_index(docs):
    return lsh_band_entries(minhash_signatures(_shingles(docs), "doc_id"), "doc_id")


def _ingest_batch(spark, batch, state_dir):
    """One scheduler tick: returns accepted docs and appends state."""
    import os

    digest_path = os.path.join(state_dir, "digests")
    index_path = os.path.join(state_dir, "band_index")
    accepted_path = os.path.join(state_dir, "accepted")

    batch = batch.withColumn("digest", F.md5("text"))
    # exact dedup within the batch (keep min doc_id) and vs the store
    w_min = F.min("doc_id").over(W.partitionBy("digest"))
    batch = batch.withColumn("_k", w_min).filter(F.col("doc_id") == F.col("_k")).drop("_k")
    if os.path.exists(digest_path):
        store = spark.read.parquet(digest_path)
        batch = batch.join(store, "digest", "left_anti")

    # near-dup probe: batch band entries vs the stored index
    batch_bands = _band_index(batch)
    if os.path.exists(index_path):
        index = spark.read.parquet(index_path)
        cand = (
            index.withColumnRenamed("doc_id", "id_l")
            .join(batch_bands.withColumnRenamed("doc_id", "id_r"), ["band", "key"])
            .select("id_l", "id_r")
            .distinct()
        )
        # verify against the union of accepted + batch shingles
        accepted = spark.read.parquet(accepted_path)
        sh = _shingles(accepted.unionByName(batch.select("doc_id", "text")))
        dup = (
            jaccard_pairs(sh, "doc_id", candidates=cand)
            .filter(F.col("jaccard") >= JACCARD_T)
            .select(F.col("id_r").alias("doc_id"))
            .distinct()
        )
        batch = batch.join(dup, "doc_id", "left_anti")

    # append state
    batch.select("digest").write.mode("append").parquet(digest_path)
    _band_index(batch).write.mode("append").parquet(index_path)
    batch.drop("digest").write.mode("append").parquet(accepted_path)
    return batch


def test_incremental_ingest_three_batches(spark, sf_smoke, tmp_path):
    import os

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    os.makedirs(state)

    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    accepted_counts = []
    for b in batches:
        out = _ingest_batch(spark, b, state)
        accepted_counts.append(out.count())
    assert accepted_counts[0] > 0

    accepted = spark.read.parquet(os.path.join(state, "accepted"))
    n_accepted = accepted.count()
    assert n_accepted == sum(accepted_counts)

    # invariant 1: no exact duplicates among accepted docs
    n_digests = accepted.select(F.md5("text").alias("d")).distinct().count()
    assert n_digests == n_accepted

    # invariant 2: no near-dup pair among accepted docs COLLIDING IN THE
    # INDEX (the recall contract of LSH ingest: pairs the band index can
    # see must have been rejected; pairs no band catches are the
    # documented LSH recall trade, same as the batch pipeline's)
    sh = _shingles(accepted)
    bands = _band_index(accepted)
    l = bands.withColumnRenamed("doc_id", "id_l")
    r = bands.withColumnRenamed("doc_id", "id_r")
    colliding = (
        l.join(r, ["band", "key"])
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .distinct()
    )
    near = jaccard_pairs(sh, "doc_id", candidates=colliding).filter(
        (F.col("jaccard") >= JACCARD_T)
        # same-batch survivors may near-dup each other (intra-batch near-dup
        # is the batch pipeline's job, covered by near_dup_survivors); the
        # INGEST invariant is strictly cross-batch
        & ((F.col("id_l") % 3) != (F.col("id_r") % 3))
    )
    assert near.count() == 0, near.limit(5).collect()

    # invariant 3: replaying batch 1 accepts nothing (idempotence)
    replay = _ingest_batch(spark, batches[1], state)
    assert replay.count() == 0
