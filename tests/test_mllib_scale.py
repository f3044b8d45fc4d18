"""Property tests for the MLlib scale-path operators.

No oracle (MLlib hashing/ln-IDF are engine-specific); the contracts:
- LSH approx join finds the known high-Jaccard pairs (recall on dups)
- reported distances match exact Jaccard
- TF-IDF vectors are unit-norm after the Normalizer
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.ml.functions import vector_to_array

from similarity_analysis_big_data_spark.functions.text import tokenize
from similarity_analysis_big_data_spark.operators.mllib_scale import (
    minhash_approx_join,
    random_projection_neighbors,
    tfidf_vectors_mllib,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "completely different content about spark engines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return df.withColumn("tokens", tokenize(F.lower("text")))


def test_minhash_approx_join_recall_and_distances(docs):
    pairs = {
        (r["id_l"], r["id_r"]): r["jaccard_distance"]
        for r in minhash_approx_join(docs, "tokens", "doc_id", jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == pytest.approx(0.0)
    assert (1, 3) in pairs and pairs[(1, 3)] == pytest.approx(1 - 7 / 9)
    assert (1, 4) not in pairs  # disjoint vocab -> never a candidate


def test_mllib_tfidf_unit_norm(docs):
    out = tfidf_vectors_mllib(docs, "tokens")
    norms = out.select(
        F.sqrt(
            F.aggregate(
                F.transform(vector_to_array("features"), lambda x: x * x),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ).alias("n")
    ).collect()
    for r in norms:
        assert r["n"] == pytest.approx(1.0, abs=1e-9)


def test_random_projection_self_join(spark):
    rows = [(i, [float(i), float(i % 3)]) for i in range(20)]
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [(i, Vectors.dense(v)) for i, v in rows], ["vec_id", "features"]
    )
    out = random_projection_neighbors(df, "features", "vec_id", max_distance=1.5)
    got = {(r["id_l"], r["id_r"]) for r in out.collect()}
    assert (0, 1) in got  # distance ~1.41
    assert all(abs(a - b) <= 3 for a, b in got)  # far pairs excluded
