"""MLlib scale-path operators (SURVEY §2.9 M3/M4 [ext], §7 step 6).

The exact sklearn-formula TF-IDF (functions/tfidf.py) is the parity path;
these are the *approximate-at-scale* alternatives the survey prescribes for
100 TB: fixed-width hashed features, MLlib IDF, and LSH
``approxSimilarityJoin`` candidate generation. They are deliberately NOT
oracle-checkable (MLlib's murmur hashing and ln-based IDF differ from any
portable SQL), so their correctness contract is property-based
(tests/test_mllib_scale.py): LSH candidates ⊇ high-similarity pairs,
distances agree with exact Jaccard on the candidates.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    CountVectorizer,
    IDF,
    MinHashLSH,
    Normalizer,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_vectorize(
    docs: DataFrame, tokens_col: str, out_col: str = "tf_vec", vocab_size: int = 1 << 18
) -> tuple[DataFrame, "CountVectorizer"]:
    """M3 scale path: bounded-vocabulary sparse count vectors.

    CountVectorizer keeps an explicit vocabulary (reversible, unlike
    HashingTF) capped at ``vocab_size`` — at 100 TB the cap bounds driver
    memory and the model broadcast.
    """
    cv = CountVectorizer(inputCol=tokens_col, outputCol=out_col, vocabSize=vocab_size)
    model = cv.fit(docs)
    return model.transform(docs), model


def tfidf_vectors_mllib(
    docs: DataFrame, tokens_col: str, out_col: str = "features"
) -> DataFrame:
    """M3 scale path: CountVectorizer -> IDF -> L2 Normalizer.

    Note: MLlib IDF is ln((n+1)/(df+1)) with no +1 — NOT the reference's
    formula (SURVEY §7 known-hard); use functions/tfidf.py for parity.
    """
    vectorized, _ = count_vectorize(docs, tokens_col, "tf_vec")
    idf = IDF(inputCol="tf_vec", outputCol="_idf_vec")
    weighted = idf.fit(vectorized).transform(vectorized)
    norm = Normalizer(inputCol="_idf_vec", outputCol=out_col, p=2.0)
    return norm.transform(weighted).drop("tf_vec", "_idf_vec")


def minhash_approx_join(
    docs: DataFrame,
    tokens_col: str,
    id_col: str,
    jaccard_threshold: float = 0.5,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """M4 scale path: MinHashLSH.approxSimilarityJoin near-dup candidates.

    Returns (id_l, id_r, jaccard_distance) for pairs within the distance
    threshold. Binary count vectors feed the LSH (MinHash is set-based).
    """
    vectorized, _ = count_vectorize(docs, tokens_col, "tf_vec")
    binarized = vectorized  # CountVectorizer(binary=False) is fine: MinHashLSH uses nonzero indices
    mh = MinHashLSH(inputCol="tf_vec", outputCol="hashes", numHashTables=num_tables, seed=seed)
    model = mh.fit(binarized)
    joined = model.approxSimilarityJoin(
        binarized, binarized, 1.0 - jaccard_threshold, distCol="jaccard_distance"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_l"),
            F.col(f"datasetB.{id_col}").alias("id_r"),
            "jaccard_distance",
        )
        .filter(F.col("id_l") < F.col("id_r"))
    )


def random_projection_neighbors(
    vectors: DataFrame,
    features_col: str,
    id_col: str,
    bucket_length: float = 2.0,
    num_tables: int = 4,
    max_distance: float = 10.0,
    seed: int = 42,
) -> DataFrame:
    """M4 scale path for dense embeddings: BucketedRandomProjectionLSH
    (euclidean) approxSimilarityJoin — the MLlib twin of plans/ann.py's
    hyperplane buckets."""
    brp = BucketedRandomProjectionLSH(
        inputCol=features_col,
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    model = brp.fit(vectors)
    joined = model.approxSimilarityJoin(vectors, vectors, max_distance, distCol="euclidean")
    return joined.select(
        F.col(f"datasetA.{id_col}").alias("id_l"),
        F.col(f"datasetB.{id_col}").alias("id_r"),
        "euclidean",
    ).filter(F.col("id_l") < F.col("id_r"))
