"""Property/unit tests for dedup, vector, hashing and multimodal operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from similarity_analysis_big_data_spark.functions.hashing import rolling_fingerprint
from similarity_analysis_big_data_spark.functions.text import word_ngrams, tokenize
from similarity_analysis_big_data_spark.functions.vectors import cosine_similarity, dot
from similarity_analysis_big_data_spark.operators.dedup import (
    exact_dedup_groups,
    exact_dedup_survivors,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_pairs,
    simhash_signatures,
)
from similarity_analysis_big_data_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup (1 word)
        (4, "completely different content about spark engines"),
        (5, "spark engines process completely different content about"),  # shuffled 4
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    groups = {r["keep_id"]: r["n_copies"] for r in exact_dedup_groups(docs, "doc_id", "text").collect()}
    assert groups[1] == 2  # doc 2 collapses into doc 1
    survivors = {r["doc_id"] for r in exact_dedup_survivors(docs, "doc_id", "text").collect()}
    assert survivors == {1, 3, 4, 5}


def test_minhash_lsh_finds_near_dups(docs):
    shingles = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.lower("text")))).alias("shingle")
    )
    sigs = minhash_signatures(shingles, "doc_id")
    assert sigs.columns == ["doc_id"] + [f"mh{i}" for i in range(12)]
    cands = {(r["id_l"], r["id_r"]) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert (1, 2) in cands  # identical token sets always collide
    # near-dup (1,3) shares 8/10 tokens — jaccard 0.8, should collide in some band
    assert (1, 3) in cands


def test_jaccard_exact_values(docs):
    shingles = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.lower("text")))).alias("shingle")
    )
    jacc = {(r["id_l"], r["id_r"]): r["jaccard"] for r in jaccard_pairs(shingles, "doc_id").collect()}
    assert jacc[(1, 2)] == pytest.approx(1.0)
    # docs 1/3: tokens {the,quick,brown,fox,jumps/leaps,over,lazy,dog} -> 7 shared, 9 union
    assert jacc[(1, 3)] == pytest.approx(7 / 9)
    # docs 4/5: doc5 adds "process" -> 6 shared of 7 union
    assert jacc[(4, 5)] == pytest.approx(6 / 7)


def test_simhash_near_dups_have_small_hamming(docs):
    tf = (
        docs.select("doc_id", F.explode(tokenize(F.lower("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    sigs = simhash_signatures(tf, "doc_id")
    pairs = {(r["id_l"], r["id_r"]): r["hamming"] for r in simhash_pairs(sigs, "doc_id", 32).collect()}
    assert pairs[(1, 2)] == 0  # identical docs -> identical signatures
    assert pairs[(1, 3)] < pairs.get((1, 4), 32)  # near dup closer than unrelated


def test_word_ngrams(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d"],), (["a"],)], ["toks"])
    out = [r["g"] for r in df.select(word_ngrams("toks", 3).alias("g")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []  # shorter than n -> empty, not a descending-sequence crash


def test_with_word_ngrams_matches_column_form(spark):
    """The compiled-Scala NGram path (r13) must be row-identical to the
    interpreted word_ngrams Column form — same grams in the same (position)
    order, empty below n, exactly-n, and null arrays normalized to empty."""
    from similarity_analysis_big_data_spark.functions.text import with_word_ngrams

    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a"]),
        (3, ["x", "y", "z"]),  # exactly n for n=3
        (4, None),
        (5, []),
        (6, ["a", "a", "a", "a", "a"]),  # repeats preserved per position
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    for n in (2, 3, 5):
        got = {
            r["id"]: r["g"]
            for r in with_word_ngrams(df, "toks", n, "g").select("id", "g").collect()
        }
        want = {
            r["id"]: r["g"]
            for r in df.select("id", word_ngrams("toks", n).alias("g")).collect()
        }
        # word_ngrams(null) -> empty array; with_word_ngrams normalizes the
        # same way
        assert got == want, (n, got, want)


def test_rolling_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], ["t"])
    vals = [r["fp"] for r in df.select(rolling_fingerprint("t").alias("fp")).collect()]
    assert vals[0] == vals[1] != vals[2]
    # matches the python fold: ((0*31+97)*31+98)*31+99 mod p
    expected = ((97 * 31 + 98) * 31 + 99) % 1_000_000_007
    assert vals[0] == expected


def test_vector_functions(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [3.0, 2.0, 1.0])], ["a", "b"])
    row = df.select(
        dot("a", "b").alias("d"), cosine_similarity("a", "b").alias("c"),
        cosine_similarity("a", "a").alias("self"),
    ).collect()[0]
    assert row["d"] == pytest.approx(10.0)
    assert row["c"] == pytest.approx(10.0 / 14.0)
    assert row["self"] == pytest.approx(1.0)


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert df.select(cosine_similarity("a", "b").alias("c")).collect()[0]["c"] is None


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_multimodal_features_deterministic_and_partition_invariant(spark, docs):
    payloads = attach_binary_payload(docs, "doc_id", "text")
    one = extract_features(payloads.coalesce(1)).orderBy("doc_id").collect()
    many = extract_features(payloads.repartition(4)).orderBy("doc_id").collect()
    assert one == many  # batch-shape independence
    byid = {r["doc_id"]: r for r in one}
    assert byid[1]["feature"] == byid[2]["feature"]  # same payload -> same feature
    assert len(byid[1]["feature"]) == 8
    assert byid[1]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert all(0.0 <= x <= 1.0 for x in byid[1]["feature"])


def test_multimodal_resize_and_frame_sampling(spark, docs):
    from similarity_analysis_big_data_spark.operators.multimodal import (
        resize_image,
        resize_images,
        sample_frames,
    )

    with pytest.raises(NotImplementedError):
        resize_image(b"bytes", 4, 4)

    payloads = attach_binary_payload(docs, "doc_id", "text")

    resized = resize_images(payloads, 8, 4).collect()
    assert all(len(bytes(r["payload"])) == 8 * 4 for r in resized)
    assert all((r["width"], r["height"]) == (8, 4) for r in resized)
    # deterministic: identical payloads resize identically
    byid = {r["doc_id"]: bytes(r["payload"]) for r in resized}
    assert byid[1] == byid[2]

    # frame sampling expands rows: every 4th 16-byte chunk, frame_idx stamped
    one = sample_frames(payloads.coalesce(1)).orderBy("doc_id", "frame_idx").collect()
    many = sample_frames(payloads.repartition(4)).orderBy("doc_id", "frame_idx").collect()
    assert one == many  # partition invariance
    frames_1 = [r for r in one if r["doc_id"] == 1]
    text_len = len("the quick brown fox jumps over the lazy dog")
    import math
    n_chunks = math.ceil(text_len / 16)
    assert frames_1[0]["n_frames"] == n_chunks
    assert len(frames_1) == math.ceil(n_chunks / 4)
    assert [r["frame_idx"] for r in frames_1] == [i * 4 for i in range(len(frames_1))]
    # frames are real slices of the payload
    assert bytes(frames_1[0]["frame"]) == b"the quick brown "


def test_grouped_zscore_degenerate_groups(spark):
    """applyInPandas grouped-map: size-1 and zero-variance groups emit 0.0
    (no NaN leaks into a feature pipeline)."""
    from similarity_analysis_big_data_spark.operators.grouped import grouped_zscore

    df = spark.createDataFrame(
        [("solo", 5.0), ("flat", 2.0), ("flat", 2.0), ("ok", 1.0), ("ok", 3.0)],
        "grp string, x double",
    )
    rows = {(r["grp"], r["x"]): r["zscore"] for r in grouped_zscore(df, ["grp"], "x").collect()}
    assert rows[("solo", 5.0)] == 0.0
    assert rows[("flat", 2.0)] == 0.0
    import math

    assert math.isclose(abs(rows[("ok", 1.0)]), 0.7071067811865475, rel_tol=1e-12)


def test_observe_metrics_ride_the_action(spark, sf_smoke):
    """observe(): corpus-health metrics computed by the SAME job as the
    query action — values must match an independent aggregation."""
    from similarity_analysis_big_data_spark.operators.monitoring import (
        observe_corpus_health,
    )
    from similarity_analysis_big_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    observed, obs = observe_corpus_health(docs, "text")
    kept = observed.filter(F.length("text") > 0).count()  # the action

    m = obs.get
    expected = docs.agg(
        F.count("*").alias("n"), F.sum(F.length("text")).alias("chars")
    ).first()
    assert m["rows_seen"] == expected["n"]
    assert m["null_content"] == expected["n"] - kept
    assert m["total_chars"] == expected["chars"]


def test_map_in_arrow_features_match_pandas_path(spark, sf_smoke):
    """mapInArrow twin of extract_features returns IDENTICAL values to the
    mapInPandas path (zero-copy Arrow batches, same fake decoder)."""
    from similarity_analysis_big_data_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
        extract_features_arrow,
    )
    from similarity_analysis_big_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    payloads = attach_binary_payload(docs, "doc_id", "text")
    a = {r["doc_id"]: (r["n_bytes"], r["header"], r["feature"])
         for r in extract_features(payloads).collect()}
    b = {r["doc_id"]: (r["n_bytes"], r["header"], r["feature"])
         for r in extract_features_arrow(payloads).collect()}
    assert a == b


def test_udtf_sentence_segments_matches_explode_form(spark):
    """Python UDTF (Spark 4): lateral sentence segmentation agrees with the
    equivalent explode+split Catalyst composition on every row."""
    from similarity_analysis_big_data_spark.functions.udtf_ops import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "One two. Three!  Four five six? "), (2, "..."), (3, None), (4, "Solo")],
        "id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    got = {
        (r["id"], r["sentence_idx"]): (r["sentence"], r["n_tokens"])
        for r in spark.sql(
            "SELECT d.id, s.* FROM udtf_docs d, LATERAL sentence_segments(d.text) s"
        ).collect()
    }
    assert got == {
        (1, 0): ("One two", 2),
        (1, 1): ("Three", 1),
        (1, 2): ("Four five six", 3),
        (4, 0): ("Solo", 1),
    }


def test_dense_best_match_zero_overlap_and_ties(spark):
    """dense_best_match edge semantics must mirror the sparse join: a query
    sharing no term with any candidate yields NO row (caller restores it),
    and score ties break on the smallest match id."""
    from similarity_analysis_big_data_spark.operators.similarity import (
        best_match,
        dense_best_match,
        sparse_cosine_join,
    )

    titles = spark.createDataFrame(
        # t1 overlaps a1/a2 equally (tie); t2 overlaps nothing
        [(1, "x", 1.0), (2, "zz", 1.0)],
        "title_id long, term string, weight double",
    )
    abstracts = spark.createDataFrame(
        [(10, "x", 0.5), (11, "x", 0.5), (12, "y", 1.0)],
        "abstract_id long, term string, weight double",
    )
    dense = dense_best_match(titles, abstracts, "title_id", "abstract_id").collect()
    got = {r["title_id"]: (r["abstract_id"], r["cosine"]) for r in dense}
    assert set(got) == {1}  # t2 dropped (zero overlap)
    assert got[1] == (10, 0.5)  # tie between 10 and 11 -> smallest id
    # and the sparse formulation agrees exactly
    sparse = best_match(
        sparse_cosine_join(titles, abstracts, "title_id", "abstract_id", round_to=9),
        "title_id",
        "abstract_id",
    ).collect()
    sgot = {r["title_id"]: (r["abstract_id"], r["cosine"]) for r in sparse}
    assert sgot == got


def test_dense_best_match_overbound_falls_back_to_sparse(spark, monkeypatch):
    """ADVICE r11 guard: when the ACTUAL collected title matrix violates the
    broadcast bounds (stale memo / forced-dense caller), dense_best_match
    must degrade to the exact sparse formulation — same rows — instead of
    over-broadcasting."""
    from similarity_analysis_big_data_spark.operators import similarity as ops

    titles = spark.createDataFrame(
        [(1, "x", 1.0), (2, "zz", 1.0)],
        "title_id long, term string, weight double",
    )
    abstracts = spark.createDataFrame(
        [(10, "x", 0.5), (11, "x", 0.5), (12, "y", 1.0)],
        "abstract_id long, term string, weight double",
    )
    expected = {
        r["title_id"]: (r["abstract_id"], r["cosine"])
        for r in ops.dense_best_match(titles, abstracts, "title_id", "abstract_id").collect()
    }
    monkeypatch.setattr(ops, "DENSE_MAX_VOCAB", 0)
    got = {
        r["title_id"]: (r["abstract_id"], r["cosine"])
        for r in ops.dense_best_match(titles, abstracts, "title_id", "abstract_id").collect()
    }
    assert got == expected


def test_dense_best_match_blocked_equals_one_shot(spark, monkeypatch):
    """The r12 bounded-memory block loop (DENSE_BLOCK_CELLS caps the
    (rows x |Q|) score allocation per task) must be invisible in the
    result: forcing single-row blocks — every cross-chunk merge path,
    including ties straddling chunk boundaries and zero-overlap masking —
    yields exactly the one-shot rows."""
    from similarity_analysis_big_data_spark.operators import similarity as ops

    titles = spark.createDataFrame(
        # q1: tie between candidates in DIFFERENT chunks (10 and 13);
        # q2: matched only late in the id order; q3: zero overlap
        [(1, "x", 1.0), (2, "y", 1.0), (3, "zz", 1.0)],
        "title_id long, term string, weight double",
    )
    abstracts = spark.createDataFrame(
        [(10, "x", 0.5), (11, "w", 1.0), (12, "y", 0.25),
         (13, "x", 0.5), (14, "y", 0.75)],
        "abstract_id long, term string, weight double",
    )

    def rows(df):
        return {r["title_id"]: (r["abstract_id"], r["cosine"]) for r in df.collect()}

    one_shot = rows(ops.dense_best_match(titles, abstracts, "title_id", "abstract_id"))
    monkeypatch.setattr(ops, "DENSE_BLOCK_CELLS", 1)  # 1 cell -> 1-row blocks
    blocked = rows(ops.dense_best_match(titles, abstracts, "title_id", "abstract_id"))
    assert blocked == one_shot
    assert blocked[1] == (10, 0.5)  # cross-chunk tie -> smallest id
    assert blocked[2] == (14, 0.75)  # later chunk wins on strictly-greater
    assert 3 not in blocked  # zero overlap stays masked out


def test_pca_matches_driver_numpy(spark):
    """The distributed sufficient-stats PCA equals a driver-side numpy PCA
    on the collected corpus: covariance bit-close, components orthonormal,
    explained variance descending, projections equal after the shared
    sign-pinning convention."""
    import numpy as np

    from similarity_analysis_big_data_spark.operators.linalg import (
        covariance_from_stats,
        embedding_sufficient_stats,
        pca_components,
        project_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n, s, S = embedding_sufficient_stats(emb, "embedding", 64)
    cov, mu = covariance_from_stats(n, s, S)

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    assert n == len(X)
    ref_cov = np.cov(X, rowvar=False, ddof=1)
    np.testing.assert_allclose(cov, ref_cov, atol=1e-9)

    vals, comp = pca_components(cov, 8)
    # orthonormal basis, descending explained variance
    np.testing.assert_allclose(comp.T @ comp, np.eye(8), atol=1e-10)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(7))
    # the top-8 eigenvalues match numpy's full spectrum head
    ref_vals = np.sort(np.linalg.eigvalsh(ref_cov))[::-1][:8]
    np.testing.assert_allclose(vals, ref_vals, atol=1e-9)

    got = {
        r["vec_id"]: np.asarray(r["projection"])
        for r in project_embeddings(emb, "vec_id", "embedding", mu, comp).collect()
    }
    ref_proj = np.round((X - X.mean(axis=0)) @ comp, 6)
    for i, r in enumerate(rows):
        np.testing.assert_allclose(got[r["vec_id"]], ref_proj[i], atol=1e-6)


def test_pca_projection_partition_invariant(spark):
    """Repartitioning must not change the projection (partials combine
    exactly; eigh input is identical)."""
    from similarity_analysis_big_data_spark.plans.datapipe import pca_project_embeddings
    import similarity_analysis_big_data_spark.plans.datapipe as dp

    a = {
        (r["vec_id"], r["pc"], r["value"])
        for r in pca_project_embeddings(spark, "/root/testdata/sf0.001").collect()
    }
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").repartition(13)
    from similarity_analysis_big_data_spark.operators.linalg import (
        covariance_from_stats,
        embedding_sufficient_stats,
        pca_components,
        project_embeddings,
    )

    n, s, S = embedding_sufficient_stats(emb, "embedding", dp.EMB_DIM)
    cov, mu = covariance_from_stats(n, s, S)
    _vals, comp = pca_components(cov, dp.PCA_K)
    b = {
        (r["vec_id"], pc, v)
        for r in project_embeddings(emb, "vec_id", "embedding", mu, comp).collect()
        for pc, v in enumerate(r["projection"])
    }
    assert a == b


def test_stable_dense_ids_skewed_coarse_key(spark):
    """Degenerate coarse key (ALL rows equal -> every percentile boundary
    collapses to one bucket) must still produce the exact dense order by
    the tiebreak; and a two-value key exercises the equal-values-straddle
    boundary rule (equal keys always share a bucket)."""
    from similarity_analysis_big_data_spark.operators.reindex import stable_dense_ids

    rows = [(i, 7 if i % 3 else 3) for i in range(97)]
    df = spark.createDataFrame(rows, "rid long, k long").repartition(11)
    got = stable_dense_ids(df, "k", "rid").collect()
    want = sorted(rows, key=lambda r: (r[1], r[0]))
    by_rid = {r["rid"]: r["new_id"] for r in got}
    assert len(by_rid) == 97
    for new_id, (rid, _k) in enumerate(want):
        assert by_rid[rid] == new_id


def test_trained_pq_beats_seed_codebooks(spark):
    """Lloyd's-trained codebooks must not lose to the raw seed subvectors:
    mean recall@k (vs exact brute force) strictly improves on the sf0.01
    fixture (0.14 seed vs 0.24 trained when written — assert the ordering,
    not the point values)."""
    from similarity_analysis_big_data_spark.plans.ann import (
        ann_pq_recall_at_k,
        ann_pq_trained_recall_at_k,
    )

    sf = "/root/testdata/sf0.01"
    seed = [r["recall_at_k"] for r in ann_pq_recall_at_k(spark, sf).collect()]
    trained = [
        r["recall_at_k"] for r in ann_pq_trained_recall_at_k(spark, sf).collect()
    ]
    assert len(seed) == len(trained) > 0
    assert sum(trained) / len(trained) > sum(seed) / len(seed)


def test_polymorphic_udtf_analyze_schema(spark):
    """Spark 4 UDTF static analysis: the output schema is computed from a
    constant argument at analysis time (tok0..tokN-1 typed columns), and
    values match a driver-side reference split."""
    from similarity_analysis_big_data_spark.functions.udtf_ops import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two"), (3, "")],
        "id long, text string",
    )
    df.createOrReplaceTempView("poly_docs")
    out = spark.sql(
        "SELECT d.id, s.* FROM poly_docs d, LATERAL split_to_columns(d.text, 3) s"
    )
    assert out.columns == ["id", "tok0", "tok1", "tok2", "n_found"]
    rows = {r["id"]: (r["tok0"], r["tok1"], r["tok2"], r["n_found"]) for r in out.collect()}
    assert rows[1] == ("alpha", "beta", "gamma", 3)
    assert rows[2] == ("one", "two", None, 2)
    assert rows[3] == (None, None, None, 0)


def test_apply_in_arrow_matches_builtin_agg(spark):
    """groupBy().applyInArrow (the zero-pandas grouped-map surface): a
    per-group Arrow-table normalization matches the Catalyst window
    formulation exactly."""
    import pyarrow as pa

    from similarity_analysis_big_data_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("n_chars")
    )

    def center(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mean = pc.mean(table.column("n_chars"))
        centered = pc.subtract(table.column("n_chars"), mean)
        return pa.table(
            {
                "doc_id": table.column("doc_id"),
                "lang": table.column("lang"),
                "centered": centered,
            }
        )

    got = {
        (r["doc_id"]): round(r["centered"], 9)
        for r in docs.groupBy("lang")
        .applyInArrow(center, schema="doc_id long, lang string, centered double")
        .collect()
    }
    from pyspark.sql import Window as W

    want = {
        r["doc_id"]: round(r["centered"], 9)
        for r in docs.withColumn(
            "centered", F.col("n_chars") - F.avg("n_chars").over(W.partitionBy("lang"))
        ).collect()
    }
    assert got == want


def test_hll_sketch_estimates_and_merge(spark):
    """DataSketches HLL: per-type estimates within 5% of exact distinct
    counts, and the UNION-merged sketch estimates the global distinct —
    the mergeability property that makes sketches incremental."""
    from similarity_analysis_big_data_spark.plans.datapipe import hll_sketch_merge_users
    from similarity_analysis_big_data_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = hll_sketch_merge_users(spark, sf).collect()
    got_exact = {r["event_type"]: r["exact_users"] for r in rows}
    in_bound = {r["event_type"]: r["estimate_within_5pct"] for r in rows}
    ev = load_table(spark, sf, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert got_exact == exact
    # the query now audits the sketch in-line: per-type sketches AND the
    # union-merged global sketch must sit inside the 3-sigma bound
    assert all(in_bound.values()), in_bound


def test_jaccard_candidate_driven_equals_postfilter(docs):
    """The candidate-driven verify (fan candidates out by shingles) must
    return exactly the pairs/values of the naive form filtered to the
    candidate set — LSH-then-verify correctness at the operator level."""
    shingles = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize(F.lower("text")))).alias("shingle"),
    )
    spark = docs.sparkSession
    cands = spark.createDataFrame(
        [(1, 3), (4, 5), (1, 2), (2, 4)], "id_l long, id_r long"
    )
    driven = {
        (r["id_l"], r["id_r"]): r["jaccard"]
        for r in jaccard_pairs(shingles, "doc_id", candidates=cands).collect()
    }
    full = {
        (r["id_l"], r["id_r"]): r["jaccard"]
        for r in jaccard_pairs(shingles, "doc_id").collect()
    }
    expected = {
        k: v for k, v in full.items() if k in {(1, 3), (4, 5), (1, 2), (2, 4)}
    }
    assert driven == pytest.approx(expected)


def test_jaccard_threshold_prefilter_equals_postfilter(docs):
    """The thresholded verify (r13: exact size-ratio prefilter + smaller-
    side probe) must agree with the un-thresholded candidate path after the
    caller's >= t filter — for every pair AT or ABOVE the threshold, the
    pair and its exact jaccard value are identical; pairs below may only
    ever be dropped, never altered or invented."""
    shingles = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize(F.lower("text")))).alias("shingle"),
    )
    spark = docs.sparkSession
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    # every ordered pair — includes size-ratio violators and zero-overlap
    # pairs, both directions of the (smaller, larger) probe swap
    cands = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a != b], "id_l long, id_r long"
    )
    for num, den in [(1, 2), (1, 3), (4, 5)]:
        t = num / den
        thresholded = {
            (r["id_l"], r["id_r"]): r["jaccard"]
            for r in jaccard_pairs(
                shingles, "doc_id", candidates=cands, threshold=(num, den)
            ).collect()
        }
        plain = {
            (r["id_l"], r["id_r"]): r["jaccard"]
            for r in jaccard_pairs(shingles, "doc_id", candidates=cands).collect()
        }
        above = {k: v for k, v in plain.items() if v >= t}
        kept_above = {k: v for k, v in thresholded.items() if v >= t}
        assert kept_above == pytest.approx(above)
        # anything the prefilter kept below t must carry the exact value
        for k, v in thresholded.items():
            assert v == pytest.approx(plain[k])


# ---- operators/rank.py: direct equivalence properties -----------------------


def _rank_fixture(spark, seed=7):
    import random

    rnd = random.Random(seed)
    rows = [
        (i, rnd.choice("abc"), rnd.randint(0, 40), rnd.randint(1, 9))
        for i in range(500)
    ]
    # heavy tie block: one value repeated across many rows (bucket-skew case)
    rows += [(1000 + i, "a", 17, 2) for i in range(60)]
    return spark.createDataFrame(rows, "id long, grp string, k long, v long")


def test_bucketed_row_number_equals_window_row_number(spark):
    from pyspark.sql import Window as W

    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_row_number,
    )

    cols = ["id", "grp", "k", "v", "r", "n"]
    df = _rank_fixture(spark)
    got = bucketed_row_number(df, "k", ["id"], rank_name="r", n_name="n").select(cols)
    exp = df.withColumn("r", F.row_number().over(W.orderBy("k", "id"))).withColumn(
        "n", F.count("*").over(W.partitionBy())
    ).select(cols)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0

    got_g = bucketed_row_number(
        df, "k", ["id"], rank_name="r", n_name="n", partition_cols=("grp",)
    ).select(cols)
    w = W.partitionBy("grp")
    exp_g = df.withColumn(
        "r", F.row_number().over(w.orderBy("k", "id"))
    ).withColumn("n", F.count("*").over(w)).select(cols)
    assert got_g.exceptAll(exp_g).count() == 0
    assert exp_g.exceptAll(got_g).count() == 0


@pytest.mark.parametrize("k", [1, 2, 4, 7, 100, 560])
def test_ntile_from_rank_equals_window_ntile(spark, k):
    from pyspark.sql import Window as W

    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_row_number,
        ntile_from_rank,
    )

    df = _rank_fixture(spark)
    ranked = bucketed_row_number(df, "k", ["id"], rank_name="r", n_name="n")
    got = ranked.select(
        "id", ntile_from_rank(F.col("r"), F.col("n"), k).alias("t")
    )
    exp = df.select(
        "id", F.ntile(k).over(W.orderBy("k", "id")).cast("long").alias("t")
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_bucketed_running_sum_equals_window_running_sum(spark):
    from pyspark.sql import Window as W

    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_running_sum,
    )

    cols = ["id", "grp", "k", "v", "rs"]
    df = _rank_fixture(spark)
    got = bucketed_running_sum(df, "k", ["id"], "v", sum_name="rs").select(cols)
    exp = df.withColumn(
        "rs",
        F.sum("v").over(
            W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).select(cols)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0

    got_g = bucketed_running_sum(
        df, "k", ["id"], "v", sum_name="rs", partition_cols=("grp",)
    ).select(cols)
    exp_g = df.withColumn(
        "rs",
        F.sum("v").over(
            W.partitionBy("grp")
            .orderBy("k", "id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).select(cols)
    assert got_g.exceptAll(exp_g).count() == 0
    assert exp_g.exceptAll(got_g).count() == 0

def test_bucketed_running_sum_double_values(spark):
    """ADVICE r4: double-typed value column — the offset seed must be a
    float zero or createDataFrame rejects it for DoubleType."""
    from pyspark.sql import Window as W

    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_running_sum,
    )

    df = _rank_fixture(spark).withColumn("v", (F.col("v") + F.lit(0.25)).cast("double"))
    cols = ["id", "grp", "k", "v", "rs"]
    got = bucketed_running_sum(df, "k", ["id"], "v", sum_name="rs").select(cols)
    exp = df.withColumn(
        "rs",
        F.sum("v").over(
            W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).select(cols)
    # float running sums: compare rounded (bucket subtotal order vs scan
    # order can differ in the last ulp — documented in the docstring)
    g = got.withColumn("rs", F.round("rs", 6))
    e = exp.withColumn("rs", F.round("rs", 6))
    assert g.exceptAll(e).count() == 0 and e.exceptAll(g).count() == 0


def test_bucketed_rank_invariant_to_boundary_choice(spark):
    """Boundaries only load-balance: ranks under exact-percentile bounds,
    approx bounds (default), and a deliberately awful single boundary all
    agree row-for-row."""
    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_row_number,
        percentile_bounds,
    )

    df = _rank_fixture(spark)
    exact = [
        float(b)
        for b in df.agg(
            F.expr(
                "percentile(cast(k as double), array("
                + ", ".join(str(i / 32) for i in range(1, 32))
                + "))"
            ).alias("bs")
        ).collect()[0]["bs"]
    ]
    approx = percentile_bounds(df, "k", 32)
    runs = [
        bucketed_row_number(df, "k", ["id"], rank_name="r", bounds=b)
        .select("id", "r")
        for b in (sorted(set(exact)), approx, [17.0], [])
    ]
    base = runs[0]
    for other in runs[1:]:
        assert base.exceptAll(other).count() == 0
        assert other.exceptAll(base).count() == 0


def test_percentile_bounds_empty_input(spark):
    """ADVICE r4: empty relation → [] (single-bucket degenerate), and the
    bucketed operators still run on zero rows."""
    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_row_number,
        percentile_bounds,
    )

    empty = spark.createDataFrame([], "id long, grp string, k long, v long")
    assert percentile_bounds(empty, "k", 32) == []
    out = bucketed_row_number(empty, "k", ["id"], rank_name="r", n_name="n")
    assert out.count() == 0


def test_lsh_bucket_cap_drops_only_oversized_buckets(docs):
    """max_bucket_size: capped candidates are exactly the uncapped set
    minus pairs whose EVERY colliding band bucket is oversized; a huge
    cap is the identity."""
    from similarity_analysis_big_data_spark.operators.dedup import (
        lsh_band_entries,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    shingles = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize(F.lower("text")))).alias("shingle"),
    )
    sigs = minhash_signatures(shingles, "doc_id")
    uncapped = {
        (r["id_l"], r["id_r"]) for r in lsh_candidate_pairs(sigs, "doc_id").collect()
    }
    as_uncapped = {
        (r["id_l"], r["id_r"])
        for r in lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=10**6).collect()
    }
    assert as_uncapped == uncapped

    cap = 2
    capped = {
        (r["id_l"], r["id_r"])
        for r in lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=cap).collect()
    }
    assert capped <= uncapped
    # recompute the expected survivors from the band relation directly
    banded = lsh_band_entries(sigs, "doc_id").collect()
    buckets: dict = {}
    for r in banded:
        buckets.setdefault((r["band"], r["key"]), []).append(r["doc_id"])
    expected = set()
    for members in buckets.values():
        if len(members) > cap:
            continue
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                expected.add((min(a, b), max(a, b)))
    assert capped == expected


def test_bucketed_running_max_equals_window_running_max(spark):
    from pyspark.sql import Window as W

    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_running_max,
    )

    cols = ["id", "grp", "k", "v", "rm"]
    df = _rank_fixture(spark)
    got = bucketed_running_max(df, "k", ["id"], "v", max_name="rm").select(cols)
    exp = df.withColumn(
        "rm",
        F.max("v").over(
            W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).select(cols)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0

    got_g = bucketed_running_max(
        df, "k", ["id"], "v", max_name="rm", partition_cols=("grp",)
    ).select(cols)
    exp_g = df.withColumn(
        "rm",
        F.max("v").over(
            W.partitionBy("grp")
            .orderBy("k", "id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).select(cols)
    assert got_g.exceptAll(exp_g).count() == 0
    assert exp_g.exceptAll(got_g).count() == 0


def test_bucketed_rank_family_keeps_null_partition_groups(spark):
    """A NULL partition value is a real group under groupBy, and the
    window form keeps its rows — the offset join back must be null-safe
    or those rows silently vanish (ADVICE r5: rank.py offset joins)."""
    from pyspark.sql import Window as W

    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_row_number,
        bucketed_running_max,
        bucketed_running_sum,
    )

    df = _rank_fixture(spark).withColumn(
        "grp", F.when(F.col("id") % 4 == 0, F.lit(None)).otherwise(F.col("grp"))
    )
    n = df.count()
    cols = ["id", "grp", "k", "v", "out"]
    w = (
        W.partitionBy("grp")
        .orderBy("k", "id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for op, exp_col in [
        (bucketed_running_max, F.max("v").over(w)),
        (bucketed_running_sum, F.sum("v").over(w)),
    ]:
        got = op(df, "k", ["id"], "v", "out", partition_cols=("grp",)).select(cols)
        assert got.count() == n  # NULL-group rows survive
        exp = df.withColumn("out", exp_col).select(cols)
        assert got.exceptAll(exp).count() == 0
        assert exp.exceptAll(got).count() == 0

    got_rn = bucketed_row_number(
        df, "k", ["id"], rank_name="out", partition_cols=("grp",)
    ).select(cols)
    assert got_rn.count() == n
    exp_rn = df.withColumn(
        "out", F.row_number().over(W.partitionBy("grp").orderBy("k", "id"))
    ).select(cols)
    assert got_rn.exceptAll(exp_rn).count() == 0
    assert exp_rn.exceptAll(got_rn).count() == 0


def test_bucketed_running_max_with_null_values(spark):
    """All-NULL buckets must not clobber or crash the carried prefix max
    (max aggregates NULL for them); matches the window form row-for-row."""
    from pyspark.sql import Window as W

    from similarity_analysis_big_data_spark.operators.rank import (
        bucketed_running_max,
    )

    df = _rank_fixture(spark).withColumn(
        "v", F.when(F.col("k") % 3 == 0, F.col("v")).otherwise(F.lit(None))
    )
    cols = ["id", "grp", "k", "v", "rm"]
    got = bucketed_running_max(df, "k", ["id"], "v", max_name="rm").select(cols)
    exp = df.withColumn(
        "rm",
        F.max("v").over(
            W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).select(cols)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_perceptual_dhash_known_bitmaps_and_partition_invariance(spark):
    from similarity_analysis_big_data_spark.operators.multimodal import (
        perceptual_dhash,
    )

    # Strictly increasing rows -> every px[r][c] > px[r][c+1] is False -> 0.
    flat = bytes(range(64))
    # Strictly decreasing rows -> all 56 comparison bits set.
    desc = bytes(b for r in range(8) for b in range(63 - 8 * r, 55 - 8 * r, -1))
    df = spark.createDataFrame(
        [(0, bytearray(flat)), (1, bytearray(desc)), (2, bytearray(flat))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r["phash"] for r in perceptual_dhash(df).collect()}
    assert rows[0] == 0
    assert rows[1] == (1 << 56) - 1
    assert rows[2] == rows[0]  # same payload -> same hash

    many = {
        r["doc_id"]: r["phash"]
        for r in perceptual_dhash(df.repartition(3)).collect()
    }
    assert many == rows  # batch-shape independence


def test_perceptual_dhash_rejects_non_bitmap_payloads(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from similarity_analysis_big_data_spark.operators.multimodal import (
        perceptual_dhash,
    )

    bad = spark.createDataFrame(
        [(0, bytearray(b"short"))], "doc_id long, payload binary"
    )
    with pytest.raises((PythonException, Py4JJavaError)):
        perceptual_dhash(bad).collect()


def test_image_near_dup_variant_within_hamming_two(spark, sf_smoke):
    """The planted construction's contract: every non-canonical variant is
    within Hamming distance 2 of its group's canonical image (one pixel
    touches at most two horizontal dHash comparisons)."""
    from similarity_analysis_big_data_spark.operators.multimodal import (
        perceptual_dhash,
    )
    from similarity_analysis_big_data_spark.plans.multimodal import synthetic_images

    sig = perceptual_dhash(synthetic_images(spark, sf_smoke))
    by_id = {r["doc_id"]: r["phash"] for r in sig.collect()}
    for doc_id, ph in by_id.items():
        canon = (doc_id // 8) * 8
        if doc_id == canon or canon not in by_id:
            continue
        assert bin(ph ^ by_id[canon]).count("1") <= 2


def test_video_near_dup_every_sampled_frame_within_hamming_two(spark, sf_smoke):
    """The video construction's contract: EVERY sampled frame of a variant
    sits within Hamming 2 of the canonical video's same-index frame (the
    one-pixel-per-frame perturbation touches at most two horizontal dHash
    comparisons) — so the any-frame pairing can't ride a hamming-0
    untouched frame; each planted pair exercises the tolerance."""
    from similarity_analysis_big_data_spark.operators.multimodal import (
        perceptual_dhash,
        sample_frames,
    )
    from similarity_analysis_big_data_spark.plans.multimodal import (
        _VID_EVERY_N,
        _VID_FRAMES,
        synthetic_videos,
    )

    frames = sample_frames(
        synthetic_videos(spark, sf_smoke), frame_bytes=64, every_n=_VID_EVERY_N
    )
    sig = perceptual_dhash(
        frames.selectExpr(
            f"doc_id * {_VID_FRAMES} + frame_idx AS doc_id", "frame AS payload"
        )
    )
    by_fid = {r["doc_id"]: r["phash"] for r in sig.collect()}
    sampled = range(0, _VID_FRAMES, _VID_EVERY_N)
    checked = 0
    for fid, ph in by_fid.items():
        doc_id, fidx = divmod(fid, _VID_FRAMES)
        canon = (doc_id // 8) * 8
        canon_fid = canon * _VID_FRAMES + fidx
        if doc_id == canon or canon_fid not in by_fid:
            continue
        assert fidx in sampled
        # the spliced byte may coincide with the original or flip no
        # comparison sign, so 0 is legal; >2 never is
        d = bin(ph ^ by_fid[canon_fid]).count("1")
        assert d <= 2, f"frame {fidx} of {doc_id}: hamming {d}"
        checked += 1
    assert checked > 0


def test_audio_alignment_recovers_planted_shift_structure(spark, sf_smoke):
    """The constellation contract: every intra-group clip pair must align
    at exactly the planted offset s_r - s_l with 6 - |offset| agreeing
    windows (clips are 6-window slices of the group's master track at
    shifts (doc_id % 8) % 3), and no cross-group pair may survive the
    >= 3 consistent-offset vote."""
    from similarity_analysis_big_data_spark.plans.multimodal import (
        audio_fingerprint_align_pairs,
    )

    rows = audio_fingerprint_align_pairs(spark, sf_smoke).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["id_l"] // 8 == r["id_r"] // 8, "cross-group pair survived the vote"
        s_l, s_r = (r["id_l"] % 8) % 3, (r["id_r"] % 8) % 3
        assert r["t_offset"] == s_r - s_l
        assert r["n_aligned"] == 6 - abs(r["t_offset"])
        seen.add((r["id_l"], r["id_r"]))
    # completeness: every intra-group ordered pair in the FIXTURE must be
    # present (all overlaps are >= 4 >= the vote threshold)
    from similarity_analysis_big_data_spark.sources.readers import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_smoke, "documents").select("doc_id").collect()
    ]
    by_g = {}
    for i in ids:
        by_g.setdefault(i // 8, []).append(i)
    expected = {
        (a, b)
        for members in by_g.values()
        for a in members
        for b in members
        if a < b
    }
    assert seen == expected


def test_audio_spectral_window_hash_pins_known_value(spark, sf_smoke):
    """Pin the full synth -> integer-DCT -> dHash chain for one master
    window against an independent pure-Python reference (fresh basis from
    the cos formula, plain-int waveform/spectrum/byte/bit math). Any
    drift in the seeded tone recipe, the DCT basis, the uint16 encoding
    or the dHash bit order breaks this before the oracle would."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from similarity_analysis_big_data_spark.operators.multimodal import (
        audio_spectral_frames,
        perceptual_dhash,
        sample_frames,
    )
    from similarity_analysis_big_data_spark.plans.multimodal import (
        synthetic_audio_clips,
    )

    N = 32
    C = [
        [round(64 * math.cos(math.pi * (2 * n + 1) * k / (2 * N))) for n in range(N)]
        for k in range(N)
    ]

    def expected_phash(g: int, wm: int) -> int:
        h1 = hashlib.md5(f"aud:{g}:{wm}".encode()).hexdigest()
        h2 = hashlib.md5(f"aud-noise:{g}:{wm}".encode()).hexdigest()
        b = [int(h1[2 * i : 2 * i + 2], 16) for i in range(6)]
        k1, k2, k3 = 1 + b[0] % 10, 11 + b[1] % 10, 21 + b[2] % 10
        a1, a2, a3 = 1 + b[3] % 4, 1 + b[4] % 4, 1 + b[5] % 4
        x = [
            a1 * C[k1][n] + a2 * C[k2][n] + a3 * C[k3][n] + (int(h2[n], 16) % 5 - 2)
            for n in range(N)
        ]
        s = [sum(x[n] * C[k][n] for n in range(N)) for k in range(N)]
        u = [(v + (1 << 21)) >> 7 for v in s]
        by = [(u[j // 2] >> 8) if j % 2 == 0 else (u[j // 2] % 256) for j in range(64)]
        return sum(
            1 << (r * 7 + c)
            for r in range(8)
            for c in range(7)
            if by[r * 8 + c] > by[r * 8 + c + 1]
        )

    clip = synthetic_audio_clips(spark, sf_smoke).filter(F.col("doc_id") == 0)
    frames = sample_frames(clip, frame_bytes=64, every_n=1)
    sig = perceptual_dhash(
        audio_spectral_frames(frames)
        .filter(F.col("frame_idx") == 0)
        .select("doc_id", F.col("frame").alias("payload"))
    ).collect()
    assert len(sig) == 1
    # doc_id 0 -> group 0, shift 0, so window f=0 is master window (0, 0)
    assert sig[0]["phash"] == expected_phash(0, 0)
