"""Property tests for the r7 selection/sketch operators beyond oracle
parity: greedy-structure invariants that must hold on ANY corpus, not
just hash-equality on the fixture."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_mmr_rank1_is_relevance_argmax_and_picks_distinct(spark, sf_smoke):
    from similarity_analysis_big_data_spark.plans.ann import (
        MMR_K,
        MMR_QUERY_MOD,
        mmr_diverse_topk,
    )
    from similarity_analysis_big_data_spark.functions.vectors import (
        cosine_similarity,
    )
    from similarity_analysis_big_data_spark.sources.readers import load_table

    out = mmr_diverse_topk(spark, sf_smoke).collect()
    assert out, "smoke fixture must yield at least one query"
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        ids = [r["vec_id"] for r in rows]
        assert len(ids) == len(set(ids)), f"duplicate picks for query {qid}"
        assert sorted(r["rnk"] for r in rows) == list(range(1, len(rows) + 1))
        assert len(rows) <= MMR_K
        # rank 1 must be the pure-relevance arg-max (rel desc, id asc)
        emb = load_table(spark, sf_smoke, "embeddings")
        qv = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qv")
        )
        top = (
            emb.crossJoin(F.broadcast(qv))
            .filter(F.col("vec_id") != qid)
            .select(
                "vec_id",
                F.round(cosine_similarity("qv", "embedding"), 6).alias("rel"),
            )
            .orderBy(F.desc("rel"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        r1 = next(r for r in rows if r["rnk"] == 1)
        assert r1["vec_id"] == top["vec_id"]
        assert abs(r1["rel"] - top["rel"]) < 1e-9


def test_kcenter_greedy_matches_numpy_reference(spark, sf_smoke):
    """The distributed pick sequence must equal a driver-side numpy
    implementation of Gonzalez farthest-point sampling with the same
    rounding and tiebreak."""
    from similarity_analysis_big_data_spark.plans.clustering import (
        KCENTER_K,
        kcenter_coreset_sample,
    )
    from similarity_analysis_big_data_spark.sources.readers import load_table

    rows = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, Xn = ids[order], Xn[order]

    picks = [int(ids[0])]  # seed = min vec_id
    mind = None
    for _ in range(1, min(KCENTER_K, len(ids))):
        d = np.round(1.0 - Xn @ Xn[np.searchsorted(ids, picks[-1])], 6)
        mind = d if mind is None else np.minimum(mind, d)
        masked = np.where(np.isin(ids, picks), -np.inf, mind)
        best = np.max(masked)
        picks.append(int(ids[np.where(masked == best)[0][0]]))

    got = [
        r["vec_id"]
        for r in sorted(
            kcenter_coreset_sample(spark, sf_smoke).collect(),
            key=lambda r: r["rnk"],
        )
    ]
    assert got == picks


def test_countmin_overestimate_guarantee(spark, sf_smoke):
    """cm_est >= exact count for EVERY reported n-gram — the structural
    CM guarantee, independent of fixture hashes."""
    from similarity_analysis_big_data_spark.plans.lm import countmin_heavy_ngrams

    rows = countmin_heavy_ngrams(spark, sf_smoke).collect()
    for r in rows:
        assert r["cm_overshoot"] >= 0
        assert r["cm_est"] == r["exact_n"] + r["cm_overshoot"]


def test_load_table_memo_scoped_to_session_and_dir(spark, sf_smoke, sf_oracle):
    from similarity_analysis_big_data_spark.sources.readers import load_table

    a = load_table(spark, sf_smoke, "region")
    b = load_table(spark, sf_smoke, "region")
    c = load_table(spark, sf_oracle, "region")
    assert a is b, "same (session, dir, table) must return the memoized plan"
    assert a is not c, "different sf_dir must not share a memo entry"
    # memo must not leak across sessions: the store lives on the session object
    assert "_sabds_table_memo" in spark.__dict__


def test_session_factory_disables_callsite_capture(spark):
    assert (
        spark.conf.get("spark.python.sql.dataFrameDebugging.enabled") == "false"
    )


def test_pii_redaction_golden(spark, sf_smoke):
    """Golden bytes for one known customer: the blob construction and the
    three-pattern redaction are pinned exactly (not just via md5 parity)."""
    from similarity_analysis_big_data_spark.plans.pii import (
        contact_blobs,
        pii_redacted_rewrite,
    )
    from similarity_analysis_big_data_spark.sources.readers import load_table

    # custkey 0: 0%3==0 (email), 0%5<2 (phone), 0%7==0 (ip) — all three
    cust0 = load_table(spark, sf_smoke, "customer").filter("c_custkey = 0")
    nk = cust0.collect()[0]["c_nationkey"]
    nname = (
        load_table(spark, sf_smoke, "nation")
        .filter(F.col("n_nationkey") == nk)
        .collect()[0]["n_name"]
    )
    seg = cust0.collect()[0]["c_mktsegment"]
    blob = contact_blobs(spark, sf_smoke).filter("doc_id = 0").collect()[0]["text"]
    expected = (
        f"acct Customer#000000000 segment {seg}"
        f" email customer-000000000@{nname.lower().replace('_', '-')}.example"
        " phone +1-555-0000"
        " ip 10.0.0.0"
    )
    assert blob == expected

    red = (
        pii_redacted_rewrite(spark, sf_smoke).filter("doc_id = 0").collect()[0]
    )
    assert red["n_redactions"] == 3
    import hashlib

    redacted = (
        f"acct Customer#000000000 segment {seg}"
        " email <EMAIL> phone <PHONE> ip <IP>"
    )
    assert red["redacted_md5"] == hashlib.md5(redacted.encode()).hexdigest()


def test_facility_location_matches_numpy_reference(spark, sf_smoke):
    """The distributed greedy must equal a driver-side numpy
    implementation of facility-location selection with identical
    rounding and tiebreaks — the full pick SEQUENCE, not just the set."""
    import hashlib

    from similarity_analysis_big_data_spark.plans.clustering import (
        FACLOC_K,
        FACLOC_MOD,
        FACLOC_POOL,
        facility_location_selection,
    )
    from similarity_analysis_big_data_spark.sources.readers import load_table

    rows = (
        load_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id") % FACLOC_MOD == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    # mirror the operator's fixed-size md5-ordered pool cut
    rows = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(str(r["vec_id"]).encode()).hexdigest(),
            r["vec_id"],
        ),
    )[:FACLOC_POOL]
    ids = np.array(sorted(r["vec_id"] for r in rows))
    X = np.array(
        [list(r["embedding"]) for r in sorted(rows, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)  # includes self-sims, like the operator

    gains0 = np.round(S.sum(axis=1), 6)
    first = int(np.argmax(gains0))  # argmax returns first max → id-asc tie
    picks = [first]
    cov = S[:, first].copy()
    for _ in range(1, min(FACLOC_K, len(ids))):
        gains = np.round(np.maximum(S, cov[:, None]).sum(axis=0), 6)
        gains[picks] = -np.inf
        nxt = int(np.argmax(gains))
        picks.append(nxt)
        cov = np.maximum(cov, S[:, nxt])

    got = [
        r["vec_id"]
        for r in sorted(
            facility_location_selection(spark, sf_smoke).collect(),
            key=lambda r: r["rnk"],
        )
    ]
    assert got == [int(ids[p]) for p in picks]


def test_mmr_full_sequence_matches_numpy_reference(spark, sf_smoke):
    """Every MMR pick (not just rank 1) must equal a driver-side numpy
    run of the greedy with the same pool, rounding, and tiebreaks."""
    from similarity_analysis_big_data_spark.plans.ann import (
        MMR_K,
        MMR_POOL,
        MMR_QUERY_MOD,
        mmr_diverse_topk,
    )
    from similarity_analysis_big_data_spark.sources.readers import load_table

    rows = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array(sorted(r["vec_id"] for r in rows))
    X = np.array(
        [list(r["embedding"]) for r in sorted(rows, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    expected = {}
    for qpos, qid in enumerate(ids):
        if qid % MMR_QUERY_MOD != 0:
            continue
        rel = np.round(Xn @ Xn[qpos], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-rel[i], ids[i]),
        )
        pool = order[:MMR_POOL]
        picks = [pool[0]]
        for _ in range(1, min(MMR_K, len(pool))):
            best, best_key = None, None
            for c in pool:
                if c in picks:
                    continue
                maxsim = max(np.round(float(Xn[c] @ Xn[s]), 6) for s in picks)
                score = round(0.7 * float(rel[c]) - 0.3 * maxsim, 6)
                key = (-score, ids[c])
                if best is None or key < best_key:
                    best, best_key = c, key
            picks.append(best)
        expected[int(qid)] = [int(ids[p]) for p in picks]

    out = mmr_diverse_topk(spark, sf_smoke).collect()
    got: dict = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rnk"])):
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got == expected
