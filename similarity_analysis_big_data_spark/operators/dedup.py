"""Deduplication operators (north-star [ext]: LLM-training-data pipeline).

Five dedup modes over a document relation, all long-format DataFrame
compositions (no driver loops, no UDFs):

- exact: hash-groupBy on content digest
- canonical: groupBy on an order-insensitive token-set fingerprint
- MinHash + LSH: shingle -> K permutation mins -> band -> bucket self-join
- SimHash: weighted bit-majority signature + hamming-distance pairing
- n-gram Jaccard: exact set overlap via shingle join (also the verifier
  behind the LSH candidates)

Scale notes: the LSH band join is the O(n²)-killer — candidate pairs come
only from shared buckets. Hot buckets (boilerplate shingles) are the skew
risk: AQE skew-join plus an optional per-bucket cap handle it. The exact
modes are single hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE_P,
    md5_long,
    minhash_expr,
)


def exact_dedup_groups(docs: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup: one row per distinct content digest.

    Returns (digest, keep_id, n_copies) — keep_id is the smallest id in the
    group (deterministic survivor policy).
    """
    return (
        docs.select(F.md5(F.col(content_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_survivors(docs: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """The deduplicated relation: rows whose id is their group's survivor.

    Window-on-digest formulation — one shuffle, no join back."""
    w = W.partitionBy(F.md5(F.col(content_col)))
    return (
        docs.withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )


def canonical_fingerprint(tokens_col) -> "F.Column":
    """Order/multiplicity-insensitive content key: sorted distinct tokens."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens_col)), " "))


def minhash_signatures(
    shingles: DataFrame, id_col: str, shingle_col: str = "shingle"
) -> DataFrame:
    """(id, shingle) long rows -> (id, mh0..mhK-1).

    One hash aggregate: per permutation, min over the doc's shingle hashes.
    The md5-derived shingle id is computed once and reused by all K
    permutations (cheap column math, K extra agg expressions — not K passes).
    """
    h = (md5_long(shingle_col) % MERSENNE_P).alias("_h")
    hashed = shingles.select(F.col(id_col), h)
    aggs = [
        F.min(minhash_expr("_h", i)).alias(f"mh{i}")
        for i in range(LSH_BANDS * LSH_ROWS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_band_entries(signatures: DataFrame, id_col: str) -> DataFrame:
    """(id, mh0..mhK-1) -> long-format (id, band, key) bucket entries.

    The probe-able LSH index relation: production materializes this
    bucketed by (band, key) so incremental batches probe it with a
    co-located join (see plans/dedup.incremental_near_dup_delta)."""
    band_entries = []
    for b in range(LSH_BANDS):
        key = F.concat_ws(
            ":", *[F.col(f"mh{b * LSH_ROWS + r}").cast("string") for r in range(LSH_ROWS)]
        )
        band_entries.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_entries)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, max_bucket_size: int | None = None
) -> DataFrame:
    """Band the signatures and self-join per band: (id_l, id_r) candidates.

    A pair collides if ALL rows of some band match (classic banding).
    Unpivot to (id, band, key) first so the join is a single equi-join on
    (band, key) instead of LSH_BANDS separate joins; distinct() collapses
    pairs that collide in several bands.

    ``max_bucket_size`` is the hot-bucket skew lever: a bucket of b docs
    emits b·(b-1)/2 candidate pairs, so one boilerplate bucket of 10⁵
    members is 5·10⁹ pairs on a single reducer. Capping drops the
    OVERSIZED buckets entirely (one count aggregate over the band
    relation — never the pair fan-out). The documented recall trade: a
    pair whose every colliding band is oversized is missed; near-dups of
    genuinely distinct content collide in some non-boilerplate band and
    survive. None (the default) keeps exact banding semantics — the
    oracle-checked queries use None; the cap is the 100 TB deployment
    knob."""
    banded = lsh_band_entries(signatures, id_col)
    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "key").agg(F.count("*").alias("_bsz"))
        banded = (
            banded.join(
                sizes.filter(F.col("_bsz") <= max_bucket_size), ["band", "key"]
            )
            .drop("_bsz")
        )

    lhs = banded.withColumnRenamed(id_col, "id_l")
    rhs = banded.withColumnRenamed(id_col, "id_r")
    return (
        lhs.join(rhs, ["band", "key"])
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    min_intersection: int = 1,
    candidates: DataFrame | None = None,
    assume_distinct: bool = False,
    threshold: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets: (id_l, id_r, jaccard).

    Sparse-join formulation (same shape as the cosine join): only pairs
    sharing a shingle materialize. With ``candidates`` (e.g. LSH output)
    the join is pre-filtered — the LSH-then-verify pattern.
    ``assume_distinct`` skips the defensive (id, shingle) distinct — set
    it ONLY when rows are distinct by construction (the dedup plans
    explode ``array_distinct`` token sets); duplicate rows would inflate
    n_common and set sizes.

    ``threshold`` (candidates path only): the caller's eventual Jaccard
    cutoff as an exact rational num/den. J(x,y) >= n/d forces
    d·min(|x|,|y|) >= n·max(|x|,|y|) (since |x∩y| <= min and
    J <= min/max), so candidate pairs violating that size-ratio bound are
    dropped BEFORE the shingle fan-out — an exact prefilter, zero false
    negatives at the caller's cutoff (r12 verdict item 4: the verify join
    was the heaviest increment of the near-dup profile). Pairs that
    survive the ratio but land under the cutoff are still emitted with
    their exact jaccard, so callers keep their own ``>= t`` filter; only
    pairs PROVABLY below the cutoff disappear. The sizes join moves ahead
    of the fan-out and rides it (two post-agg joins removed), and each
    pair fans out by its SMALLER side — intersection is symmetric, so
    probing with the smaller set cuts the fan-out volume from
    Σ|set_l| to Σ min(|set_l|, |set_r|) over candidates.
    """
    sets = shingles.select(F.col(id_col), F.col(shingle_col))
    if not assume_distinct:
        sets = sets.distinct()
    sizes = sets.groupBy(id_col).agg(F.count("*").alias("set_size"))

    if candidates is not None and threshold is not None:
        num, den = threshold
        sz_l = sizes.select(F.col(id_col).alias("id_l"), F.col("set_size").alias("size_l"))
        sz_r = sizes.select(F.col(id_col).alias("id_r"), F.col("set_size").alias("size_r"))
        small_l = F.col("size_l") <= F.col("size_r")
        probed = (
            candidates.select("id_l", "id_r")
            .distinct()  # same precondition as the un-thresholded path below
            .join(sz_l, "id_l")
            .join(sz_r, "id_r")
            .filter(
                den * F.least("size_l", "size_r") >= num * F.greatest("size_l", "size_r")
            )
            .select(
                "id_l",
                "id_r",
                "size_l",
                "size_r",
                F.when(small_l, F.col("id_l")).otherwise(F.col("id_r")).alias("_probe"),
                F.when(small_l, F.col("id_r")).otherwise(F.col("id_l")).alias("_other"),
            )
        )
        inter = (
            probed.join(sets.select(F.col(id_col).alias("_probe"), shingle_col), "_probe")
            .join(sets.select(F.col(id_col).alias("_other"), shingle_col), [shingle_col, "_other"])
            .groupBy("id_l", "id_r", "size_l", "size_r")
            .agg(F.count("*").alias("n_common"))
            .filter(F.col("n_common") >= min_intersection)
        )
        return inter.select(
            "id_l",
            "id_r",
            (
                F.col("n_common")
                / (F.col("size_l") + F.col("size_r") - F.col("n_common"))
            ).alias("jaccard"),
        )

    if candidates is not None:
        # CANDIDATE-DRIVEN intersection: fan each candidate pair out by the
        # left doc's shingles, close on (id_r, shingle). Cost is
        # sum(|set_l|) over candidate pairs — bounded by the LSH output —
        # NOT sum(df^2) over shingles, which is the quadratic blowup LSH
        # exists to avoid (the previous formulation aggregated ALL
        # shingle-sharing pairs and only then semi-joined the candidates;
        # property-tested ≡ below).
        lhs = sets.select(F.col(id_col).alias("id_l"), shingle_col)
        rhs = sets.select(F.col(id_col).alias("id_r"), shingle_col)
        # .distinct() guards against duplicate candidate rows, which would
        # multiply n_common (jaccard > 1). lsh_candidate_pairs already ends
        # in .distinct(), so for that caller this folds into the existing
        # agg; for arbitrary callers it is the correctness precondition.
        inter = (
            candidates.select("id_l", "id_r")
            .distinct()
            .join(lhs, "id_l")
            .join(rhs, [shingle_col, "id_r"])
            .groupBy("id_l", "id_r")
            .agg(F.count("*").alias("n_common"))
            .filter(F.col("n_common") >= min_intersection)
        )
    else:
        lhs = sets.withColumnRenamed(id_col, "id_l")
        rhs = sets.withColumnRenamed(id_col, "id_r")
        inter = (
            lhs.join(rhs, shingle_col)
            .filter(F.col("id_l") < F.col("id_r"))
            .groupBy("id_l", "id_r")
            .agg(F.count("*").alias("n_common"))
            .filter(F.col("n_common") >= min_intersection)
        )
    sz_l = sizes.select(F.col(id_col).alias("id_l"), F.col("set_size").alias("size_l"))
    sz_r = sizes.select(F.col(id_col).alias("id_r"), F.col("set_size").alias("size_r"))
    return (
        inter.join(sz_l, "id_l")
        .join(sz_r, "id_r")
        .select(
            "id_l",
            "id_r",
            (
                F.col("n_common")
                / (F.col("size_l") + F.col("size_r") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def simhash_signatures(
    term_weights: DataFrame, id_col: str, term_col: str = "term", weight_col: str = "weight", bits: int = 32
) -> DataFrame:
    """(id, term, weight) -> (id, simhash) via weighted bit majority.

    Explodes each term into ``bits`` rows (bit index b contributes
    +w / -w by bit b of the term hash), aggregates per (id, b), then folds
    the majority bits back into one int64. Two hash aggregates, all
    column math — the 32× row blowup is map-side only.
    """
    hashed = term_weights.select(
        F.col(id_col),
        (md5_long(term_col)).alias("_h"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    exploded = hashed.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        F.col("_h"),
        F.col("_w"),
    ).select(
        id_col,
        "bit",
        # python API shiftright/shiftleft take a literal bit count; the SQL
        # forms accept column expressions
        F.when(F.expr("shiftright(_h, bit) & 1") == 1, F.col("_w"))
        .otherwise(-F.col("_w"))
        .alias("contrib"),
    )
    bit_sums = exploded.groupBy(id_col, "bit").agg(F.sum("contrib").alias("s"))
    return bit_sums.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_pairs(signatures: DataFrame, id_col: str, max_hamming: int) -> DataFrame:
    """All pairs with hamming(simhash_l, simhash_r) <= max_hamming.

    EXACT O(n²) form — the small-scale oracle that ``simhash_banded_pairs``
    is property-tested against. Never the production path: use the banded
    form, which returns the identical pair set without a cross join.
    """
    lhs = signatures.select(F.col(id_col).alias("id_l"), F.col("simhash").alias("sh_l"))
    rhs = signatures.select(F.col(id_col).alias("id_r"), F.col("simhash").alias("sh_r"))
    # bit_count is int32 in Spark; long for cross-engine schema stability
    hamming = F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r"))).cast("long")
    return (
        lhs.crossJoin(rhs)
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_banded_pairs(
    signatures: DataFrame, id_col: str, max_hamming: int, bits: int = 32
) -> DataFrame:
    """Banded (LSH-style) SimHash pairing — same result set as
    ``simhash_pairs``, no cross join.

    Pigeonhole recall guarantee: split the ``bits`` signature bits into
    ``max_hamming + 1`` disjoint bands; a pair within hamming distance
    ``max_hamming`` has at most ``max_hamming`` differing bits, so at least
    one band is bit-identical — every qualifying pair collides in some
    band's bucket. The equi-join on (band, band_bits) generates candidates;
    exact hamming on the carried signatures then removes false positives.

    Scale: candidates come only from shared buckets — the corpus never
    all-pairs. Selectivity grows with band width (bits/(h+1)); a tight
    threshold (h=3 on 32 bits → 8-bit bands, 256-way split) is the sweet
    spot. Wide thresholds like h=12 leave 2-3-bit bands — still a large
    constant-factor win over n² and AQE splits the hot buckets, but if you
    need h≈bits/2 at 100 TB, widen the signature (64/128 bits) so bands
    stay selective.
    """
    if not 0 <= max_hamming < bits:
        raise ValueError(f"max_hamming must be in [0, {bits}); got {max_hamming}")
    n_bands = max_hamming + 1
    base, rem = divmod(bits, n_bands)
    entries = []
    off = 0
    for b in range(n_bands):
        width = base + (1 if b < rem else 0)
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                F.expr(f"shiftright(simhash, {off}) & {(1 << width) - 1}").alias("key"),
            )
        )
        off += width
    banded = signatures.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*entries)).alias("bk")
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    lhs = banded.select(
        F.col(id_col).alias("id_l"), F.col("simhash").alias("sh_l"), "band", "key"
    )
    rhs = banded.select(
        F.col(id_col).alias("id_r"), F.col("simhash").alias("sh_r"), "band", "key"
    )
    hamming = F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r"))).cast("long")
    return (
        lhs.join(rhs, ["band", "key"])
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # collapse multi-band collisions of the same pair
    )


def jaccard_verify_candidates(
    token_sets: DataFrame,
    id_col: str,
    tokens_col: str,
    candidates: DataFrame,
) -> DataFrame:
    """Exact Jaccard computed ONLY for candidate pairs (the verify stage of
    LSH-then-verify): join the candidate relation with each side's distinct
    token array and intersect per row.

    ``jaccard_pairs`` materializes EVERY shingle-sharing pair before the
    candidate semi-join prunes; under a narrow vocabulary (where every doc
    shares shingles with every doc) that degenerates to the all-pairs
    blowup LSH exists to avoid. This formulation's work is
    O(|candidates| x avg set size): each doc's token array is shuffled once
    per join side and never pairwise-exploded. Output matches
    ``jaccard_pairs(candidates=...)`` for every pair with >= 1 shared
    token; zero-overlap candidates additionally appear with jaccard 0.0
    (callers threshold above it).
    """
    l = token_sets.select(
        F.col(id_col).alias("id_l"), F.col(tokens_col).alias("_t_l")
    )
    r = token_sets.select(
        F.col(id_col).alias("id_r"), F.col(tokens_col).alias("_t_r")
    )
    n_common = F.size(F.array_intersect("_t_l", "_t_r"))
    return (
        candidates.join(l, "id_l")
        .join(r, "id_r")
        .select(
            "id_l",
            "id_r",
            (
                n_common
                / (F.size("_t_l") + F.size("_t_r") - n_common)
            ).alias("jaccard"),
        )
    )


def substring_span_pairs(
    toks: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    cap: int = 64,
    min_span: int = 12,
) -> DataFrame:
    """Exact-substring dedup (the sixth mode — Lee et al. 2022's substring
    dedup, re-expressed hash-gram-first): every duplicated run of
    ``>= min_span`` consecutive tokens shared by a doc pair becomes one
    maximal span row ``(id_l, id_r, start_l, start_r, span_tokens)``.

    ``toks`` is ``(id_col, tokens array<string>)``. Positioned ``k``-grams
    bucket by gram value in ONE wide shuffle (the suffix-array alternative:
    hash buckets need no global order); each bucket emits its ordered doc
    pairs JVM-side via higher-order transform/filter; runs of consecutive
    matching grams on the same diagonal (pos_l - pos_r) merge
    gaps-and-islands; a run of g grams is a span of g+k-1 tokens.

    ``cap`` is the hot-bucket skew lever (same contract as
    ``lsh_candidate_pairs``'s max_bucket_size): a gram occurring n times
    would emit O(n²) pairs on one reducer; buckets over ``cap``
    occurrences are dropped entirely, which only suppresses
    stopword-like grams whose spans the per-diagonal merge would
    fragment anyway. Every stage past the gram shuffle is priced by
    matched-pair volume, never corpus size.
    """
    from ..functions.text import with_word_ngrams

    # compiled-Scala positioned k-grams (r13): the interpreted
    # transform/slice/array_join HOF was the dominant per-task cost of
    # this relation (same finding as ppjoin's gram build); NGram output
    # is position-ordered, so posexplode yields identical (pos, gram) rows
    sized = toks.filter(F.size("tokens") >= k)
    grams = with_word_ngrams(sized, "tokens", k, "_g").select(
        id_col, F.posexplode("_g").alias("pos", "gram")
    )
    buckets = (
        grams.groupBy("gram")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col), F.col("pos").cast("long").alias("pos"))
            ).alias("occs")
        )
        .filter(F.size("occs") <= cap)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                f"flatten(transform(occs, a -> "
                f"transform(filter(occs, b -> b.{id_col} > a.{id_col}), "
                f"b -> struct(a.{id_col} AS id_l, b.{id_col} AS id_r, "
                f"a.pos AS pos_l, a.pos - b.pos AS diag))))"
            )
        ).alias("p")
    ).select("p.*")
    w = W.partitionBy("id_l", "id_r", "diag").orderBy("pos_l")
    islands = pairs.withColumn("isl", F.col("pos_l") - F.row_number().over(w))
    return (
        islands.groupBy("id_l", "id_r", "diag", "isl")
        .agg(
            F.min("pos_l").alias("start_l"),
            (F.count("*") + (k - 1)).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span)
        .select(
            "id_l",
            "id_r",
            "start_l",
            (F.col("start_l") - F.col("diag")).alias("start_r"),
            "span_tokens",
        )
    )


def substring_coverage(
    toks: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    cap: int = 64,
    min_span: int = 12,
) -> DataFrame:
    """Per-document duplicated-token coverage over ``substring_span_pairs``:
    union the span intervals each doc participates in (either side of
    every pair), merge overlapping intervals gaps-and-islands, and report
    ``(doc_id, n_tokens, dup_tokens, dup_fraction)`` for every doc with at
    least one token — docs with no duplicated span surface with coverage
    0 via the left join, so the output audits the whole corpus.

    Scale: the interval union windows over doc_id with spans-per-doc
    cardinality; the final join back to per-doc token counts is
    key-grained.
    """
    spans = substring_span_pairs(toks, id_col, k=k, cap=cap, min_span=min_span)
    # distinct: identical intervals (a doc sharing the same span with
    # several partners) carry no information for a union, and tied rows
    # in the island windows are an engine-order hazard (see the oracle's
    # iv CTE note in plans/dedup.py)
    iv = (
        spans.select(
            F.col("id_l").alias(id_col),
            F.col("start_l").alias("s"),
            (F.col("start_l") + F.col("span_tokens")).alias("e"),
        )
        .unionByName(
            spans.select(
                F.col("id_r").alias(id_col),
                F.col("start_r").alias("s"),
                (F.col("start_r") + F.col("span_tokens")).alias("e"),
            )
        )
        .distinct()
    )
    w = W.partitionBy(id_col).orderBy("s", "e")
    prev_end = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    grp = iv.withColumn(
        "new_isl",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn("g", F.sum("new_isl").over(w.rowsBetween(W.unboundedPreceding, 0)))
    cov = (
        grp.groupBy(id_col, "g")
        .agg((F.max("e") - F.min("s")).alias("seg"))
        .groupBy(id_col)
        .agg(F.sum("seg").alias("dup_tokens"))
    )
    lens = toks.select(
        id_col, F.size("tokens").cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    return lens.join(cov, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0).cast("long")) / F.col("n_tokens"), 6
        ).alias("dup_fraction"),
    )


def substring_dedup_rewrite(
    toks: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    cap: int = 64,
    min_span: int = 12,
) -> DataFrame:
    """The removal half of exact-substring dedup (Lee et al. 2022): drop
    every token position covered by a duplicated span on the doc's RIGHT
    side (id_r — the higher id loses; the id_l copy is the surviving
    first occurrence) and reassemble the remaining tokens in order.
    Returns ``(id_col, n_tokens, kept_tokens, text_dedup)`` for every doc
    with at least one token.

    Scale: the removal intervals are span-volume-sized, group to one
    array row per AFFECTED doc, and join LEFT onto the corpus — the
    position filter is a JVM-side higher-order ``filter`` over each
    token array (no explode of the corpus, no per-position join).
    """
    spans = substring_span_pairs(toks, id_col, k=k, cap=cap, min_span=min_span)
    rem = spans.select(
        F.col("id_r").alias(id_col),
        F.col("start_r").alias("s"),
        (F.col("start_r") + F.col("span_tokens")).alias("e"),
    ).distinct()
    ivs = rem.groupBy(id_col).agg(F.collect_list(F.struct("s", "e")).alias("arr"))
    kept = F.expr(
        "filter(tokens, (tok, pi) -> arr IS NULL "
        "OR NOT exists(arr, iv -> pi >= iv.s AND pi < iv.e))"
    )
    return (
        toks.filter(F.size("tokens") > 0)
        .join(ivs, id_col, "left")
        .select(
            id_col,
            F.size("tokens").cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("kept_tokens"),
            F.array_join(kept, " ").alias("text_dedup"),
        )
    )


def substring_span_pairs_delta(
    base_toks: DataFrame,
    delta_toks: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    cap: int = 64,
    min_span: int = 12,
) -> DataFrame:
    """Incremental exact-substring dedup: spans shared between a DELTA
    batch and the BASE corpus only — the daily-crawl ingest shape, where
    cost is base-gram-index x delta, never base x base re-run.

    Returns ``(id_delta, id_base, start_delta, start_base, span_tokens)``.
    The base side is a positioned-gram relation a production deployment
    materializes once (bucketed by gram) and PROBES per batch; ``cap``
    drops base grams occurring more than ``cap`` times (the same
    hot-bucket lever as the batch operator — a boilerplate gram would
    fan every delta occurrence out by its full base posting list).
    """

    def _grams(toks: DataFrame) -> DataFrame:
        from ..functions.text import with_word_ngrams

        return with_word_ngrams(
            toks.filter(F.size("tokens") >= k), "tokens", k, "_g"
        ).select(id_col, F.posexplode("_g").alias("pos", "gram"))

    bg = _grams(base_toks)
    occ = bg.groupBy("gram").agg(F.count("*").alias("_occ"))
    bcap = bg.join(occ.filter(F.col("_occ") <= cap), "gram").drop("_occ")
    dg = _grams(delta_toks)
    pairs = dg.alias("d").join(bcap.alias("b"), "gram").select(
        F.col(f"d.{id_col}").alias("id_delta"),
        F.col(f"b.{id_col}").alias("id_base"),
        F.col("d.pos").cast("long").alias("pos_d"),
        (F.col("d.pos") - F.col("b.pos")).cast("long").alias("diag"),
    )
    w = W.partitionBy("id_delta", "id_base", "diag").orderBy("pos_d")
    islands = pairs.withColumn("isl", F.col("pos_d") - F.row_number().over(w))
    return (
        islands.groupBy("id_delta", "id_base", "diag", "isl")
        .agg(
            F.min("pos_d").alias("start_delta"),
            (F.count("*") + (k - 1)).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span)
        .select(
            "id_delta",
            "id_base",
            "start_delta",
            (F.col("start_delta") - F.col("diag")).alias("start_base"),
            "span_tokens",
        )
    )


def ppjoin_pairs(
    token_sets: DataFrame,
    id_col: str,
    token_col: str = "token",
    threshold: tuple[int, int] = (1, 2),
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering (AllPairs /
    PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08).

    The deterministic complement to MinHash-LSH: zero false negatives at
    the cost of an exact-overlap verify, where LSH trades a tunable miss
    rate for hash-sized signatures. Input is a distinct (id, token)
    relation; output is every pair with Jaccard >= num/den, with the
    integer intersection/size witnesses attached.

    Prefix-filter lemma: order each set by GLOBAL ascending document
    frequency (rarest first, ties by token). If J(x,y) >= t then
    |x ∩ y| >= ceil(t·max(|x|,|y|)), so x and y must share a token among
    their first |·| - ceil(t·|·|) + 1 ordered tokens — joining ONLY the
    prefixes loses no qualifying pair. Rare-first ordering makes prefix
    buckets small (df=1 tokens match only their one other occurrence),
    which is what bounds the candidate fan-out.

    All threshold arithmetic is integer-exact (``threshold`` is a
    rational num/den): prefix length uses ``(num·sz + den−1) div den``
    and the final filter is ``den·inter >= num·union`` — no float
    boundary wobble at J == t.

    Scale: one shuffle keys the df join on token, one window pass per
    doc ranks the set (partitioned by id — never a global window), the
    prefix self-join touches only prefix tokens, and the verify is
    candidate-driven (cost ∝ Σ|set_l| over surviving candidates, the
    same shape as jaccard_pairs(candidates=...)). The skew lever is the
    same as LSH banding: a token with huge df lands at the END of every
    ordering, so it only enters a prefix when a set is nearly all
    boilerplate — prefix buckets stay df-bounded by construction.
    """
    num, den = threshold
    sets = token_sets.select(
        F.col(id_col).alias("_id"), F.col(token_col).alias("_tok")
    )
    dfreq = sets.groupBy("_tok").agg(F.count("*").alias("_df"))
    w_order = W.partitionBy("_id").orderBy("_df", "_tok")
    w_all = W.partitionBy("_id")
    ranked = sets.join(dfreq, "_tok").select(
        "_id",
        "_tok",
        F.row_number().over(w_order).alias("_rk"),
        F.count("*").over(w_all).alias("_sz"),
    )
    prefix = ranked.filter(
        F.col("_rk")
        <= F.col("_sz") - F.expr(f"({num} * _sz + {den - 1}) div {den}") + F.lit(1)
    ).select("_id", "_tok", "_sz")
    lhs = prefix.select(
        F.col("_id").alias("id_l"), "_tok", F.col("_sz").alias("_szl")
    )
    rhs = prefix.select(
        F.col("_id").alias("id_r"), "_tok", F.col("_sz").alias("_szr")
    )
    # Carry the set sizes THROUGH the verify instead of re-aggregating and
    # re-joining them after the intersection (r13): the prefix relation
    # already owns _sz (the per-doc window count == |set| under the
    # distinct-input precondition), so the post-agg sizes groupBy + two
    # joins are pure recompute. distinct over the extra size columns keeps
    # the same pair set (sizes are functionally dependent on the ids).
    # Each surviving candidate then fans out by its SMALLER side —
    # intersection is symmetric, so probing with the smaller set cuts the
    # verify volume from Σ|set_l| to Σ min(|set_l|, |set_r|).
    small_l = F.col("_szl") <= F.col("_szr")
    cand = (
        lhs.join(rhs, "_tok")
        .filter(
            (F.col("id_l") < F.col("id_r"))
            # length filter: den·min(sz) >= num·max(sz), two-sided form
            & (num * F.col("_szl") <= den * F.col("_szr"))
            & (num * F.col("_szr") <= den * F.col("_szl"))
        )
        .select("id_l", "id_r", "_szl", "_szr")
        .distinct()
        .select(
            "id_l",
            "id_r",
            "_szl",
            "_szr",
            F.when(small_l, F.col("id_l")).otherwise(F.col("id_r")).alias("_probe"),
            F.when(small_l, F.col("id_r")).otherwise(F.col("id_l")).alias("_other"),
        )
    )
    inter = (
        cand.join(sets.select(F.col("_id").alias("_probe"), "_tok"), "_probe")
        .join(sets.select(F.col("_id").alias("_other"), "_tok"), ["_tok", "_other"])
        .groupBy("id_l", "id_r", "_szl", "_szr")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.filter(
            den * F.col("n_common")
            >= num * (F.col("_szl") + F.col("_szr") - F.col("n_common"))
        )
        .select(
            "id_l",
            "id_r",
            "n_common",
            F.col("_szl").alias("size_l"),
            F.col("_szr").alias("size_r"),
        )
    )
