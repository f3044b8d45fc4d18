"""Query registry: the engine's public query surface.

Every operator implemented from SURVEY.md §2 registers here as a named
query — a ``(spark, sf_dir) -> DataFrame`` callable plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string the driver
hash-compares against at sf0.01. Queries whose semantics cannot be stated
in portable SQL (streaming state, approximate sketches) register with
``oracle=None`` and get a rows-only check.

Column-name parity note: the driver's comparator sorts columns by name
before hashing, so every computed column is aliased identically on the
Spark side and in the oracle SQL. Double-typed outputs are rounded on BOTH
sides so cross-engine float summation order cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL over the pre-registered views
    headline: bool = False  # included in bench.py's timed set
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Names surfaced FIRST in query_map()/oracle_sql_map(). The round driver
# samples ~50 registry entries per round in presentation order; the
# r1∪…∪r7 union has driver-checked every registered query at least once,
# so round-8 ordering is a FRESHNESS rotation (r7 verdict item 1): the
# new r8 queries lead (their first CORRECTNESS window), then the two
# rows-only queries whose ledger rows should surface their oracle-checked
# twins (r7 verdict item 6), then the 64 queries whose latest driver row
# dates from r1/r2 — the ~13 whose implementing code was refactored since
# their last row first, the rest oldest-first. (Pure presentation order —
# every query is in the map either way.)
#
# r9 rotation note: after the r8 driver run, lead with (a) whatever of the
# 64-stale tail below fell outside the ~50-row window, and (b) the queries
# whose SEMANTICS changed in r8 without an r8 driver row — the sweep-cap
# family (ann_matryoshka_recall_at_k, ann_rerank_two_stage,
# cosine_histogram_sampled, entity_name_clusters — embedding_near_dup_pairs
# and fuzzy_levenshtein_pairs are already in the window below) and the
# floor-pinned dataset_card_summary — all green in the local parity suite
# but the driver ledger should re-witness them.
PRIORITY: tuple[str, ...] = (
    # -- new in r8: first driver window --
    "image_near_dup_survivors",
    "stream_twin_hourly_dedup",
    # -- rows-only pair: resample so the ledger rows carry the twin: docs --
    "pca_project_embeddings",
    "ann_pq_trained_recall_at_k",
    # -- stale (latest row r1/r2) AND refactored since: resample first --
    "semdedup_cell_survivors",
    "minhash_lsh_candidates",
    "minhash_dedup_verified",
    "ann_ivf_topk",
    "ann_ivf_recall_at_k",
    "ann_ivf_multiprobe_topk",
    "ann_bruteforce_topk",
    "ann_hyperplane_lsh_buckets",
    "corpus_curation_pipeline",
    "kmeans_embedding_clusters",
    "multimodal_binary_metadata",
    "multimodal_fake_features",
    "multimodal_frame_sample",
    # -- remaining stale rows, oldest driver row first (r1, then r2) --
    "approx_percentile_order_value",
    "global_sorted_orders",
    "global_topn_orders",
    "grouping_sets_revenue",
    "monthly_order_stats",
    "percentile_order_value",
    "point_lookup",
    "projection_filter_scan",
    "range_join_price_bracket",
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "setop_union_distinct",
    "string_functions_cleanup",
    "top1_order_per_customer",
    "topk_lineitems_per_order",
    "unpivot_order_measures",
    "window_rank_frame",
    "anti_join_dormant_customers",
    "bigram_surprisal_scores",
    "bloom_runtime_filter_join",
    "chunk_documents_stride",
    "conditional_accuracy",
    "cube_status_priority",
    "decontaminate_against_eval",
    "dedup_canonical_tokenset",
    "dedup_exact_groups",
    "distinct_parts_per_supplier",
    "doc_rolling_fingerprint",
    "embedding_int8_quantization",
    "embedding_near_dup_pairs",
    "fuzzy_levenshtein_pairs",
    "global_count",
    "hof_embedding_stats",
    "incremental_agg_merge",
    "inverted_index_postings",
    "left_join_null_fill",
    "ngram_jaccard_pairs",
    "pack_docs_token_budget",
    "pagerank_trade_nations",
    "passage_dup_stats",
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q5_region_volume",
    "rollup_revenue",
    "semi_join_active_customers",
    "simhash_hamming_pairs",
    "source_cap_documents",
    "unigram_surprisal_scores",
    "weekly_cohort_retention",
    "zorder_key_events",
)


def _ordered() -> dict[str, QuerySpec]:
    lead = [n for n in PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in PRIORITY]
    return {n: QUERIES[n] for n in [*lead, *rest]}


def query_map() -> dict[str, QueryFn]:
    """The ``queries()`` payload for ``__spark_entry__``."""
    _load_all()
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql_map() -> dict[str, str]:
    """The ``oracle_sql()`` payload for ``__spark_entry__``."""
    _load_all()
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    """The subset bench.py times at sf0.1."""
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items() if spec.headline}


_LOADED = False


def _load_all() -> None:
    """Import every plans module so registration side effects run."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics,
        ann,
        clustering,
        curation,
        datapipe,
        dedup,
        graph,
        layout,
        lm,
        multimodal,
        pii,
        relational,
        sampling,
        similarity,
        stats,
        subqueries,
        textstats,
        tpch_analogs,
        udaf_queries,
    )

    _LOADED = True
