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
# r1∪…∪r11 union has driver-checked ALL 287 registered queries at least
# once with zero hash failures ever, so round-12 ordering is pure
# freshness rotation (the r11 verdict's items 2 and 6): (1) the 29
# queries whose latest driver row dates from r5 — the oldest rows
# anywhere after the r11 window retired the r4 cohort; (2) the 14
# r6-latest rows; (3) the two rows-only queries (`pca_project_embeddings`,
# `ann_pq_trained_recall_at_k` — `err: no_oracle` by design, last rows
# r8) together with their hash-checked twins
# (`pca_fixed_basis_projection`, `embedding_covariance_cells`) so the
# rows-only pairing stays visibly current; (4) the alphabetically first
# r7-latest rows to fill the ~50-row window. After r12 no latest row
# predates r7. (Pure presentation order — every query is in the map
# either way.)
PRIORITY: tuple[str, ...] = (
    # -- latest driver row r5: the oldest of the ledger --
    "null_semantics_audit",
    "profile_orders_columns",
    "q10_returned_item_revenue",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q18_large_volume_orders",
    "q22_dormant_rich_customers",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "regr_price_vs_qty",
    "robust_stats_by_source",
    "sessionization_gap",
    "sliding_window_event_counts",
    "stratified_sample_by_lang",
    "subq_correlated_small_qty",
    "subq_exists_returned",
    "subq_in_big_spenders",
    "subq_not_exists_unreturned_parts",
    "subq_not_in_quiet_suppliers",
    "subq_scalar_above_avg",
    "text_quality_scores",
    "token_count_stats",
    "train_val_test_split",
    "training_corpus_filtered",
    "user_event_burstiness",
    "weighted_median_price",
    "weighted_reservoir_sample",
    "window_percent_rank",
    # -- latest driver row r6 --
    "contrastive_pair_mining",
    "cross_source_dup_matrix",
    "exact_substring_spans",
    "funnel_view_click_purchase",
    "incremental_substring_delta",
    "perplexity_bucket_filter",
    "ppjoin_exact_pairs",
    "rrf_fusion_retrieval",
    "stream_twin_dedup",
    "substring_dedup_rewrite",
    "substring_dup_coverage",
    "token_budget_after_dedup",
    "weighted_jaccard_pairs",
    "zipf_fit_by_source",
    # -- rows-only queries + their hash-checked twins (r11 verdict item 6) --
    "pca_project_embeddings",
    "ann_pq_trained_recall_at_k",
    "pca_fixed_basis_projection",
    "embedding_covariance_cells",
    # -- latest driver row r7, alphabetical: fill the window --
    "abtest_cuped_adjusted",
    "ann_binary_sign_recall_at_k",
    "ann_filtered_topk",
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
