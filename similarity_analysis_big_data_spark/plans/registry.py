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
# r1∪…∪r9 union has driver-checked ALL 284 registered queries at least
# once with zero hash failures ever, so round-10 ordering is pure
# freshness rotation plus this round's new and changed queries:
# (1) the THREE queries new in r10 (their first CORRECTNESS window) —
# the temporal PSI drift audit, the l-diversity audit, and the
# vocabulary coverage curve (a planned fourth, a declarative
# expectations gate, was dropped on review: dq_violations_lineitem
# already IS that machinery — one scan, conditional aggregates,
# unpivoted rule rows — and a near-duplicate would be padding); (2) the FOUR queries whose
# answers change in r10 — the CUSUM changepoint (tie-break to earliest
# day is now deterministic), the Benford audit (abs() + digits-1..9
# guard), tokenizer fertility (NULL-not-Infinity ratio guards), and the
# audio fingerprint alignment (integer-DCT spectral payload replaces
# the md5-byte frames) — all green in the local parity suite, but the
# driver ledger must re-witness the new answers; (3) the 28 queries
# whose latest driver row dates from r3 (the oldest rows anywhere);
# (4) the alphabetically first 18 of the 44 r4-latest rows. The head is
# 53 rows, so the last few r4 rows may fall past the ~50-row window —
# they stay r4 and lead the r11 rotation with the rest of that tail.
# After r10 no latest row predates r4. (Pure presentation order —
# every query is in the map either way.)
PRIORITY: tuple[str, ...] = (
    # -- new in r10: first driver window --
    "psi_drift_order_totals",
    "l_diversity_audit",
    "vocab_coverage_curve",
    # -- semantics changed in r10: re-witness first --
    "cusum_changepoint_daily_revenue",
    "benford_first_digit_audit",
    "tokenizer_fertility_by_lang",
    "audio_fingerprint_align_pairs",
    # -- latest driver row r3: the oldest of the ledger --
    "markov_event_transitions",
    "math_function_battery",
    "merge_upsert_customer_state",
    "mixture_temperature_resample",
    "mutual_knn_pairs",
    "null_safe_join_segments",
    "point_in_time_state_join",
    "q17_small_quantity_revenue",
    "q21_blocking_suppliers",
    "q2_min_cost_supplier",
    "q4_late_order_priority",
    "quality_logreg_gate",
    "recursive_cte_trade_reachability",
    "regexp_function_battery",
    "salted_heavy_hitter_terms",
    "scd2_user_state_history",
    "snapshot_diff_orders",
    "stable_doc_reindex",
    "string_function_battery",
    "supplier_part_list",
    "title_retrieval_accuracy",
    "triangle_count_trade",
    "try_function_battery",
    "variant_props_profile",
    "window_lag_delta",
    "window_range_7day_spend",
    "window_running_user_spend",
    "window_value_functions",
    # -- latest driver row r4, alphabetical: fill the window --
    "abc_revenue_classification",
    "ann_ivf_ndcg_at_k",
    "ann_pq_recall_at_k",
    "association_rules_parts",
    "bm25_top_docs",
    "boolean_and_retrieval",
    "bpe_merge_pairs",
    "cold_start_part_recommendations",
    "conversion_latency_percentiles",
    "copurchase_part_pairs",
    "customer_spend_gini",
    "daily_revenue_deseasonalized",
    "decimal_exact_totals",
    "doclen_decile_profile",
    "embedding_covariance_cells",
    "embedding_dim_variance",
    "explode_variants_battery",
    "hourly_series_interpolated",
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
