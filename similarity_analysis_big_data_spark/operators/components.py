"""Connected components over candidate pairs + dedup survivor selection
(SURVEY §7 step 6: "LSH self-join + connected components + anti-join").

Large-Star/Small-Star-style label propagation, simplified to alternating
min-label joins: each node adopts the minimum label in its neighborhood
until fixpoint. Every iteration is a distributed join+agg (the driver only
orchestrates the loop and checks convergence — no data moves through it);
iterations are bounded by the component diameter, which for near-dup
clusters is tiny (dups of one source link to each other).

Reference parity note: the reference has no dedup at all — this implements
the north-star extension; the algorithm follows the well-known
alternating-star formulation from the MapReduce connected-components
literature.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _label_sum(labels: DataFrame):
    # decimal(38,0) sum: overflow-safe fixpoint witness at any graph size
    return labels.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]


def connected_components(
    pairs: DataFrame,
    id_l: str = "id_l",
    id_r: str = "id_r",
    max_iterations: int = 20,
    iteration_shuffle_partitions: int | None = None,
) -> DataFrame:
    """(id_l, id_r) undirected edges -> (id, component) with component =
    min node id reachable.

    Each iteration: label(v) <- min(label(v), min over neighbors of
    label(n)). Converges in O(diameter) rounds; each round is one
    shuffle-join plus one aggregate. ``localCheckpoint(eager=True)``
    truncates the lineage every round — without it the logical plan doubles
    per iteration and planning itself OOMs. Convergence is detected by the
    label sum: labels only ever decrease, so the sum is strictly decreasing
    until fixpoint — one cheap aggregate per round instead of a self-join
    diff. Isolated nodes never appear in pairs — union the full node set
    downstream if needed (dedup_survivors does).
    """
    spark = pairs.sparkSession
    # materialize the pair relation ONCE, and do it UNDER THE CALLER'S
    # shuffle-partition setting: the upstream pipeline feeding the pairs
    # (for dedup: corpus-sized LSH + exact-Jaccard verify) executes inside
    # this eager checkpoint, so the reduced iteration setting must not be
    # installed yet (ADVICE r3 — it was collapsing the flagship dedup
    # path's parallelism, not just the label-sized loop)
    pairs_mat = pairs.select(
        F.col(id_l).alias("src"), F.col(id_r).alias("dst")
    ).localCheckpoint(eager=True)
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if iteration_shuffle_partitions is not None:
        spark.conf.set(conf_key, str(iteration_shuffle_partitions))
    try:
        return _connected_components_loop(pairs_mat, max_iterations)
    finally:
        spark.conf.set(conf_key, saved)


def _connected_components_loop(
    pairs_mat: DataFrame, max_iterations: int
) -> DataFrame:
    # pairs_mat is already materialized as (src, dst) — both union branches
    # reference it without recomputing the upstream chain
    edges = (
        pairs_mat.union(pairs_mat.select(F.col("dst"), F.col("src")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # initialize at min(self, neighbors) — the first propagation round
    # costs nothing extra here (the node set needs this aggregate anyway),
    # so the loop starts one round ahead
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.least(F.first("src"), F.min("dst")).alias("component"))
        .localCheckpoint(eager=True)
    )
    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # pointer jumping (path doubling): also adopt the label OF the
        # current label — component ids are node ids, so label(label(v))
        # exists. Min-neighbor alone needs distance-to-min rounds (a
        # 6-round chain on the sf0.1 fixture); with shortcutting the
        # round count drops to O(log diameter). The extra join is
        # label-sized — negligible next to the edge join.
        lbl2 = stepped.select(
            F.col("id").alias("pid"), F.col("component").alias("pcomp")
        )
        labels = (
            stepped.join(lbl2, stepped.component == lbl2.pid, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("pcomp", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # Exiting on the iteration cap with labels still moving means some
        # component (diameter > max_iterations) is under-merged — dedup
        # built on these labels would silently KEEP near-duplicates. Surface
        # it loudly instead of returning as if converged (ADVICE r1).
        warnings.warn(
            f"connected_components: labels still changing after "
            f"{max_iterations} iterations; long-chain components are "
            f"under-merged — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("id", "component")


def dedup_survivors(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str,
    id_l: str = "id_l",
    id_r: str = "id_r",
    iteration_shuffle_partitions: int | None = None,
) -> DataFrame:
    """The deduplicated relation: per near-dup component keep the smallest
    id; docs in no component survive untouched.

    Anti-join formulation (SURVEY §2.3 [ext]): build the non-survivor set
    (component members whose id != component min) and left_anti it away —
    the docs relation streams through one join, never widens.
    """
    comp = connected_components(
        dup_pairs, id_l, id_r,
        iteration_shuffle_partitions=iteration_shuffle_partitions,
    )
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
