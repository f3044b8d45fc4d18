"""Graph analytics over relational data ([ext] — north-star analytics).

PageRank on the nation-level trade graph: an edge src→dst carries the
total extended price customers of nation ``src`` spent with suppliers of
nation ``dst``. The rank iteration is the canonical DataFrame-iterative
pattern — contribs = edges ⋈ ranks, re-aggregate, damp — the same
fixed-iteration style as Lloyd's k-means (plans/clustering.py) and
label-propagation connected components (operators/components.py), so all
three iterative families are oracle-checked.

Deterministically unrolled to ``PAGERANK_ITERS`` iterations so the DuckDB
oracle can state the identical computation as chained CTEs. Classic
simple form (no dangling-mass redistribution): rank leaks from nodes with
no out-edges; the formula is stated identically on both engines, and on
this fixture every nation has out-edges.

Scale: the rank/edge relations are |V|- and |E|-sized (node-keyed
aggregates of the fact table, built once); each iteration joins and
re-aggregates ONLY those — the corpus-sized fact scan happens once, and
the per-iteration work is O(E) with broadcastable rank tables for any
graph whose rank vector fits an executor (millions of nodes). For
billion-edge graphs the same plan shape holds with rank co-partitioned on
node instead of broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import register

PAGERANK_ITERS = 3
DAMPING = 0.85


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): out-weight-normalized trade volume between nations."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            cust.c_nationkey.alias("src"), supp.s_nationkey.alias("dst")
        )
        .agg(F.sum("l_extendedprice").alias("v"))
    )
    out_w = vol.groupBy("src").agg(F.sum("v").alias("tot"))
    return vol.join(F.broadcast(out_w), "src").select(
        "src", "dst", (F.col("v") / F.col("tot")).alias("w")
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int, damping: float) -> DataFrame:
    """Fixed-iteration PageRank: ``nodes`` has one ``node`` column, ``edges``
    has (src, dst, w) with out-normalized w. Returns (node, rank)."""
    n = nodes.count()  # |V| — node table is an aggregate, counting it is cheap
    if n == 0:  # empty graph: no nodes, no ranks (guards the 1/n seed)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            edges.join(F.broadcast(ranks), edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("rank")).alias("contrib"))
        )
        ranks = (
            nodes.join(F.broadcast(contribs), nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def _iter_ctes(iters: int) -> str:
    parts = []
    for k in range(1, iters + 1):
        parts.append(
            f"""
        c{k} AS (
            SELECT e.dst AS node, sum(e.w * r{k - 1}.rank) AS contrib
            FROM edges e JOIN r{k - 1} ON e.src = r{k - 1}.node
            GROUP BY e.dst
        ),
        r{k} AS (
            SELECT nn.n_nationkey AS node,
                   {1.0 - DAMPING!r} / nv.n
                   + {DAMPING!r} * coalesce(c{k}.contrib, 0.0) AS rank
            FROM nation nn CROSS JOIN nv
            LEFT JOIN c{k} ON c{k}.node = nn.n_nationkey
        )"""
        )
    return ",".join(parts)


@register(
    "pagerank_trade_nations",
    oracle="""
        WITH vol AS (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                   sum(l.l_extendedprice) AS v
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        ),
        out_w AS (SELECT src, sum(v) AS tot FROM vol GROUP BY src),
        edges AS (
            SELECT vol.src, vol.dst, vol.v / out_w.tot AS w
            FROM vol JOIN out_w USING (src)
        ),
        nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
        r0 AS (
            SELECT n_nationkey AS node, 1.0 / nv.n AS rank
            FROM nation CROSS JOIN nv
        ),"""
    + _iter_ctes(PAGERANK_ITERS)
    + f"""
        SELECT node, round(r{PAGERANK_ITERS}.rank, 6) AS rank
        FROM r{PAGERANK_ITERS}
    """,
    doc="[ext] PageRank (damping 0.85, 3 deterministic iterations) on the "
    "customer-nation → supplier-nation trade-volume graph — the iterative "
    "join-aggregate graph family, oracle-checked against the identical "
    "unrolled computation.",
)
def pagerank_trade_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    ranks = pagerank(nodes, _edges(spark, sf_dir), PAGERANK_ITERS, DAMPING)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


# ---- triangle counting ------------------------------------------------------

# Undirected edge exists between two nations when their trade volume in
# either direction clears this floor (keeps the fixture graph off K25).
TRIANGLE_MIN_VOLUME = 2_000_000.0

_TRIANGLE_EDGE_CTES = f"""
    vol AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               sum(l.l_extendedprice) AS v
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    und AS (
        SELECT least(src, dst) AS a, greatest(src, dst) AS b
        FROM vol
        WHERE src <> dst
        GROUP BY 1, 2
        HAVING sum(v) >= {TRIANGLE_MIN_VOLUME}
    )
"""


def _und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (a < b) nation-trade edges above the volume floor."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(cust.c_nationkey.alias("src"), supp.s_nationkey.alias("dst"))
        .agg(F.sum("l_extendedprice").alias("v"))
    )
    return (
        vol.filter(F.col("src") != F.col("dst"))
        .groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(F.sum("v").alias("v"))
        .filter(F.col("v") >= TRIANGLE_MIN_VOLUME)
        .select("a", "b")
    )


@register(
    "triangle_count_trade",
    oracle="WITH " + _TRIANGLE_EDGE_CTES + """
    , tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges
    FROM tri
    """,
    doc="[ext] triangle counting on the undirected nation-trade graph "
    "(edges above a volume floor): the canonical two-path + closing-edge "
    "join — each triangle (x<y<z) counted exactly once by ordering "
    "vertices within every edge.",
)
def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the fact table collapses to the |E|-sized edge relation
    first; the triangle join is edges-with-edges (two hash joins on
    vertex keys), never touching the fact table again. The a<b vertex
    orientation both deduplicates triangles and — on power-law graphs —
    is where degree-based orientation bounds the two-path fan-out."""
    und = _und_edges(spark, sf_dir)
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        F.broadcast(und.agg(F.count("*").alias("n_edges")))
    )


@register(
    "trade_clustering_coefficients",
    oracle="WITH " + _TRIANGLE_EDGE_CTES + """
    , deg AS (
        SELECT v, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
        GROUP BY v
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    node_tri AS (
        SELECT v, CAST(count(*) AS BIGINT) AS n_tri
        FROM (SELECT x AS v FROM tri
              UNION ALL SELECT y AS v FROM tri
              UNION ALL SELECT z AS v FROM tri)
        GROUP BY v
    )
    SELECT CAST(d.v AS BIGINT) AS nation, d.degree,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
           round(CASE WHEN d.degree >= 2
                 THEN CAST(coalesce(t.n_tri, 0) AS DOUBLE) * 2
                      / (d.degree * (d.degree - 1))
                 ELSE 0.0 END, 6) AS clustering_coef
    FROM deg d LEFT JOIN node_tri t ON t.v = d.v
    """,
    doc="[ext] local clustering coefficients on the trade graph: per-node "
    "triangle participation over (degree choose 2) — the transitivity "
    "measure community detection thresholds on; composes the same "
    "vertex-ordered triangle join with degree counting.",
)
def trade_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: same edge-relation collapse as triangle counting; per-node
    triangle counts come from unioning the three triangle vertex columns
    (each triangle credits all three corners exactly once) — one more
    |triangles|-sized agg, no extra pass over the fact table."""
    und = _und_edges(spark, sf_dir)
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("degree"))
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    node_tri = (
        tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    coef = F.when(
        F.col("degree") >= 2,
        F.coalesce("n_tri", F.lit(0)).cast("double") * 2
        / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(0.0)
    return (
        deg.join(node_tri, "v", "left")
        .select(
            F.col("v").cast("long").alias("nation"),  # nationkey scans int32
            "degree",
            F.coalesce("n_tri", F.lit(0)).alias("n_triangles"),
            F.round(coef, 6).alias("clustering_coef"),
        )
    )
