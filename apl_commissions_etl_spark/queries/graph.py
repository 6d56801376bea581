"""Graph analytics over join-derived graphs: PageRank with unrolled,
engine-exact iterations.

The graph is the nation-level trade network: an edge s -> c with
weight w means suppliers of nation s shipped w lineitems to customers
of nation c (lineitem >< orders >< supplier >< customer, aggregated).
This is the realistic 100 TB shape: a FACT-SCALE 3-join reduces to a
small adjacency list, and the iterative part runs over the aggregate
-- the same pattern as the IVF k-means trainer (ann_topk_ivf_kmeans)
and the LSH cluster labeler (dedup_cluster_labels).

Cross-engine exactness: every iteration runs in INTEGER nano-units
(rank scale 1e9), so the per-edge contribution floor(pr*w/outw) and
its SUM are order-independent and identical on Spark and DuckDB --
no floating accumulation anywhere inside the loop; ranks convert to
double only in the final projection.  Integer division truncates
toward zero in both engines (positive operands throughout).
Overflow audit: pr <= 1e9, edge weight <= ~1e7 at sf1 => pr*w <= 1e16
< 2^63; DuckDB's HUGEINT SUM results feed divisions and are cast back
down at the edge.

PageRank formula per iteration (damping d = 0.85 as 85/100):
    pr'(v) = (1e9 - D9)/N + (SUM_{u->v} floor(pr(u)*w(u,v)/outw(u))
                             + floor(dangling/N)) * 85 DIV 100
where dangling = SUM of pr(u) over nodes with no out-edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table

_SCALE = 1_000_000_000  # rank unit: 1e-9
_ITERATIONS = 3

_EDGES_SQL = """
edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM edges GROUP BY src
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)
"""


def _iter_sql(prev: str, cur: str) -> str:
    """One unrolled PageRank iteration in integer nano-units."""
    return f"""
{cur}_in AS (
  SELECT e.dst AS node,
         CAST(SUM(p.pr * e.w // o.outw) AS BIGINT) AS contrib
  FROM edges e
  JOIN {prev} p ON p.node = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
{cur}_dang AS (
  SELECT CAST(COALESCE(SUM(p.pr), 0) AS BIGINT) AS dang
  FROM {prev} p LEFT JOIN outw o ON o.src = p.node
  WHERE o.src IS NULL
),
{cur} AS (
  SELECT n.node,
         CAST(({_SCALE} - 850000000) // nn.n
              + (COALESCE(i.contrib, 0) + d.dang // nn.n) * 85 // 100
           AS BIGINT) AS pr
  FROM nodes n
  CROSS JOIN nn
  CROSS JOIN {cur}_dang d
  LEFT JOIN {cur}_in i ON i.node = n.node
)"""


def _pagerank_oracle() -> str:
    parts = [_EDGES_SQL.strip().rstrip(",")]
    parts.append(f""",
it0 AS (
  SELECT node, CAST({_SCALE} // nn.n AS BIGINT) AS pr
  FROM nodes CROSS JOIN nn
)""")
    prev = "it0"
    for i in range(1, _ITERATIONS + 1):
        parts.append("," + _iter_sql(prev, f"it{i}"))
        prev = f"it{i}"
    parts.append(f"""
SELECT p.node, p.pr AS pr_nano,
       CAST(p.pr / 1e9 AS DOUBLE) AS pagerank,
       COALESCE(o.outw, 0) AS out_weight
FROM {prev} p LEFT JOIN outw o ON o.src = p.node""")
    return "WITH " + "".join(parts)


@query(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    survey_ref="north-star: iterative PageRank over the join-derived "
    f"nation trade graph -- {_ITERATIONS} unrolled iterations with "
    "damping 0.85 and proper dangling-mass redistribution, ALL "
    "arithmetic in integer nano-units (per-edge contribution "
    "floor(pr*w/outw), integer sums) so every iteration is "
    "partition-order- and engine-independent; doubles only in the "
    "final projection. The fact-scale 3-join collapses to the "
    "small adjacency aggregate FIRST, then the loop runs on "
    "node-cardinality frames -- the only scalable shape for "
    "iterative graph algorithms at 100 TB",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        # node-cardinality frame from here on: truncate the fact-join
        # lineage so each unrolled iteration replans over a tiny leaf
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    n = nodes.count()  # node count is a plan constant (graph is tiny)

    pr = nodes.select("node", F.lit(_SCALE // n).cast("long").alias("pr"))
    for _ in range(_ITERATIONS):
        contrib = (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outw, "src")
            .groupBy(F.col("dst").alias("node"))
            # DIV, never `/`: `/` is double division in BOTH engines
            # and a double SUM would be partition-order-dependent
            .agg(F.sum(F.expr("pr * w DIV outw")).alias("contrib"))
        )
        dang = (
            pr.join(outw.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0)).cast("long").alias("dang"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(dang))
            .join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({(_SCALE - 850_000_000) // n} "
                    f"+ (coalesce(contrib, 0) + dang DIV {n}) * 85 DIV 100 "
                    "AS BIGINT)"
                ).alias("pr"),
            )
        )
    return pr.join(
        outw.withColumnRenamed("src", "node"), "node", "left"
    ).select(
        "node",
        F.col("pr").alias("pr_nano"),
        (F.col("pr") / 1e9).cast("double").alias("pagerank"),
        F.coalesce("outw", F.lit(0)).alias("out_weight"),
    )
