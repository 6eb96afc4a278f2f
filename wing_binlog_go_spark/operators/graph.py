"""Graph operators over the events-derived interaction graph.

Training-data pipelines weight and filter sources by graph signals —
PageRank-family centrality over the link graph is the classic corpus
quality prior (the Common Crawl ranking recipe), and bounded-hop
reachability is the feature the curation side joins back onto entities.
The engine already has the connected-components member of this family
(operators/dedup.py::dedup_clusters, oracled q129); this module adds the
weighted-centrality and bounded-BFS members.

Graph construction is deterministic and JVM-only: within each
``event_type`` channel, order events by ``event_id`` and link
consecutive DISTINCT actors; keep pairs co-occurring ≥ ``min_weight``
times (the affinity threshold that separates structure from the noise
floor — below it the fixture graph is near-complete and every node
reaches every node).

Scale shape (100 TB): the edge builder is one entity-keyed window (no
global sort) + one partial-agg groupBy. PageRank iterations are each
ONE shuffle (contributions groupBy dst) against edges hash-partitioned
on src and persisted once; the dangling-mass scalar is a driver-side
sum, bounded by n_iter (same driver-loop budget class as BPE training —
documented, not hidden). The k-hop frontier expansion is the BFS
delta-join: frontier ⋈ edges on the frontier's reached column, distinct
per round, lineage cut per round — k is small and fixed, and the state
is (node, reached) pairs, which is the answer's own size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wing_binlog_go_spark.plans.relational import QuerySpec
from wing_binlog_go_spark.tables import read_table

QUERIES: dict[str, QuerySpec] = {}


def interaction_edges(
    events: DataFrame,
    min_weight: int = 3,
) -> DataFrame:
    """Directed affinity edges (src, dst, weight): consecutive distinct
    actors within an event_type channel, kept when the pair repeats
    ≥ min_weight times across all channels."""
    nxt = F.lead("user_id").over(
        Window.partitionBy("event_type").orderBy("event_id")
    )
    pairs = (
        events.select(F.col("user_id").alias("src"), nxt.alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    weight_col: str | None = None,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """PageRank over (src, dst) edges. Unweighted by default (parallel
    edges collapse); pass ``weight_col`` to distribute each node's rank
    proportionally to its out-edge weights (parallel edges SUM) — the
    affinity counts ``interaction_edges`` already computes. Dangling-
    node mass is redistributed uniformly each iteration, so ranks sum
    to 1 at every step.

        r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)·w(u,v)/w_out(u) + dangling/N)

    ``personalization``: (node, p) replaces BOTH uniform terms with the
    normalized p-distribution — personalized PageRank / TrustRank
    (Gyöngyi et al., VLDB 2004): rank becomes proximity to the seed
    set, the corpus-curation trust prior (seed trusted sources, score
    everything by how rank flows from them). Restart AND dangling mass
    land on p, initial ranks start at p, so every iteration's ranks
    still sum to 1:

        r'(v) = (1−d)·p(v) + d·(Σ_{u→v} r(u)·w(u,v)/w_out(u) + dangling·p(v))

    One shuffle per iteration (contributions groupBy dst); the node
    list and out-degrees are computed once; each iteration's result is
    localCheckpoint-ed so the lineage stays one-join deep. The
    dangling-mass term is a scalar driver action per iteration —
    inherent to exact PageRank (it is a global sum), bounded by n_iter.
    """
    w = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    e = (
        edges.select("src", "dst", w.alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:  # empty graph: empty ranking, not a divide-by-zero
        e.unpersist()
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    if personalization is not None:
        # normalize p over the graph's nodes; absent nodes get p = 0
        pn = (
            nodes.join(
                personalization.select("node", F.col("p").cast("double").alias("p")),
                "node", "left",
            )
            .select("node", F.coalesce("p", F.lit(0.0)).alias("p"))
        )
        p_total = pn.agg(F.sum("p")).collect()[0][0]
        if not p_total or p_total <= 0:
            raise ValueError(
                "pagerank: personalization mass over the graph's nodes is 0 "
                "— no seed is in the graph"
            )
        pn = pn.select(
            "node", (F.col("p") / F.lit(float(p_total))).alias("p")
        ).persist()
        ranks = pn.select("node", F.col("p").alias("rank"))
    else:
        pn = None
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank", "outdeg")
        dangling = (
            with_deg.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            with_deg.join(e, with_deg["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        if pn is not None:
            ranks = (
                pn.join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(1.0 - damping) * F.col("p")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("contrib"), F.lit(0.0))
                            + F.lit(float(dangling)) * F.col("p")
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            ranks = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
    e.unpersist()
    nodes.unpersist()
    if pn is not None:
        pn.unpersist()
    return ranks


def khop_counts(edges: DataFrame, k: int = 3) -> DataFrame:
    """(node, n_reachable): distinct nodes reachable in 1..k hops.
    A node counts itself only if a cycle returns to it — the same
    closure a recursive SQL CTE computes with a hop bound."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select("src", "dst").distinct().persist()
    frontier = e.select(F.col("src").alias("node"), F.col("dst").alias("reached"))
    reach = frontier
    for _ in range(k - 1):
        step = (
            reach.join(e, reach["reached"] == e["src"])
            .select("node", F.col("dst").alias("reached"))
        )
        reach = reach.union(step).distinct().localCheckpoint(eager=True)
    e.unpersist()
    return reach.groupBy("node").agg(F.count("*").alias("n_reachable"))


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    # affinity-weighted: repeated co-occurrence carries more rank
    ranks = pagerank(
        interaction_edges(ev), damping=0.85, n_iter=5, weight_col="weight"
    )
    return ranks.select(
        F.col("node").alias("user_id"), F.round("rank", 6).alias("rank")
    ).orderBy(F.col("rank").desc(), "user_id")


def _pagerank_oracle(n_iter: int = 5, damping: float = 0.85) -> str:
    """DuckDB oracle for q139 (r6 verdict ask #6): exact PageRank is a
    FIXED number of iterations, so instead of a recursive CTE (which
    cannot aggregate in the recursive term) the iterations unroll as
    chained CTEs r0..r{n}. Each iteration carries its dangling mass as
    a scalar subquery; values round to 6 dp exactly like the Spark
    side, far above double summation-order jitter (~1e-15). CTEs are
    MATERIALIZED: DuckDB inlines plain CTEs and r{i} is referenced
    twice per iteration, so an un-materialized chain doubles the plan
    per level (the q146 classifier oracle hit fd exhaustion this way
    at 16 levels)."""
    d = damping
    head = """
WITH o AS MATERIALIZED (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY event_id) AS dst
  FROM events
), edges AS MATERIALIZED (
  SELECT src, dst, COUNT(*)::DOUBLE AS w FROM o
  WHERE dst IS NOT NULL AND dst <> src
  GROUP BY src, dst HAVING COUNT(*) >= 3
), nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS MATERIALIZED (
  SELECT COUNT(*)::DOUBLE AS n FROM nodes
), outdeg AS MATERIALIZED (
  SELECT src, SUM(w) AS outdeg FROM edges GROUP BY src
), r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
)"""
    steps = []
    for i in range(n_iter):
        steps.append(f""", d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), 0.0) AS mass
  FROM r{i} r LEFT JOIN outdeg od ON r.node = od.src
  WHERE od.src IS NULL
), c{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.rank * e.w / od.outdeg) AS contrib
  FROM r{i} r JOIN edges e ON r.node = e.src
  JOIN outdeg od ON r.node = od.src
  GROUP BY e.dst
), r{i + 1} AS MATERIALIZED (
  SELECT nodes.node,
         (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * (COALESCE(c.contrib, 0.0)
                  + (SELECT mass FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM nodes LEFT JOIN c{i} c ON nodes.node = c.node
)""")
    tail = f"""
SELECT node AS user_id, ROUND(rank, 6) AS rank
FROM r{n_iter}
ORDER BY rank DESC, user_id
"""
    return head + "".join(steps) + tail


# r7: oracle-backed — exact PageRank over a fixed iteration count
# unrolls into plain SQL (see _pagerank_oracle); the numpy-reference
# property test keeps carrying the independent value evidence.
QUERIES["q139_pagerank"] = QuerySpec(_q_pagerank, _pagerank_oracle())


_TRUST_N_ITER = 5
_TRUST_DAMPING = 0.85
_TRUST_SEEDS = 5


def _q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a deterministic seed set — TrustRank
    for source curation: seeds = the most active users (top event
    count, user_id tie-break), score = proximity of every node to the
    seed set through the weighted interaction graph. The score a
    pipeline multiplies into per-source sampling weights."""
    ev = read_table(spark, sf_dir, "events")
    seeds = (
        ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id").limit(_TRUST_SEEDS)
        .select(F.col("user_id").alias("node"), F.lit(1.0).alias("p"))
    )
    ranks = pagerank(
        interaction_edges(ev), damping=_TRUST_DAMPING, n_iter=_TRUST_N_ITER,
        weight_col="weight", personalization=seeds,
    )
    return ranks.select(
        F.col("node").alias("user_id"), F.round("rank", 6).alias("trust")
    ).orderBy(F.col("trust").desc(), "user_id")


def _trustrank_oracle(
    n_iter: int = _TRUST_N_ITER, damping: float = _TRUST_DAMPING
) -> str:
    """q139's unrolled chain with the restart/dangling mass on the
    normalized seed distribution instead of 1/N."""
    d = damping
    head = f"""
WITH o AS MATERIALIZED (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY event_id) AS dst
  FROM events
), edges AS MATERIALIZED (
  SELECT src, dst, COUNT(*)::DOUBLE AS w FROM o
  WHERE dst IS NOT NULL AND dst <> src
  GROUP BY src, dst HAVING COUNT(*) >= 3
), nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), seeds AS MATERIALIZED (
  SELECT user_id AS node, 1.0::DOUBLE AS p FROM (
    SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ORDER BY cnt DESC, user_id LIMIT {_TRUST_SEEDS}
  )
), p0 AS MATERIALIZED (
  SELECT nodes.node, COALESCE(s.p, 0.0) AS p
  FROM nodes LEFT JOIN seeds s USING (node)
), pmass AS MATERIALIZED (
  SELECT SUM(p) AS t FROM p0
), pn AS MATERIALIZED (
  SELECT node, p / (SELECT t FROM pmass) AS p FROM p0
), outdeg AS MATERIALIZED (
  SELECT src, SUM(w) AS outdeg FROM edges GROUP BY src
), r0 AS MATERIALIZED (
  SELECT node, p AS rank FROM pn
)"""
    steps = []
    for i in range(n_iter):
        steps.append(f""", d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), 0.0) AS mass
  FROM r{i} r LEFT JOIN outdeg od ON r.node = od.src
  WHERE od.src IS NULL
), c{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.rank * e.w / od.outdeg) AS contrib
  FROM r{i} r JOIN edges e ON r.node = e.src
  JOIN outdeg od ON r.node = od.src
  GROUP BY e.dst
), r{i + 1} AS MATERIALIZED (
  SELECT pn.node,
         (1.0 - {d}) * pn.p
         + {d} * (COALESCE(c.contrib, 0.0)
                  + (SELECT mass FROM d{i}) * pn.p) AS rank
  FROM pn LEFT JOIN c{i} c ON pn.node = c.node
)""")
    tail = f"""
SELECT node AS user_id, ROUND(rank, 6) AS trust
FROM r{n_iter}
ORDER BY trust DESC, user_id
"""
    return head + "".join(steps) + tail


QUERIES["q156_trustrank"] = QuerySpec(_q_trustrank, _trustrank_oracle())


def _q_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return khop_counts(interaction_edges(ev), k=3).orderBy("node")


_KHOP_ORACLE = """
WITH RECURSIVE o AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY event_id) AS dst
  FROM events
), edges AS (
  SELECT src, dst FROM o
  WHERE dst IS NOT NULL AND dst <> src
  GROUP BY src, dst HAVING COUNT(*) >= 3
), r AS (
  SELECT src AS node, dst AS reached, 1 AS hops FROM edges
  UNION
  SELECT r.node, e.dst, r.hops + 1
  FROM r JOIN edges e ON r.reached = e.src
  WHERE r.hops < 3
)
SELECT node, COUNT(DISTINCT reached) AS n_reachable
FROM r GROUP BY node ORDER BY node
"""

QUERIES["q140_khop_reachability"] = QuerySpec(_q_khop, _KHOP_ORACLE)


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED support of ``edges`` (src, dst[, ...]) — the social-graph
    cohesion signal corpus curation uses next to centrality (a source
    whose link neighborhood closes triangles is a community, one whose
    neighborhood is a star is a spam hub; TrustRank's seed heuristics
    lean on exactly this distinction).

    Algorithm: degree orientation (Schank's forward algorithm, the
    standard MapReduce/vertex-centric triangle scheme). Orient every
    undirected edge from the (degree, id)-smaller endpoint to the
    larger; enumerate wedges u→v→w by self-joining the oriented edges
    on the middle vertex; close each wedge against the undirected edge
    set. Every triangle is produced exactly once (its vertices are
    totally ordered by (degree, id)), and the wedge fan-out is bounded
    by the oriented out-degree ≤ O(sqrt(m)) on any graph — the
    enumeration is O(m^{3/2}) worst-case with NO all-pairs blowup, and
    each step is a plain equi-join Catalyst shuffles on node keys (AQE
    handles the skewed-hub case). Coefficient: 2T / (d(d-1)) over the
    undirected degree d, rounded 6dp; nodes with d < 2 cannot close a
    wedge and are excluded (coefficient undefined).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # reused 3x: degrees, orientation, closure
    )
    deg = (
        und.select(F.col("a").alias("n")).union(und.select("b"))
        .groupBy("n").agg(F.count("*").alias("d"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        und.join(da, F.col("a") == F.col("da.n"))
        .join(db, F.col("b") == F.col("db.n"))
        .select(
            F.when(
                (F.col("da.d") < F.col("db.d"))
                | ((F.col("da.d") == F.col("db.d")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    e1 = oriented.alias("e1")
    e2 = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    ).alias("e2")
    tris = (
        e1.join(e2, "v")
        .join(
            und,
            (F.least("u", "w") == F.col("a")) & (F.greatest("u", "w") == F.col("b")),
            "left_semi",
        )
        .select("u", "v", "w")
    )
    per_node = (
        tris.select(F.col("u").alias("node"))
        .union(tris.select("v"))
        .union(tris.select("w"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(per_node, deg["n"] == per_node["node"], "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                F.coalesce("triangles", F.lit(0)) * 2.0
                / (F.col("d") * (F.col("d") - F.lit(1))),
                6,
            ).alias("coeff"),
        )
    )


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return triangle_counts(interaction_edges(ev)).orderBy("node")


_TRIANGLE_ORACLE = """
WITH o AS (
  SELECT user_id AS src,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY event_id) AS dst
  FROM events
), edges AS (
  SELECT src, dst FROM o
  WHERE dst IS NOT NULL AND dst <> src
  GROUP BY src, dst HAVING COUNT(*) >= 3
), und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
), deg AS MATERIALIZED (
  SELECT n, COUNT(*) AS d
  FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
  GROUP BY n
), ori AS MATERIALIZED (
  SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
         CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS v
  FROM und JOIN deg da ON da.n = a JOIN deg db ON db.n = b
), tris AS MATERIALIZED (
  SELECT e1.u, e1.v, e2.v AS w
  FROM ori e1 JOIN ori e2 ON e1.v = e2.u
  WHERE EXISTS (SELECT 1 FROM und
                WHERE a = least(e1.u, e2.v) AND b = greatest(e1.u, e2.v))
), per_node AS (
  SELECT node, COUNT(*) AS triangles
  FROM (SELECT u AS node FROM tris UNION ALL SELECT v FROM tris
        UNION ALL SELECT w FROM tris)
  GROUP BY node
)
SELECT deg.n AS node,
       COALESCE(per_node.triangles, 0) AS triangles,
       ROUND(COALESCE(per_node.triangles, 0) * 2.0 / (deg.d * (deg.d - 1)), 6)
         AS coeff
FROM deg LEFT JOIN per_node ON per_node.node = deg.n
WHERE deg.d >= 2
ORDER BY node
"""

QUERIES["q161_triangle_count"] = QuerySpec(_q_triangles, _TRIANGLE_ORACLE)
