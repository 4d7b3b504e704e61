package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed graph analytics over the behavioral (events) graph.
  *
  * A training-data pipeline is full of implicit graphs — user↔item
  * interactions, document link structure, near-dup clusters — and the
  * two classic whole-graph measures here (PageRank centrality, triangle
  * counting) are the standard quality/popularity signals layered on top
  * of them (e.g. link-based quality weighting of crawl domains).
  *
  * Both are expressed as plain DataFrame joins + aggregations so every
  * step is a keyed shuffle Catalyst can plan (AQE handles the skewed
  * hub nodes at scale); nothing is collected to the driver except the
  * single node-count scalar PageRank's teleport term needs.
  *
  * Reference scope: the reference engine (chmp/framequery) has no graph
  * operators — this module is part of the beyond-reference pipeline
  * surface, same tier as [[Dedup]]/[[Similarity]].
  */
object Graph {

  /** Distinct (user, item) click pairs from the events table; the
    * bipartite interaction graph every query here starts from. `props`
    * is a JSON blob; `get_json_object` is codegen'd, no UDF. */
  def clickPairs(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .distinct()

  /** PageRank over the symmetrized user↔item click graph.
    *
    * Formulation: undirected graph as two directed edges, so every node
    * has out-degree ≥ 1 — no dangling-mass correction term, which keeps
    * the per-iteration plan a single join + keyed aggregation:
    *
    *   r₀(v)    = 1/N
    *   rₜ₊₁(v) = (1-d)/N + d · Σ_{(u,v)∈E} rₜ(u)/deg(u)
    *
    * Scale shape: the edge list with out-degrees attached is built once
    * and `localCheckpoint`ed (reliable `checkpoint` on a real cluster) —
    * each of the `iters` rounds is then ONE shuffle join ranks⋈edges on
    * `src` plus ONE keyed aggregation on `dst`, both hash-partitioned by
    * node id. Rank state is O(nodes), never collected; the only driver
    * scalar is N. Hub skew (a few very-high-degree nodes) is the known
    * hazard at 100 TB — AQE skew-join handles the join side, and the
    * aggregation is a sum (map-side partials absorb the fan-in).
    *
    * Ranks are rounded to 6 dp in the output: the float sum order across
    * partitions is nondeterministic, so the stable surface is the value
    * at a precision far above the accumulated ulp noise. */
  def pagerank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("d"))
    // one scalar to the driver: the node count for the teleport term
    val n = deg.count()
    // (src, dst, d) reused every iteration — materialize once
    val out = sym.join(deg, "src").localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      ranks = out.join(ranks, out("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("r") / col("d")).as("__in"))
        .select(col("dst").as("node"),
          (lit((1.0 - damping) / n) + lit(damping) * col("__in")).as("r"))
    }
    ranks.select(col("node"), round(col("r"), 6).as("pr"))
  }

  /** Item–item co-click projection: an undirected edge (u < v) between
    * items clicked by at least `minShared` common users. The self-join
    * is keyed on user_id (one shuffle); the `u < v` canonical order
    * halves the pair stream before the aggregation. */
  def coClickGraph(pairs: DataFrame, minShared: Long): DataFrame = {
    val a = pairs.select(col("user_id"), col("k").as("u"))
    val b = pairs.select(col("user_id"), col("k").as("v"))
    a.join(b, Seq("user_id")).filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Per-node triangle counts on an undirected edge list (u < v rows).
    *
    * Algorithm: wedge join — for each wedge (u,v),(u,w) with v < w,
    * probe the edge set for (v,w); each triangle {u,v,w} with
    * u < v < w is found exactly once, then exploded to its 3 corners
    * for the per-node counts. This is the node-iterator MapReduce shape
    * (Suri & Vassilvitskii, WWW'11): two keyed shuffles (wedge build on
    * u, closure probe on (v,w)), never an all-pairs product. At 100 TB
    * the refinement is degree orientation (orient each edge toward the
    * higher-(degree,id) endpoint) so wedge fan-out is bounded by
    * arboricity rather than max degree — the triangle SET is identical,
    * so the oracle below stays valid; the harness item graph is 100
    * nodes and does not need it.
    *
    * Nodes appearing in the edge list but in no triangle are kept with
    * tri = 0 (left join against the node set) — a dropped zero row is
    * the kind of silent contraction a correctness gate should see. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint()
    val wedges = e.as("e1").join(e.as("e2"), col("e1.u") === col("e2.u"))
      .filter(col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val tris = wedges.join(e,
      col("b") === col("u") && col("c") === col("v"), "left_semi")
    val corners = tris.select(explode(array(col("a"), col("b"), col("c")))
      .as("node"))
    val nodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()
    nodes.join(corners.groupBy("node").agg(count(lit(1)).as("__t")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__t"), lit(0L)).as("tri"))
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr_pagerank" -> ((s, dir) => {
      val pairs = clickPairs(Tables.load(s, dir, "events"))
      val edges = pairs.select(
        concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("i:"), col("k")).as("dst"))
      pagerank(edges).orderBy(col("node"))
    }),
    "gr_triangles" -> ((s, dir) => {
      val pairs = clickPairs(Tables.load(s, dir, "events"))
      triangleCounts(coClickGraph(pairs, minShared = 4)).orderBy(col("node"))
    })
  )

  /** The PageRank oracle unrolls the 5 fixed iterations as a CTE chain —
    * identical arithmetic to the Spark plan, so the 6-dp rounded ranks
    * hash-match. */
  def oracleSql: Map[String, String] = {
    val base =
      """WITH clicks AS (
        |  SELECT DISTINCT user_id,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE event_type = 'click'
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |""".stripMargin
    val prSetup = base +
      """edges AS (
        |  SELECT 'u:' || user_id AS src, 'i:' || k AS dst FROM clicks
        |  UNION ALL
        |  SELECT 'i:' || k, 'u:' || user_id FROM clicks),
        |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS c FROM deg),
        |r0 AS (SELECT node, 1.0 / (SELECT c FROM nn) AS r FROM deg),
        |""".stripMargin
    val iterCte = (i: Int) =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         0.15 / (SELECT c FROM nn)
         |           + 0.85 * sum(r${i - 1}.r / deg.d) AS r
         |  FROM edges e
         |  JOIN r${i - 1} ON r${i - 1}.node = e.src
         |  JOIN deg ON deg.node = e.src
         |  GROUP BY e.dst)""".stripMargin
    val pr = prSetup + (1 to 5).map(iterCte).mkString(",\n") +
      "\nSELECT node, round(r, 6) AS pr FROM r5 ORDER BY node"
    val tri = base +
      """e AS (
        |  SELECT a.k AS u, b.k AS v
        |  FROM clicks a JOIN clicks b
        |    ON a.user_id = b.user_id AND a.k < b.k
        |  GROUP BY 1, 2 HAVING count(*) >= 4),
        |tris AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        |  WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.u = e1.v AND e3.v = e2.v)),
        |corners AS (
        |  SELECT a AS node FROM tris UNION ALL
        |  SELECT b FROM tris UNION ALL
        |  SELECT c FROM tris),
        |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e)
        |SELECT n.node, coalesce(t.cnt, 0) AS tri
        |FROM nodes n LEFT JOIN (
        |  SELECT node, count(*) AS cnt FROM corners GROUP BY 1) t
        |  ON n.node = t.node
        |ORDER BY n.node""".stripMargin
    Map("gr_pagerank" -> pr, "gr_triangles" -> tri)
  }
}
