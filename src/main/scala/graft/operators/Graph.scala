package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Checkpoints
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
    * and materialized via [[graft.Checkpoints]] (reliable `checkpoint`
    * when `graft.checkpoint.dir` is set, local otherwise) —
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
    // Edge hygiene: duplicate or pre-symmetrized input edges would
    // double-count degrees after the union below, and a self-loop feeds
    // a node its own rank — both silently skew ranks, so normalize here
    // (a no-op extra shuffle for already-clean inputs, paid once and
    // absorbed into the checkpoint).
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("d"))
    // (src, dst, d) reused every iteration — materialize once. Everything
    // downstream (node count, r0) derives from THIS table, so the base
    // edge list is scanned exactly once: the old shape recomputed the
    // full scan→distinct→degree pipeline three times (deg.count() job,
    // the materialize itself, and r0 inside the main job).
    val out = Checkpoints.materialize(sym.join(deg, "src"))
    // each src row carries its unique degree, so (src, d).distinct()
    // IS the degree table — recovered from the checkpoint for free
    val degM = out.select(col("src"), col("d")).distinct()
    // one scalar to the driver: the node count for the teleport term
    val n = degM.count()
    var ranks = degM.select(col("src").as("node"), lit(1.0 / n).as("r"))
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
    * halves the pair stream before the aggregation.
    *
    * A user with d distinct items still emits O(d²) wedge rows before
    * the aggregation — at crawl scale a single bot/hub user can
    * dominate the stage. `maxItemsPerUser` caps that: keep at most N
    * items per user, chosen by a deterministic md5 order (stable across
    * runs and partitionings, no favored-item bias). The cap is a
    * window on the same user_id key the join shuffles on, so the
    * exchange is reused; the default (no cap) preserves the exact
    * projection the oracle checks. */
  def coClickGraph(pairs: DataFrame, minShared: Long,
      maxItemsPerUser: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val capped =
      if (maxItemsPerUser == Int.MaxValue) pairs.select(col("user_id"), col("k"))
      else pairs
        .withColumn("__rn", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(md5(concat_ws(":", col("user_id"), col("k"))), col("k"))))
        .filter(col("__rn") <= maxItemsPerUser)
        .select(col("user_id"), col("k"))
    val a = capped.select(col("user_id"), col("k").as("u"))
    val b = capped.select(col("user_id"), col("k").as("v"))
    a.join(b, Seq("user_id")).filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Degree-oriented edges: each undirected edge {u,v} as one directed
    * row lo→hi where hi is the higher-(degree, id) endpoint. Out-degree
    * under this orientation is bounded by O(√m) (more precisely by the
    * graph's degeneracy), so the wedge join below fans out per-node by
    * that bound instead of by raw degree — the hub-skew killer. Struct
    * comparison gives the lexicographic (degree, id) total order
    * in-plan, no UDF. */
  def orientedEdges(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u"), col("v"))
    val deg = e0.select(col("u").as("n")).union(e0.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val j = e0
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    j.select(
      when(fwd, col("u")).otherwise(col("v")).as("lo"),
      when(fwd, col("v")).otherwise(col("u")).as("hi"),
      when(fwd, struct(col("dv").as("d"), col("v").as("n")))
        .otherwise(struct(col("du").as("d"), col("u").as("n"))).as("hi_ord"))
  }

  /** Per-node triangle counts on an undirected edge list (u < v rows).
    *
    * Algorithm: degree-oriented wedge join (the node-iterator shape of
    * Suri & Vassilvitskii, WWW'11, with the compact-forward orientation
    * refinement). Each edge is directed toward its higher-(degree, id)
    * endpoint; wedges are built only from a node's OUT-neighbors, so a
    * triangle {a,b,c} is found exactly once — at its lowest-ordered
    * corner — and per-node wedge fan-out is bounded by the orientation's
    * out-degree (≤ O(√m)) instead of raw degree. A planted hub of
    * degree d that would emit C(d,2) wedges unoriented emits ZERO as a
    * wedge center (all its edges point at it); its triangles are found
    * from its lower-degree neighbors. Two keyed shuffles total: wedge
    * build on `lo`, closure probe on (b,c); never an all-pairs product.
    * The triangle SET is identical to the unoriented formulation, so
    * the DuckDB oracle below stays valid unchanged.
    *
    * Nodes appearing in the edge list but in no triangle are kept with
    * tri = 0 (left join against the node set) — a dropped zero row is
    * the kind of silent contraction a correctness gate should see. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val o = Checkpoints.materialize(orientedEdges(edges))
    // wedge (a; b, c): two out-edges of a, canonicalized by the
    // orientation order so each unordered {b,c} appears once
    val wedges = o.as("e1").join(o.as("e2"), col("e1.lo") === col("e2.lo"))
      .filter(col("e1.hi_ord") < col("e2.hi_ord"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
    // closure: ord(b) < ord(c), so the oriented edge between them — if
    // the triangle exists — is exactly the row (lo=b, hi=c)
    val tris = wedges.join(o,
      col("b") === col("lo") && col("c") === col("hi"), "left_semi")
    val corners = tris.select(explode(array(col("a"), col("b"), col("c")))
      .as("node"))
    // node set from the MATERIALIZED oriented edges (every input edge
    // appears exactly once as lo→hi, endpoints preserved) — deriving it
    // from `edges` would recompute the upstream plan (for gr_triangles,
    // the whole co-click self-join + aggregation) a second time
    val nodes = o.select(col("lo").as("node"))
      .union(o.select(col("hi").as("node"))).distinct()
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
