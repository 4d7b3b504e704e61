package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Hand-computable fixtures for the graph operators: PageRank mass
  * conservation + the closed-form symmetric-star solution, triangle
  * counts on a known clique-plus-pendant graph. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("pagerank conserves mass and ranks the hub of a star highest") {
    // star: hub 0 — leaves 1..4 (undirected; symmetrized inside)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("src", "dst")
    val pr = Graph.pagerank(edges, iters = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-4) // teleport keeps Σr = 1
    // closed form at convergence: hub = (1-d)/N + d·Σ leaf/1, each leaf
    // contributes its whole rank (deg 1); leaves split the hub's rank 4 ways
    assert(pr(0L) > pr(1L) * 2.5)
    assert((1L to 4L).map(pr).distinct.length == 1) // symmetry
  }

  test("pagerank of a regular graph is uniform") {
    // 4-cycle: every node degree 2 → uniform 1/4 at every iteration
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val pr = Graph.pagerank(edges, iters = 3).collect()
    assert(pr.length == 4)
    pr.foreach(r => assert(math.abs(r.getDouble(1) - 0.25) < 1e-9))
  }

  test("triangle counts: K4 plus a pendant edge") {
    // K4 on {0,1,2,3}: each node in C(3,2)=3 triangles, 4 triangles total;
    // pendant node 9 attached to 0 is in none but must appear with tri=0
    val k4 = for { u <- 0L to 3L; v <- (u + 1) to 3L } yield (u, v)
    val edges = (k4 :+ (0L, 9L)).toDF("u", "v")
    val t = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 9L -> 0L))
  }

  test("co-click graph thresholds shared-user support") {
    val pairs = Seq(
      (1L, 10L), (1L, 20L), // user 1 links items 10-20
      (2L, 10L), (2L, 20L), // user 2 again → shared=2
      (3L, 10L), (3L, 30L)  // 10-30 shared only once
    ).toDF("user_id", "k")
    val e2 = Graph.coClickGraph(pairs, minShared = 2).collect()
    assert(e2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 20L, 2L)))
  }

  test("degree orientation bounds wedge fan-out at a planted hub") {
    // star K1,2000: hub 0 has degree 2000, leaves degree 1. Unoriented,
    // the hub is the center of C(2000,2) ≈ 2M wedges; degree-oriented,
    // every edge points AT the hub (highest (deg,id)), so the hub's
    // out-degree is 0 and each leaf's is 1 → zero wedges total.
    val star = (1L to 2000L).map(l => (0L, l)).toDF("u", "v")
    val o = Graph.orientedEdges(star)
    val outDeg = o.groupBy("lo").agg(count(lit(1)).as("od")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!outDeg.contains(0L))            // hub emits no wedges
    assert(outDeg.values.forall(_ == 1L))   // leaves: one out-edge each
    val wedgeRows = o.as("e1")
      .join(o.as("e2"), col("e1.lo") === col("e2.lo"))
      .filter(col("e1.hi_ord") < col("e2.hi_ord")).count()
    assert(wedgeRows == 0L) // naive formulation would build ~2,000,000
    val t = Graph.triangleCounts(star).collect()
    assert(t.length == 2001 && t.forall(_.getLong(1) == 0L))
  }

  test("oriented triangle counts match the unoriented formulation") {
    // K4 ∪ K3 sharing node 3, plus pendant: exercises ties in degree
    // (the id tiebreak) and multiple triangle corners per node
    val k4 = for { u <- 0L to 3L; v <- (u + 1) to 3L } yield (u, v)
    val k3 = Seq((3L, 5L), (3L, 6L), (5L, 6L))
    val edges = (k4 ++ k3 :+ (6L, 9L)).toDF("u", "v")
    val t = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 4L,
      5L -> 1L, 6L -> 1L, 9L -> 0L))
  }

  test("coClickGraph per-user cap bounds hub fan-out deterministically") {
    val hub = (1L to 100L).map(k => (7L, k))
    val normal = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val pairs = (hub ++ normal).toDF("user_id", "k")
    val capped = Graph.coClickGraph(pairs, minShared = 1, maxItemsPerUser = 10)
    // hub contributes at most C(10,2)=45 pairs instead of C(100,2)=4950
    val hubOnly = Graph.coClickGraph(hub.toDF("user_id", "k"),
      minShared = 1, maxItemsPerUser = 10)
    assert(hubOnly.count() == 45L)
    // deterministic: same cap twice gives the identical edge set
    val again = Graph.coClickGraph(pairs, minShared = 1, maxItemsPerUser = 10)
    assert(capped.collect().toSet == again.collect().toSet)
    // uncapped path unchanged: items 1,2 shared by users 1, 2 AND hub 7
    assert(Graph.coClickGraph(pairs, minShared = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 2L, 3L)))
  }

  test("pagerank tolerates duplicate and self-loop edges") {
    // same 4-cycle, but with a duplicated edge and a self-loop — ranks
    // must match the clean graph exactly (hygiene filter + distinct)
    val dirty = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 3L), (3L, 0L),
      (2L, 2L)).toDF("src", "dst")
    val pr = Graph.pagerank(dirty, iters = 3).collect()
    assert(pr.length == 4)
    pr.foreach(r => assert(math.abs(r.getDouble(1) - 0.25) < 1e-9))
  }

  test("driver queries run on sf0.001 with sane shapes") {
    val dir = "/root/testdata/sf0.001"
    val pr = Graph.queries("gr_pagerank")(spark, dir).collect()
    assert(pr.nonEmpty)
    assert(math.abs(pr.map(_.getDouble(1)).sum - 1.0) < 1e-3)
    val tri = Graph.queries("gr_triangles")(spark, dir).collect()
    assert(tri.forall(_.getLong(1) >= 0L))
  }
}
