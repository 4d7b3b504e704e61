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

  test("driver queries run on sf0.001 with sane shapes") {
    val dir = "/root/testdata/sf0.001"
    val pr = Graph.queries("gr_pagerank")(spark, dir).collect()
    assert(pr.nonEmpty)
    assert(math.abs(pr.map(_.getDouble(1)).sum - 1.0) < 1e-3)
    val tri = Graph.queries("gr_triangles")(spark, dir).collect()
    assert(tri.forall(_.getLong(1) >= 0L))
  }
}
