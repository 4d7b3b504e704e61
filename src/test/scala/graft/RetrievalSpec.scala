package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

/** Semantic checks for BM25 + RRF against hand-computed fixtures. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "apple banana apple"),        // tf(apple)=2, dl=3
    (1L, "apple cherry"),              // tf(apple)=1, dl=2
    (2L, "banana banana banana"),      // no apple
    (3L, "durian elderberry fig grape") // no query terms at all
  ).toDF("doc_id", "text")

  private lazy val q = Seq((1L, "apple")).toDF("qid", "term")

  test("bm25 scores only matching docs, higher tf wins at similar dl") {
    val s = Retrieval.bm25(docs, q).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(s.keySet == Set(0L, 1L)) // docs 2,3 share no term
    assert(s(0L) > s(1L)) // tf 2 vs 1; dl penalty (3 vs 2) cannot flip it
    // idf is shared, so the ratio is pure tf-normalization:
    // doc0: 2*2.2/(2+1.2*(0.25+0.75*3/avgdl)) with avgdl=3
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    val expected0 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0))
    assert(math.abs(s(0L) - expected0) < 1e-12)
  }

  test("topK ranks by score desc with doc_id tie-break") {
    val dup = Seq((0L, "apple"), (1L, "apple")).toDF("doc_id", "text")
    val t = Retrieval.topK(Retrieval.bm25(dup, q), k = 10).collect()
    // identical docs → identical scores → doc_id order
    assert(t.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(t.map(_.getInt(2)).toSeq == Seq(1, 2))
  }

  test("rrf fusion rewards agreement between rankers") {
    val qt = Seq((1L, "apple"), (1L, "banana")).toDF("qid", "term")
    val fused = Retrieval.rrfFuse(
      Retrieval.bm25(docs, qt), Retrieval.tfidfRelevance(docs, qt), k = 10)
      .collect()
    // candidate support identical across rankers: docs 0,1,2
    assert(fused.map(_.getLong(1)).toSet == Set(0L, 1L, 2L))
    val top = fused.minBy(_.getInt(4))
    // rrf of the top doc must equal 1/(60+r1) + 1/(60+r2) for its ranks
    val expect = 1.0 / (60 + top.getInt(2)) + 1.0 / (60 + top.getInt(3))
    assert(math.abs(top.getDouble(5) - expect) < 1e-6)
  }

  test("driver queries produce ranked non-empty results on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val bm = Retrieval.queries("ret_bm25")(spark, dir).collect()
    assert(bm.nonEmpty)
    assert(bm.groupBy(_.getLong(0)).values.forall { rows =>
      rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length) })
    val rrf = Retrieval.queries("ret_rrf_fusion")(spark, dir).collect()
    assert(rrf.nonEmpty)
  }
}
