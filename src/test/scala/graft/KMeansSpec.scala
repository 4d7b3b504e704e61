package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KMeans

/** Semantic checks for distributed Lloyd k-means: recovery of separated
  * clusters, determinism, invariants of the summary row, and a
  * differential check of one Lloyd step against an in-memory reference. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** three well-separated blobs in 4-d, 8 points each, deterministic */
  private lazy val blobs = {
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 8
    } yield {
      // deterministic jitter in [-0.4, 0.4): a hash-free LCG on (ci, j)
      val h = (ci * 31 + j) * 2654435761L
      val jit = Array.tabulate(4)(d =>
        (((h >>> (8 * d)) & 0xff) - 128) / 320.0f)
      // ids interleave blobs (id mod 3 = blob), so the k-lowest-id seed
      // rule starts with one seed per blob
      (j * 3L + ci, c.zip(jit).map { case (a, b) => a + b }, ci)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("k-means recovers well-separated blobs") {
    val out = KMeans.fit(blobs, k = 3, iters = 3).collect()
    assert(out.length == 3)
    // every cluster has exactly the 8 members of one blob: blob ci holds
    // vec_ids {3j+ci}, so id_sum = 84 + 8·ci identifies the blob exactly
    val idSums = out.map(_.getAs[Long]("id_sum")).sorted
    assert(idSums.sameElements(Array(84L, 92L, 100L)),
      s"expected one cluster per blob, got id sums ${idSums.mkString(",")}")
    assert(out.forall(_.getAs[Long]("n_members") == 8L))
  }

  test("deterministic across runs") {
    val a = KMeans.fit(blobs, k = 3, iters = 2).collect().map(_.toSeq)
    val b = KMeans.fit(blobs, k = 3, iters = 2).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("one Lloyd step matches an in-memory reference") {
    // reference: quantize, seed with 3 lowest ids, one assignment
    val data = blobs.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }.sortBy(_._1)
    val q = data.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 32768.0 + 0.5).toLong))
    }
    val seeds = q.take(3).map(_._2)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = q.groupBy { case (_, v) =>
      seeds.zipWithIndex.map { case (c, i) => (d2(v, c), i) }.min._2
    }.map { case (cid, members) =>
      (cid.toLong, members.length.toLong, members.map(_._1).sum)
    }.toSeq.sortBy(_._1)

    val got = KMeans.fit(blobs, k = 3, iters = 1).collect().map { r =>
      (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("id_sum"))
    }.toSeq
    assert(got == expected)
  }

  test("inertia decreases (or holds) as iterations proceed") {
    def total(iters: Int): Long =
      KMeans.fit(blobs, k = 3, iters = iters).agg(sum("inertia"))
        .collect()(0).getLong(0)
    val i1 = total(1)
    val i3 = total(3)
    assert(i3 <= i1, s"inertia grew: $i1 -> $i3")
  }

  /** Full in-memory Lloyd reference with the operator's exact
    * semantics: floor(x·2^15+0.5) quantization, k-lowest-id seeds,
    * iters assignments bracketing iters-1 floor-div re-centerings,
    * empty clusters disappearing, ties to the lowest cid. */
  private def refKMeans(data: Seq[(Long, Array[Float])], k: Int,
      iters: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val q = data.sortBy(_._1).map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 32768.0 + 0.5).toLong))
    }
    var cents: Seq[(Long, Array[Long])] =
      q.take(k).zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignAll = q.map { case (id, v) =>
      val (d, cid) = cents.map(c => (d2(v, c._2), c._1)).min
      (id, v, cid, d)
    }
    for (_ <- 1 until iters) {
      val asg = assignAll
      cents = asg.groupBy(_._3).toSeq.sortBy(_._1).map { case (cid, mem) =>
        val dim = mem.head._2.length
        (cid, Array.tabulate(dim)(j =>
          Math.floorDiv(mem.map(_._2(j)).sum, mem.length.toLong)))
      }
    }
    assignAll.groupBy(_._3).toSeq.sortBy(_._1).map { case (cid, mem) =>
      (cid, mem.length.toLong, mem.map(_._1).sum, mem.map(_._4).sum,
        cents.find(_._1 == cid).get._2.sum)
    }
  }

  test("random corpora: full summary matches the in-memory reference") {
    // coarse-grid floats make duplicate points and distance TIES likely,
    // so the lowest-cid tie-break and empty-cluster semantics are
    // genuinely exercised
    val gen = for {
      n <- Gen.chooseNum(5, 24)
      dim <- Gen.chooseNum(2, 5)
      k <- Gen.chooseNum(2, math.min(5, n))
      iters <- Gen.chooseNum(1, 3)
      vals <- Gen.listOfN(n * dim, Gen.chooseNum(-8, 8).map(_ / 4.0f))
    } yield (n, dim, k, iters, vals)
    var seed = Seed(20260813L)
    for (_ <- 1 to 8) {
      gen.apply(Gen.Parameters.default, seed).foreach {
        case (n, dim, k, iters, vals) =>
          val data = (0 until n).map(i =>
            (i.toLong, vals.slice(i * dim, (i + 1) * dim).toArray))
          val df = data.map { case (id, v) => (id, v, 0) }
            .toDF("vec_id", "embedding", "label")
          val got = KMeans.fit(df, k, iters).collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
              r.getLong(4))).toSeq
          val want = refKMeans(data, k, iters)
          assert(got == want,
            s"n=$n dim=$dim k=$k iters=$iters:\n got $got\nwant $want")
      }
      seed = seed.next
    }
  }

  test("floor-division centroid update handles negative sums") {
    // quantized x of points 0,1 are -3 and -2: their cluster's second
    // re-center divides sum -5 by 2 — floor gives -3, truncation -2.
    // The difference surfaces in cent_sum (-3 + 32768 = 32765).
    val tiny = Seq(
      (0L, Array(-0.0001f, 1f), 0),
      (1L, Array(-0.00005f, 1f), 0),
      (2L, Array(5f, -5f), 1),
      (3L, Array(5.0001f, -5f), 1)).toDF("vec_id", "embedding", "label")
    val out = KMeans.fit(tiny, k = 2, iters = 3).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n_members")).sum == 4L)
    val negCluster = out.find(_.getAs[Long]("id_sum") == 1L).get
    assert(negCluster.getAs[Long]("cent_sum") == 32765L,
      s"centroid update must floor-divide, got ${negCluster.toSeq}")
    // determinism of the full summary under repetition
    val again = KMeans.fit(tiny, k = 2, iters = 3).collect()
    assert(out.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }
}
