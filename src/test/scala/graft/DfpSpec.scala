package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Skipping
import graft.sources.Skipping.scannedFiles

/** Join-driven dynamic file pruning (DynamicFilePruningRule): a
  * broadcast-eligible build side's distinct join keys become an IN
  * filter on the manifest-carrying probe side, so the existing
  * manifest pruning drops fact files no surviving dim key can reach.
  * Every test pins BOTH the IO effect (scanned-file count) and exact
  * result equality against the same join with pruning off
  * (`graft.noskip`). */
class DfpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** fact: key `k` 0..49 range-clustered over 10 files; `v` payload. */
  private def writeFact(n: Int): String = {
    val df = spark.range(n.toLong).select(
      col("id"), (col("id") % 50).as("k"),
      (col("id") % 7).cast("double").as("v"))
    val dir = tmp("dfp_fact")
    df.repartitionByRange(10, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("k"))
    dir
  }

  private def fact(dir: String): DataFrame = spark.read.parquet(dir)
  private def factNoskip(dir: String): DataFrame =
    spark.read.option("graft.noskip", "true").parquet(dir)

  private def sets(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("inner join with a small dim prunes fact files, results exact") {
    val dir = writeFact(1000)
    val dim = Seq((10L, "a"), (11L, "b"), (12L, "c")).toDF("dk", "tag")
    def q(f: DataFrame) = f.join(dim, col("k") === col("dk"))
    assert(sets(q(fact(dir))) == sets(q(factNoskip(dir))))
    val nf = scannedFiles(q(fact(dir)))
    assert(nf * 2 <= 10, s"scanned $nf of 10")
    // control: with graft.noskip the same join reads everything
    assert(scannedFiles(q(factNoskip(dir))) == 10)
  }

  test("dim-filtered parquet dim (the star shape) prunes the fact") {
    val dir = writeFact(1000)
    val dimDir = tmp("dfp_dim")
    spark.range(50).select(col("id").as("dk"),
        (col("id") % 10).as("cat"))
      .coalesce(1).write.parquet(dimDir)
    def q(f: DataFrame) = f.join(
      spark.read.parquet(dimDir).filter(col("cat") === 3),
      col("k") === col("dk"))
    assert(sets(q(fact(dir))) == sets(q(factNoskip(dir))))
    // 5 surviving keys {3,13,23,33,43} over a 0..49 clustered layout:
    // well under half of the 10 fact files (+1 dim file)
    val nf = scannedFiles(q(fact(dir)))
    assert(nf <= 1 + 5, s"scanned $nf (fact+dim)")
  }

  test("empty key set collapses the fact scan entirely") {
    val dir = writeFact(500)
    val dim = Seq(999L).toDF("dk").filter(col("dk") < 0)
    val q = fact(dir).join(dim, col("k") === col("dk"))
    assert(q.count() == 0)
    assert(scannedFiles(fact(dir).join(dim, col("k") === col("dk"))) == 0)
  }

  test("left outer: the LEFT (fact) side is never filtered; a fact on the RIGHT is") {
    val dir = writeFact(500)
    val dim = Seq((10L, "x")).toDF("dk", "tag")
    // fact LEFT of a left-outer join: unmatched fact rows must survive
    val qL = fact(dir).join(dim, col("k") === col("dk"), "left")
    assert(sets(qL) ==
      sets(factNoskip(dir).join(dim, col("k") === col("dk"), "left")))
    assert(scannedFiles(
      fact(dir).join(dim, col("k") === col("dk"), "left")) == 10)
    // fact RIGHT of a left-outer join: unmatched fact rows drop anyway
    val qR = dim.join(fact(dir), col("dk") === col("k"), "left")
    assert(sets(qR) ==
      sets(dim.join(factNoskip(dir), col("dk") === col("k"), "left")))
    val nf = scannedFiles(dim.join(fact(dir), col("dk") === col("k"), "left"))
    assert(nf <= 1, s"scanned $nf of 10")
  }

  test("left semi and left anti prune soundly") {
    val dir = writeFact(500)
    val dim = Seq(5L, 6L).toDF("dk")
    val semi = fact(dir).join(dim, col("k") === col("dk"), "left_semi")
    assert(sets(semi) == sets(
      factNoskip(dir).join(dim, col("k") === col("dk"), "left_semi")))
    assert(scannedFiles(
      fact(dir).join(dim, col("k") === col("dk"), "left_semi")) <= 2)
    // anti with fact on the LEFT: unmatched rows ARE the output —
    // the fact must scan fully and results stay exact
    val anti = fact(dir).join(dim, col("k") === col("dk"), "left_anti")
    assert(sets(anti) == sets(
      factNoskip(dir).join(dim, col("k") === col("dk"), "left_anti")))
    assert(scannedFiles(
      fact(dir).join(dim, col("k") === col("dk"), "left_anti")) == 10)
  }

  test("past the key cap the injection degrades to the key-domain range") {
    val dir = writeFact(1000)
    sys.props("graft.skipping.dfpMaxKeys") = "3"
    try {
      // 5 keys in a narrow low band: the [1, 5] range keeps ~1 of 10
      // clustered files, exactness preserved
      val wide = Seq(1L, 2L, 3L, 4L, 5L).toDF("dk")
      val q = fact(dir).join(wide, col("k") === col("dk"))
      assert(sets(q) == sets(
        factNoskip(dir).join(wide, col("k") === col("dk"))))
      val nf = scannedFiles(fact(dir).join(wide, col("k") === col("dk")))
      assert(nf * 2 <= 10, s"range fallback scanned $nf of 10")
      // the fixed point converges: exactly one >= and one <= on the key
      val plan = fact(dir).join(wide, col("k") === col("dk"))
        .queryExecution.optimizedPlan
      val rngs = plan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case e: org.apache.spark.sql.catalyst.expressions
                .GreaterThanOrEqual => e
            case e: org.apache.spark.sql.catalyst.expressions
                .LessThanOrEqual => e
          }.size
      }.sum
      assert(rngs == 2, s"expected one injected range (2 bounds), got $rngs")
      // a full-domain wide dim stays exact too (range prunes nothing)
      val full = spark.range(50).select(col("id").as("dk"))
      assert(sets(fact(dir).join(full, col("k") === col("dk"))) == sets(
        factNoskip(dir).join(full, col("k") === col("dk"))))
    } finally sys.props.remove("graft.skipping.dfpMaxKeys")
  }

  test("declines: oversized dim, non-deterministic dim") {
    val dir = writeFact(500)
    // dim over the broadcast threshold
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val dim = Seq(10L).toDF("dk")
      assert(scannedFiles(
        fact(dir).join(dim, col("k") === col("dk"))) == 10)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    // non-deterministic build side: the collected key set need not be
    // the one the join sees — decline
    val nd = spark.range(50).select((col("id")).as("dk"))
      .filter(rand(7) >= 0.0) // always true, but non-deterministic
    assert(scannedFiles(
      fact(dir).join(nd, col("k") === col("dk"))) == 10)
  }

  test("randomized differential: DFP joins == noskip joins across shapes") {
    val rnd = new scala.util.Random(20260816L)
    val dir = writeFact(1500)
    val joinTypes = Seq("inner", "left", "right", "left_semi", "left_anti")
    for (trial <- 1 to 12) {
      val jt = joinTypes(rnd.nextInt(joinTypes.size))
      // random key set: a contiguous band, a scattered set, or one
      // with nulls; randomly above/below the (forced-low) cap
      val cap = if (rnd.nextBoolean()) "4" else "1024"
      sys.props("graft.skipping.dfpMaxKeys") = cap
      try {
        val keys: Seq[java.lang.Long] = rnd.nextInt(3) match {
          case 0 =>
            val lo = rnd.nextInt(45)
            (lo to (lo + rnd.nextInt(8))).map(v => Long.box(v.toLong))
          case 1 => (1 to (1 + rnd.nextInt(8)))
            .map(_ => Long.box(rnd.nextInt(60).toLong - 5L))
          case 2 => Seq(Long.box(rnd.nextInt(50).toLong), null,
            Long.box(rnd.nextInt(50).toLong))
        }
        val dim = keys.toDF("dk")
        def q(f: DataFrame) = f.join(dim, col("k") === col("dk"), jt)
        assert(sets(q(fact(dir))) == sets(q(factNoskip(dir))),
          s"trial $trial: jt=$jt cap=$cap keys=$keys")
      } finally sys.props.remove("graft.skipping.dfpMaxKeys")
    }
  }

  test("fence: no stacked IN filters through the fixed point; user IN declines") {
    val dir = writeFact(500)
    val dim = Seq(7L, 8L).toDF("dk")
    val q = fact(dir).join(dim, col("k") === col("dk"))
    val plan = q.queryExecution.optimizedPlan
    val inCount = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case i: org.apache.spark.sql.catalyst.expressions.In => i
          case i: org.apache.spark.sql.catalyst.expressions.InSet => i
        }.size
    }.sum
    assert(inCount == 1, s"expected exactly one injected IN, got $inCount")
    // an existing user IN on the key fences the injection (and already
    // prunes by itself)
    val qUser = fact(dir).filter(col("k").isin(7L, 8L))
      .join(dim, col("k") === col("dk"))
    assert(sets(qUser) == sets(
      factNoskip(dir).filter(col("k").isin(7L, 8L))
        .join(dim, col("k") === col("dk"))))
  }

  test("single-key dim: OptimizeIn rewrites the IN to =, the EQ fence holds") {
    val dir = writeFact(500)
    val dim = Seq(7L).toDF("dk")
    val q = fact(dir).join(dim, col("k") === col("dk"))
    assert(sets(q) == sets(factNoskip(dir).join(dim, col("k") === col("dk"))))
    assert(scannedFiles(fact(dir).join(dim, col("k") === col("dk"))) <= 1)
    // the optimized plan holds exactly one injected key predicate —
    // the fixed point converged (no oscillating In -> EqualTo -> In)
    val preds = q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case e: org.apache.spark.sql.catalyst.expressions.EqualTo
              if e.right.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.Literal] => e
          case i: org.apache.spark.sql.catalyst.expressions.In => i
        }.size
    }.sum
    assert(preds == 1, s"expected one injected key predicate, got $preds")
  }

  test("dialect SQL joins prune through the same rule") {
    val dir = writeFact(1000)
    val exec = new graft.exec.Executor(spark, Map(
      "fact" -> fact(dir),
      "dim" -> spark.range(50).select(col("id").as("dk"),
        (col("id") % 10).as("cat"))))
    def q = exec.query(
      "select count(1) as n from fact join dim on k = dk where cat = 3")
    assert(q.head().getLong(0) ==
      factNoskip(dir).filter((col("k") % 10) === 3).count())
    val nf = scannedFiles(exec.query(
      "select count(1) as n from fact join dim on k = dk where cat = 3"))
    assert(nf * 2 <= 10, s"dialect DFP scanned $nf of 10")
  }

  test("composes with literal predicates and bloom-indexed keys") {
    val dir = writeFact(1000)
    val dim = Seq((10L, 1), (40L, 2)).toDF("dk", "w")
    def q(f: DataFrame) = f.filter(col("v") >= 0.0)
      .join(dim, col("k") === col("dk"))
      .groupBy(col("dk")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    assert(sets(q(fact(dir))) == sets(q(factNoskip(dir))))
    val nf = scannedFiles(q(fact(dir)))
    assert(nf <= 2, s"scanned $nf of 10")
    // bloom-only key (unclustered layout, high-cardinality id): the
    // injected IN probes the sidecars
    val dir2 = tmp("dfp_bloom")
    spark.range(2000).select(col("id"), (col("id") % 7).as("m"))
      .repartition(8).write.parquet(dir2)
    Skipping.writeManifest(spark, dir2, Seq("id"), bloomCols = Seq("id"))
    val dimIds = Seq(11L, 222L).toDF("did")
    def qb(f: DataFrame) = f.join(dimIds, col("id") === col("did"))
    val full = spark.read.option("graft.noskip", "true").parquet(dir2)
    assert(sets(qb(spark.read.parquet(dir2))) == sets(qb(full)))
    val nfb = scannedFiles(qb(spark.read.parquet(dir2)))
    assert(nfb < 8, s"bloom DFP scanned $nfb of 8")
  }
}
