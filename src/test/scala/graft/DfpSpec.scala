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
      // a full-domain wide dim stays exact — and the range injection
      // DECLINES outright (the dim domain covers the fact's stat
      // domain, so the filter could prune nothing: pure per-row cost)
      val full = spark.range(50).select(col("id").as("dk"))
      assert(sets(fact(dir).join(full, col("k") === col("dk"))) == sets(
        factNoskip(dir).join(full, col("k") === col("dk"))))
      assert(markerCount(fact(dir).join(full, col("k") === col("dk"))
          .queryExecution.optimizedPlan) == 0,
        "a fact-domain-covering range must not be injected")
    } finally sys.props.remove("graft.skipping.dfpMaxKeys")
  }

  test("covering-range decline is memoized: the collection is not " +
      "re-paid per recompile") {
    val dir = writeFact(1000)
    sys.props("graft.skipping.dfpMaxKeys") = "3"
    try {
      // full-domain dim past the key cap: collection succeeds, the
      // range injection declines on coverage — which must now MEMOIZE
      // (r17 ADVICE: with no DfpInjected fence and the memo cleared by
      // the successful collection, every fixed-point iteration / AQE
      // re-plan re-paid the limit+agg and min/max jobs)
      // range(52), not range(50): the previous test's covering dim is
      // canonically identical and its (now memoized) decline would
      // still be live — the memo keys on the BUILD plan only
      val full = spark.range(52).select(col("id").as("dk"))
      def plan(): Unit = {
        fact(dir).join(full, col("k") === col("dk"))
          .queryExecution.optimizedPlan
        ()
      }
      val probe = org.apache.spark.sql.graft.DfpProbe
      val first = probe.dfpJobsDuring(spark)(plan())
      assert(first >= 1, "first compile must pay the collection")
      val second = probe.dfpJobsDuring(spark)(plan())
      assert(second == 0,
        s"covering decline must be memoized, re-paid $second jobs")
    } finally sys.props.remove("graft.skipping.dfpMaxKeys")
  }

  test("density decline: an HLL-covered full-domain dim skips the " +
      "injection, a narrow dim still prunes") {
    // fact with HLL sketches on the key: the manifest knows k has ~50
    // distinct values, so a dim with >= that many keys spanning the
    // domain would inject an IN that keeps every row — pure cost
    val df = spark.range(1000).select(
      col("id"), (col("id") % 50).as("k"),
      (col("id") % 7).cast("double").as("v"))
    val dir = tmp("dfp_dense")
    df.repartitionByRange(10, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("k"), hllCols = Seq("k"))
    val full = spark.range(60).select((col("id") % 50).as("dk"))
      .distinct()
    def qFull(f: DataFrame) = f.join(full, col("k") === col("dk"))
    assert(sets(qFull(fact(dir))) == sets(qFull(factNoskip(dir))))
    assert(markerCount(qFull(fact(dir)).queryExecution.optimizedPlan)
      == 0, "a domain-covering dim must decline on density")
    // narrow dim: density check passes it through, the IN still prunes
    val narrow = Seq(1L, 2L, 3L).toDF("dk")
    def qN(f: DataFrame) = f.join(narrow, col("k") === col("dk"))
    assert(sets(qN(fact(dir))) == sets(qN(factNoskip(dir))))
    assert(scannedFiles(qN(fact(dir))) * 2 <= 10,
      "a narrow dim must still inject and prune")
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

  private def markerCount(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case m: org.apache.spark.sql.graft.DfpInjected => m
        }.size
    }.sum

  test("fence: exactly one marked injection through the fixed point") {
    val dir = writeFact(500)
    val dim = Seq(7L, 8L).toDF("dk")
    val q = fact(dir).join(dim, col("k") === col("dk"))
    val plan = q.queryExecution.optimizedPlan
    assert(markerCount(plan) == 1,
      s"expected exactly one DfpInjected marker, got ${markerCount(plan)}")
  }

  test("a user predicate on the key COMPOSES with the injection") {
    // r16 ADVICE: the old value-shape fence declined on ANY user
    // =/IN/>=/<= on the key, silently forfeiting all DFP pruning; the
    // marker fence targets only self-injections
    val dir = writeFact(1000)
    val dim = Seq(7L, 8L, 41L).toDF("dk")
    // user range predicate k <= 20 (drops dim key 41); injection still
    // fires and the two prune TOGETHER
    def q(f: DataFrame) = f.filter(col("k") <= 20L)
      .join(dim, col("k") === col("dk"))
    assert(sets(q(fact(dir))) == sets(q(factNoskip(dir))))
    val plan = q(fact(dir)).queryExecution.optimizedPlan
    assert(markerCount(plan) == 1,
      s"user range must not fence the injection, got ${markerCount(plan)}")
    val nf = scannedFiles(q(fact(dir)))
    assert(nf <= 2, s"composed pruning scanned $nf of 10")
    // user IN on the key: same story
    def qIn(f: DataFrame) = f.filter(col("k").isin(7L, 8L, 30L))
      .join(dim, col("k") === col("dk"))
    assert(sets(qIn(fact(dir))) == sets(qIn(factNoskip(dir))))
    assert(markerCount(qIn(fact(dir)).queryExecution.optimizedPlan) == 1)
    assert(scannedFiles(qIn(fact(dir))) <= 2)
  }

  test("over-budget key collection declines and memoizes; fresh shapes evaluate") {
    val dir = writeFact(500)
    sys.props("graft.skipping.dfpBudgetMs") = "0"
    try {
      val dim = Seq(17L, 18L).toDF("dk")
      def q(f: DataFrame) = f.join(dim, col("k") === col("dk"))
      assert(sets(q(fact(dir))) == sets(q(factNoskip(dir))))
      assert(scannedFiles(q(fact(dir))) == 10,
        "a zero budget must decline the injection")
    } finally sys.props.remove("graft.skipping.dfpBudgetMs")
    // a DIFFERENT dim (fresh canonical plan, no memoized decline)
    // evaluates normally once the budget is back
    val dim2 = Seq(19L, 20L).toDF("dk")
    def q2(f: DataFrame) = f.join(dim2, col("k") === col("dk"))
    assert(sets(q2(fact(dir))) == sets(q2(factNoskip(dir))))
    assert(scannedFiles(q2(fact(dir))) <= 2)
  }

  test("post-collection dim-file identity drift declines the injection") {
    val dir = writeFact(500)
    val dimDir = tmp("dfp_drift")
    // only low keys IN THE DATA (no dim filter — a literal filter
    // would let Catalyst's own constraint propagation infer k <= 4
    // across the equi-join and prune the fact without DFP at all)
    spark.range(5).select(col("id").as("dk"))
      .coalesce(1).write.parquet(dimDir)
    // a frame captured NOW freezes the dim's file listing (bytes, mtime)
    val dimDf = spark.read.parquet(dimDir)
    // rewrite the dim part file IN PLACE under its old name — the
    // r16-ADVICE race: key collection would read the new bytes while
    // the frozen identity no longer matches
    val fsp = new org.apache.hadoop.fs.Path(dimDir)
    val fs = fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(fsp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    val replDir = tmp("dfp_drift_repl")
    spark.range(100).select(col("id").as("dk"))
      .coalesce(1).write.parquet(replDir)
    val repl = fs.listStatus(new org.apache.hadoop.fs.Path(replDir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.delete(part, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, repl, fs, part, false,
      spark.sparkContext.hadoopConfiguration)
    // the drift check must refuse to inject: full fact (10) + dim (1)
    assert(scannedFiles(
      fact(dir).join(dimDf, col("k") === col("dk"))) == 11,
      "identity drift between collection and injection must decline")
    // control: the same shape WITHOUT the rewrite injects and prunes
    val dimDir2 = tmp("dfp_nodrift")
    spark.range(5).select(col("id").as("dk"))
      .coalesce(1).write.parquet(dimDir2)
    val dim2 = spark.read.parquet(dimDir2)
    assert(scannedFiles(
      fact(dir).join(dim2, col("k") === col("dk"))) <= 2)
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
