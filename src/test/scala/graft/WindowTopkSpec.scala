package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Skipping
import graft.sources.Skipping.scannedFiles

/** Per-partition top-k pruning (WindowTopKPruningRule): QUALIFY
  * row_number()/rank() OVER (PARTITION BY p ORDER BY c DESC) <= k
  * over file-constant p derives one bound per group and injects a
  * per-group OR filter the manifest prunes on. Every test pins the IO
  * effect AND exact result equality against the same query with
  * pruning off. */
class WindowTopkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** p in {p0,p1,p2} hive-partitioned (file-constant); within each
    * partition, c = id clustered over ~4 files. */
  private def writeTable(n: Int): (String, Int) = {
    val df = spark.range(n.toLong).select(
      col("id").as("c"),
      concat(lit("p"), (col("id") % 3)).as("p"),
      (col("id") % 7).cast("double").as("v"))
    val dir = tmp("wtopk")
    df.repartitionByRange(12, col("p"), col("c"))
      .write.partitionBy("p").parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("p", "c"))
    (dir, Skipping.dataFiles(spark, dir).size)
  }

  private def read(dir: String): DataFrame = spark.read.parquet(dir)
  private def readFull(dir: String): DataFrame =
    spark.read.option("graft.noskip", "true").parquet(dir)

  private def sets(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def topk(df: DataFrame, k: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("rn") <= k)

  test("row_number per-partition top-k prunes files, results exact") {
    val (dir, total) = writeTable(3000)
    assert(sets(topk(read(dir), 10)) == sets(topk(readFull(dir), 10)))
    val nf = scannedFiles(topk(read(dir), 10))
    assert(nf * 2 <= total, s"scanned $nf of $total")
    // rank() works the same way (>= k rows above the bound force
    // removed rows' rank past k)
    def rk(df: DataFrame) = df.withColumn("r", rank().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("r") <= 10)
    assert(sets(rk(read(dir))) == sets(rk(readFull(dir))))
    assert(scannedFiles(rk(read(dir))) * 2 <= total)
    // the rn = 1 equality shape ("latest per key")
    def latest(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("rn") === 1)
    assert(sets(latest(read(dir))) == sets(latest(readFull(dir))))
    assert(scannedFiles(latest(read(dir))) * 2 <= total)
  }

  test("oversized manifest: per-group bounds fold distributed, equal " +
      "the driver walk, still prune, nothing collected") {
    // r19: the last oversized decline in the rewrite family — the
    // boundWalkK recurrence streams via repartition-by-group +
    // sortWithinPartitions + mapPartitions
    val (dir, total) = writeTable(3000)
    import org.apache.spark.sql.types._
    val types = Map[String, DataType]("p" -> StringType,
      "c" -> LongType)
    val ref = Skipping.windowTopKBounds(spark, dir, Seq("p"), "c", 10L,
      desc = true, nullsFirst = false, types)
    assert(ref.exists(_.size == 3))
    sys.props("graft.skipping.statsDriverMaxBytes") = "1"
    try {
      Skipping.evictTable(dir)
      val got = Skipping.windowTopKBounds(spark, dir, Seq("p"), "c",
        10L, desc = true, nullsFirst = false, types)
      assert(got.map(_.toMap) == ref.map(_.toMap),
        s"oversized bounds $got must equal driver bounds $ref")
      // the whole rule path: pruning + exact results with zero stat
      // rows resident
      assert(sets(topk(read(dir), 10)) == sets(topk(readFull(dir), 10)))
      assert(scannedFiles(topk(read(dir), 10)) * 2 <= total)
      assert(!Skipping.cachedTables.contains(dir),
        "stat rows were collected past the driver cap")
      // dense_rank (kDistinct) leg needs ndv stats: declines on this
      // ndv-less manifest in BOTH modes
      assert(Skipping.windowTopKBounds(spark, dir, Seq("p"), "c", 0L,
        desc = true, nullsFirst = false, types,
        kDistinct = 5L).isEmpty)
    } finally {
      sys.props.remove("graft.skipping.statsDriverMaxBytes")
      Skipping.evictTable(dir)
    }
  }

  test("oversized manifest: dense_rank kDistinct chain equals the " +
      "driver walk over ndv stats") {
    val df = spark.range(2400).select(col("id").as("c"),
      concat(lit("p"), (col("id") % 2)).as("p"))
    val dir = tmp("wtopk_ov_ndv")
    df.repartitionByRange(8, col("p"), col("c"))
      .write.partitionBy("p").parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("p", "c"),
      ndvCols = Seq("c"))
    import org.apache.spark.sql.types._
    val types = Map[String, DataType]("p" -> StringType,
      "c" -> LongType)
    val ref = Skipping.windowTopKBounds(spark, dir, Seq("p"), "c", 7L,
      desc = true, nullsFirst = false, types, kDistinct = 7L)
    assert(ref.exists(bs => bs.size == 2 && bs.forall(_._2.isDefined)))
    sys.props("graft.skipping.statsDriverMaxBytes") = "1"
    try {
      Skipping.evictTable(dir)
      val got = Skipping.windowTopKBounds(spark, dir, Seq("p"), "c",
        7L, desc = true, nullsFirst = false, types, kDistinct = 7L)
      assert(got.map(_.toMap) == ref.map(_.toMap))
    } finally {
      sys.props.remove("graft.skipping.statsDriverMaxBytes")
      Skipping.evictTable(dir)
    }
  }

  test("secondary sort keys ride along: bound binds only the leading key") {
    val (dir, total) = writeTable(3000)
    // removed rows sort strictly below every survivor in c, so the
    // (c, v) lexicographic ranks of survivors are unchanged
    def q(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc, col("v").asc)))
      .filter(col("rn") <= 10)
    assert(sets(q(read(dir))) == sets(q(readFull(dir))))
    val nf = scannedFiles(q(read(dir)))
    assert(nf * 2 <= total, s"scanned $nf of $total")
  }

  test("ascending order bounds from the LOW end") {
    val (dir, total) = writeTable(3000)
    def asc(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").asc)))
      .filter(col("rn") <= 10)
    assert(sets(asc(read(dir))) == sets(asc(readFull(dir))))
    assert(scannedFiles(asc(read(dir))) * 2 <= total)
  }

  test("composes with an exactly-translatable WHERE filter") {
    val (dir, total) = writeTable(3000)
    def q(df: DataFrame) = df.filter(col("p") === "p1")
      .withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("rn") <= 10)
    assert(sets(q(read(dir))) == sets(q(readFull(dir))))
    // partition pruning alone keeps ~total/3; the bound keeps ~1 file
    val nf = scannedFiles(q(read(dir)))
    assert(nf * 4 <= total, s"scanned $nf of $total")
  }

  test("small groups stay whole (no bound, no lost rows)") {
    // group p2 gets only 5 rows (< k) — its disjunct must keep the
    // whole group while the big groups still bound
    val df = spark.range(3000).select(
      col("id").as("c"),
      when(col("id") < 5, lit("p2"))
        .otherwise(concat(lit("p"), col("id") % 2)).as("p"))
    val dir = tmp("wtopk_small")
    df.repartitionByRange(12, col("p"), col("c"))
      .write.partitionBy("p").parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("p", "c"))
    def q(d: DataFrame) = d.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("rn") <= 10)
    assert(sets(q(read(dir))) == sets(q(readFull(dir))))
    val r = q(read(dir)).groupBy("p").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("p2") == 5L && r("p0") == 10L && r("p1") == 10L)
  }

  test("declines: non-constant key, foreign window exprs, dense_rank, group cap, nulls-first") {
    val (dir, total) = writeTable(2000)
    // non-file-constant partition key (v spans its domain everywhere)
    def nc(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("v").orderBy(col("c").desc)))
      .filter(col("rn") <= 5)
    assert(sets(nc(read(dir))) == sets(nc(readFull(dir))))
    assert(scannedFiles(nc(read(dir))) == total)
    // a non-rank window expr in the same spec: removal would change
    // its value — whole node declines
    def mixed(df: DataFrame) = {
      val w = Window.partitionBy("p").orderBy(col("c").desc)
      df.withColumn("rn", row_number().over(w))
        .withColumn("s", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .filter(col("rn") <= 10)
    }
    assert(sets(mixed(read(dir))) == sets(mixed(readFull(dir))))
    assert(scannedFiles(mixed(read(dir))) == total)
    // dense_rank: k rows don't guarantee k distinct values — decline
    def dr(df: DataFrame) = df.withColumn("dr", dense_rank().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("dr") <= 10)
    assert(sets(dr(read(dir))) == sets(dr(readFull(dir))))
    assert(scannedFiles(dr(read(dir))) == total)
    // group cap
    sys.props("graft.skipping.windowTopkMaxGroups") = "2"
    try {
      assert(scannedFiles(topk(read(dir), 10)) == total)
    } finally sys.props.remove("graft.skipping.windowTopkMaxGroups")
    // NULLS FIRST with nulls present must decline (nulls may be the
    // top-k); the engine stays exact either way
    val dirN = tmp("wtopk_nulls")
    spark.range(2000).select(
        when(col("id") % 100 === 0, lit(null)).otherwise(col("id"))
          .as("c"),
        concat(lit("p"), (col("id") % 3)).as("p"))
      .repartitionByRange(12, col("p"), col("c"))
      .write.partitionBy("p").parquet(dirN)
    Skipping.writeManifest(spark, dirN, Seq("p", "c"))
    val totalN = Skipping.dataFiles(spark, dirN).size
    def nf1(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc_nulls_first)))
      .filter(col("rn") <= 10)
    assert(sets(nf1(read(dirN))) == sets(nf1(readFull(dirN))))
    assert(scannedFiles(nf1(read(dirN))) == totalN)
    // default desc (nulls last) still bounds over the same data
    def nl(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("rn") <= 10)
    assert(sets(nl(read(dirN))) == sets(nl(readFull(dirN))))
    assert(scannedFiles(nl(read(dirN))) < totalN)
  }

  test("dense_rank bounds through per-file ndv stats; ndv-less manifests decline") {
    // same layout as writeTable but the manifest opts the sort column
    // into exact per-file distinct counts — the dense_rank <= k proof
    // needs k distinct VALUES, which only `__ndv` can establish
    val df = spark.range(3000L).select(
      col("id").as("c"),
      concat(lit("p"), (col("id") % 3)).as("p"),
      (col("id") % 5).as("dup")) // 5-way duplicated sort key variant
    val dir = tmp("wtopk_dense")
    df.repartitionByRange(12, col("p"), col("c"))
      .write.partitionBy("p").parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("p", "c"),
      ndvCols = Seq("c"))
    val total = Skipping.dataFiles(spark, dir).size
    def dr(df: DataFrame) = df.withColumn("dr", dense_rank().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("dr") <= 10)
    assert(sets(dr(read(dir))) == sets(dr(readFull(dir))))
    val nf = scannedFiles(dr(read(dir)))
    assert(nf * 2 <= total, s"dense_rank scanned $nf of $total")
    // direct API: the distinct target alone derives per-group bounds
    import org.apache.spark.sql.types._
    val bounds = Skipping.windowTopKBounds(spark, dir, Seq("p"), "c",
      0L, desc = true, nullsFirst = false,
      Map("p" -> StringType, "c" -> LongType), Nil, kDistinct = 10L)
    assert(bounds.exists(_.forall(_._2.isDefined)),
      s"every group should bound, got $bounds")
    // soundness of the distinct target: a DUPLICATED sort key must
    // keep enough files for k distinct values, not just k rows —
    // c%5 has 600 distinct values per group over the same files, the
    // bound must sit at least 10 distinct values deep
    val dirDup = tmp("wtopk_densedup")
    df.select(col("dup").as("c"), col("p"), col("c").as("orig"))
      .repartitionByRange(12, col("p"), col("c"))
      .write.partitionBy("p").parquet(dirDup)
    Skipping.writeManifest(spark, dirDup, Seq("p", "c"),
      ndvCols = Seq("c"))
    def dr5(df: DataFrame) = df.withColumn("dr", dense_rank().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("dr") <= 3).select("p", "c", "orig", "dr")
    assert(sets(dr5(read(dirDup))) == sets(dr5(readFull(dirDup))))
  }

  test("float/double/binary partition keys decline before the memo") {
    // the per-group walk groups stat rows driver-side by Scala equality
    // on external values — boxed -0.0/0.0 and byte-array reference
    // equality diverge from Spark's row equality, so those key types
    // must decline EXPLICITLY (r16 ADVICE: a split group could blow the
    // group cap and permanently memoize a spurious decline)
    val dir = tmp("wtopk_keytypes")
    spark.range(600).select(col("id").as("c"),
        (col("id") % 3).cast("double").as("gd"),
        concat(lit("g"), col("id") % 3).cast("binary").as("gb"))
      .repartitionByRange(6, col("gd"), col("c"))
      .write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("gd", "gb", "c"))
    import org.apache.spark.sql.types._
    assert(Skipping.windowTopKBounds(spark, dir, Seq("gd"), "c", 5L,
      desc = true, nullsFirst = false,
      Map("gd" -> DoubleType, "c" -> LongType)).isEmpty,
      "double partition key must decline")
    assert(Skipping.windowTopKBounds(spark, dir, Seq("gb"), "c", 5L,
      desc = true, nullsFirst = false,
      Map("gb" -> BinaryType, "c" -> LongType)).isEmpty,
      "binary partition key must decline")
    // results stay exact through the rule either way (gb dropped from
    // the compare: Row.toString renders byte arrays by identity)
    def dk(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("gd").orderBy(col("c").desc)))
      .filter(col("rn") <= 5).select("c", "gd", "rn")
    assert(sets(dk(read(dir))) == sets(dk(readFull(dir))))
  }

  test("unified stat-key fence: struct-typed keys decline everywhere") {
    import org.apache.spark.sql.types._
    // ONE whitelist (statKeyChainSafe) now fences every driver-side
    // stat consumer (r17 VERDICT #4): a NEW/unproven stat type declines
    // by construction instead of relying on two blacklists being kept
    // in sync. Direct checks first:
    val st = StructType(Seq(StructField("k", LongType)))
    assert(!Skipping.statKeyChainSafe(st), "struct must decline")
    assert(!Skipping.statKeyChainSafe(FloatType) &&
      !Skipping.statKeyChainSafe(DoubleType) &&
      !Skipping.statKeyChainSafe(BinaryType))
    assert(Skipping.statKeyChainSafe(LongType) &&
      Skipping.statKeyChainSafe(StringType) &&
      Skipping.statKeyChainSafe(DateType) &&
      Skipping.statKeyChainSafe(DecimalType(10, 2)))
    // end-to-end: a struct group key over real manifest stats (Spark
    // happily min/maxes orderable structs, so the stats EXIST — only
    // the fence keeps the driver-side walks off them)
    val dir = tmp("wtopk_structkey")
    spark.range(600).select(col("id").as("c"),
        struct((col("id") % 3).as("k")).as("gs"))
      .repartitionByRange(6, col("gs"), col("c"))
      .write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("gs", "c"),
      ndvCols = Seq("c"))
    assert(Skipping.windowTopKBounds(spark, dir, Seq("gs"), "c", 5L,
      desc = true, nullsFirst = false,
      Map("gs" -> st, "c" -> LongType)).isEmpty,
      "struct partition key must decline the window walk")
    // grouped ndv chain: c is clustered (not file-constant), so only
    // the chain could answer count(DISTINCT c) — and the struct group
    // key must fence it
    assert(Skipping.metadataGroupStats(spark, dir, Seq("gs"), Nil,
      expectedTypes = Map("gs" -> st, "c" -> LongType),
      distinctCols = Seq(Seq("c"))).isEmpty,
      "struct group key must decline the grouped ndv chain")
    // struct DISTINCT column: ndv stats exist for c only, but even a
    // struct column WITH stats must fence the chain (sort-side check)
    val dir2 = tmp("wtopk_structdc")
    spark.range(600).select(col("id").as("c"),
        struct((col("id") % 50).as("k")).as("gs"))
      .repartitionByRange(6, col("gs"))
      .write.parquet(dir2)
    Skipping.writeManifest(spark, dir2, Seq("gs", "c"),
      ndvCols = Seq("gs"))
    assert(Skipping.metadataGroupStats(spark, dir2, Nil, Nil,
      expectedTypes = Map("gs" -> st, "c" -> LongType),
      distinctCols = Seq(Seq("gs"))).isEmpty,
      "struct distinct column must decline the global ndv chain")
  }

  test("pagination shape: rn BETWEEN a AND b bounds on the upper limit") {
    val (dir, total) = writeTable(3000)
    def q(df: DataFrame) = df.withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(col("c").desc)))
      .filter(col("rn").between(3, 7))
    assert(sets(q(read(dir))) == sets(q(readFull(dir))))
    val nf = scannedFiles(q(read(dir)))
    assert(nf * 2 <= total, s"scanned $nf of $total")
  }

  test("randomized differential: window top-k == noskip across shapes") {
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 12) {
      val nGroups = 1 + rnd.nextInt(5)
      val nullFrac = if (rnd.nextBoolean()) 0 else 97
      val desc = rnd.nextBoolean()
      // 0 = row_number, 1 = rank, 2 = dense_rank (distinct-value bound
      // via the ndv chain); the sort key is randomly DUPLICATED so the
      // dense trials exercise k-distinct-vs-k-rows for real
      val fnKind = rnd.nextInt(3)
      val dup = if (rnd.nextBoolean()) 1L else 3L
      val k = 1 + rnd.nextInt(20)
      val df = spark.range(1500).select(
        (if (nullFrac == 0) col("id") / dup
         else when(col("id") % nullFrac === 0, lit(null))
           .otherwise(col("id") / dup)).cast("long").as("c"),
        concat(lit("g"), (col("id") % nGroups)).as("p"))
      val dir = tmp(s"wtopk_rnd$trial")
      df.repartitionByRange(8, col("p"), col("c"))
        .write.partitionBy("p").parquet(dir)
      graft.sources.Skipping.writeManifest(spark, dir, Seq("p", "c"),
        ndvCols = Seq("c"))
      def q(d: DataFrame) = {
        val w = Window.partitionBy("p").orderBy(
          if (desc) col("c").desc else col("c").asc)
        val r = fnKind match {
          case 0 => row_number().over(w)
          case 1 => rank().over(w)
          case _ => dense_rank().over(w)
        }
        d.withColumn("rn", r).filter(col("rn") <= k)
      }
      assert(sets(q(read(dir))) == sets(q(readFull(dir))),
        s"trial $trial: groups=$nGroups nulls=${nullFrac != 0} " +
          s"desc=$desc fn=$fnKind dup=$dup k=$k")
    }
  }

  test("dialect QUALIFY over a manifest table prunes per group") {
    val (dir, total) = writeTable(3000)
    val exec = new graft.exec.Executor(spark,
      Map("t" -> spark.read.parquet(dir)))
    def q = exec.query("select p, c from t qualify " +
      "row_number() over (partition by p order by c desc) <= 10")
    assert(q.count() == 30)
    val nf = scannedFiles(exec.query("select p, c from t qualify " +
      "row_number() over (partition by p order by c desc) <= 10"))
    assert(nf * 2 <= total, s"dialect scanned $nf of $total")
  }

  test("idempotent through the fixed point: exactly one injected OR filter") {
    val (dir, _) = writeTable(2000)
    val plan = topk(read(dir), 10).queryExecution.optimizedPlan
    val orFilters = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.Or] => f
    }
    assert(orFilters.size == 1,
      s"expected one injected OR filter, got ${orFilters.size}")
  }
}
