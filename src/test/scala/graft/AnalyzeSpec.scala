package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite
import graft.exec.Executor

/** ANALYZE → measured statistics → broadcast-join decision: the
  * statistics-to-plan-choice loop (r6 verdict next-round #8).
  *
  * The scenarios pin exactly the two cases where Catalyst's static
  * size estimate steers the join strategy wrong and a measured count
  * fixes it:
  *  - a CTAS scope entry is a computed plan whose estimate is
  *    propagated (a join's size estimate is ~left×right), so a tiny
  *    derived dimension looks huge and plans as shuffle;
  *  - a small parquet table's file size (footer/metadata dominated)
  *    overstates the data by a large factor.
  */
class AnalyzeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def freshExec(): Executor = {
    val e = new Executor(spark)
    e.executeScript(s"""
      COPY lineitem FROM '$dir/lineitem.parquet' WITH format 'parquet';
      COPY supplier FROM '$dir/supplier.parquet' WITH format 'parquet';
      COPY nation   FROM '$dir/nation.parquet'   WITH format 'parquet'
    """)
    e
  }

  private def withThreshold[A](bytes: String)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, bytes)
    try body finally spark.conf.set(key, old)
  }

  private def plan(e: Executor, sql: String): String =
    e.query(sql).queryExecution.explainString(FormattedMode)

  test("ANALYZE collects measured row counts, visible via table_stats()") {
    val e = freshExec()
    e.execute("ANALYZE TABLE nation, supplier")
    val got = e.query(
      "select table_name, row_count from table_stats() order by table_name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val nNation = e.query("select count(*) as c from nation")
      .head().getLong(0)
    val nSupp = e.query("select count(*) as c from supplier")
      .head().getLong(0)
    assert(got == Seq("nation" -> nNation, "supplier" -> nSupp))
    val bytes = e.query(
      "select est_size_bytes from table_stats() where table_name = 'nation'")
      .head().getLong(0)
    assert(bytes > 0 && bytes < 64 * 1024,
      s"nation estimated at $bytes bytes — expected a few KB of data")
  }

  test("bare ANALYZE covers the whole scope") {
    val e = freshExec()
    e.execute("ANALYZE")
    val names = e.query("select table_name from table_stats()")
      .collect().map(_.getString(0)).toSet
    assert(names == Set("lineitem", "supplier", "nation"))
  }

  test("computed CTAS dim: shuffle join before ANALYZE, broadcast after") {
    val e = freshExec()
    // the derived dimension is ~25 rows of (suppkey, nation name) but its
    // STATIC estimate is join-propagated from two parquet scans — far
    // over a 4 KB budget, so un-ANALYZEd it must NOT plan as broadcast
    e.execute("""CREATE TABLE supp_dim AS
      select s_suppkey, n_name from supplier
      join nation on s_nationkey = n_nationkey""")
    withThreshold("4096") {
      val q = """select n_name, count(*) as cnt
                 from lineitem join supp_dim on l_suppkey = s_suppkey
                 group by n_name"""
      // (the dim's own supplier⋈nation build may broadcast by file size;
      // the discriminator is the lineitem-side join falling back to SMJ)
      val before = plan(e, q)
      assert(before.contains("SortMergeJoin"),
        s"expected shuffle join before ANALYZE:\n$before")

      e.execute("ANALYZE supp_dim")
      val after = plan(e, q)
      assert(after.contains("BroadcastHashJoin") &&
        !after.contains("SortMergeJoin"),
        s"expected broadcast join after ANALYZE:\n$after")
      // and the result itself is unchanged by the plan flip
      val rows = e.query(q).collect().map(r =>
        (r.getString(0), r.getLong(1))).toMap
      assert(rows.values.sum == e.query("select count(*) as c from lineitem")
        .head().getLong(0))
    }
  }

  test("threshold -1 disables stats-driven hinting") {
    val e = freshExec()
    e.execute("""CREATE TABLE supp_dim AS
      select s_suppkey, n_name from supplier
      join nation on s_nationkey = n_nationkey""")
    e.execute("ANALYZE supp_dim")
    withThreshold("-1") {
      val p = plan(e, """select n_name, count(*) as cnt
        from lineitem join supp_dim on l_suppkey = s_suppkey group by n_name""")
      assert(!p.contains("BroadcastHashJoin"),
        "threshold -1 must disable the broadcast hint")
    }
  }

  test("persisted CTAS + ANALYZE: a fresh session broadcasts without re-ANALYZE") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_xstats").toString
    val e1 = freshExec()
    e1.execute(s"""CREATE TABLE supp_dim
      WITH (persist='parquet', path='$tmp/supp_dim') AS
      select s_suppkey, n_name from supplier
      join nation on s_nationkey = n_nationkey""")
    e1.execute("ANALYZE supp_dim") // writes the _graft_stats.json sidecar

    // FRESH session: re-attach from storage, no ANALYZE here
    val e2 = new Executor(spark)
    e2.execute(s"COPY lineitem FROM '$dir/lineitem.parquet' WITH format 'parquet'")
    e2.execute(s"COPY supp_dim FROM '$tmp/supp_dim' WITH format 'parquet'")
    assert(e2.query("select * from table_stats()").count() == 1,
      "sidecar stats should ride back in on attach")
    withThreshold("4096") {
      val after = plan(e2,
        """select n_name, count(*) as cnt
          |from lineitem join supp_dim on l_suppkey = s_suppkey
          |group by n_name""".stripMargin)
      assert(after.contains("BroadcastHashJoin") &&
        !after.contains("SortMergeJoin"),
        s"expected broadcast from persisted stats without re-ANALYZE:\n$after")
    }
  }

  test("overwriting a table's backing path drops its stats") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pathinv").toString
    val e = freshExec()
    e.execute(s"COPY nation TO '$tmp/t.parquet' WITH format 'parquet'")
    e.execute(s"COPY t FROM '$tmp/t.parquet' WITH format 'parquet'")
    e.execute("ANALYZE t")
    assert(e.query("select * from table_stats()").count() == 1)
    // COPY TO over the same path changes the data behind t — its
    // measured stats are stale and must drop with the write
    e.execute(s"COPY supplier TO '$tmp/t.parquet' WITH format 'parquet'")
    assert(e.query("select * from table_stats()").count() == 0)
    // a different path leaves them alone
    e.execute(s"COPY t FROM '$tmp/t.parquet' WITH format 'parquet'")
    e.execute("ANALYZE t")
    e.execute(s"COPY supplier TO '$tmp/other.parquet' WITH format 'parquet'")
    assert(e.query("select * from table_stats()").count() == 1)
  }

  test("rebinding a table invalidates its stats") {
    val e = freshExec()
    e.execute("ANALYZE nation")
    assert(e.query("select * from table_stats()").count() == 1)
    // DML rebind drops the now-stale entry
    e.execute("INSERT INTO nation select * from nation")
    assert(e.query("select * from table_stats()").count() == 0)
    // DROP drops it too
    e.execute("ANALYZE supplier")
    e.execute("DROP TABLE supplier")
    assert(e.query("select * from table_stats()").count() == 0)
  }

  test("fq_analyze_stats driver query: stats flip the fact join to broadcast") {
    val p = SparkEntry.queries("fq_analyze_stats")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      "ANALYZEd dim join did not plan as broadcast")
    assert(!p.contains("SortMergeJoin"),
      "fact join fell back to shuffle despite measured stats")
  }

  test("ANALYZE of an unknown table errors") {
    val e = new Executor(spark)
    val err = intercept[graft.compiler.CompileException] {
      e.execute("ANALYZE nosuch")
    }
    assert(err.getMessage.contains("nosuch"))
  }
}
