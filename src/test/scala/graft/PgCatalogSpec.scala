package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.exec.Executor
import graft.server.PgWireServer
import graft.sources.Tables

/** Catalog-reflection surface (graft.compiler.PgCatalog): the psql tests
  * drive the REAL psql binary against [[PgWireServer]] — `\dt` and
  * `\d <table>` are the first commands every human types, and they
  * exercise pg_class/pg_namespace/pg_attribute/pg_am joins, regex
  * operators, OPERATOR() syntax, COLLATE, qualified functions/casts and
  * the non-aggregate correlated-subquery lowering end to end. */
class PgCatalogSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def havePsql = new java.io.File("/usr/bin/psql").canExecute

  private def withServer[A](body: Int => A): A = {
    val server = new PgWireServer(spark,
      Map("nation" -> Tables.load(spark, dir, "nation")))
    try body(server.boundPort) finally server.close()
  }

  private def psql(port: Int, args: String*): (Int, String) = {
    import scala.sys.process._
    val cmd = Seq("/usr/bin/psql", "-h", "127.0.0.1", "-p", port.toString,
      "-U", "graft", "-d", "g", "-X") ++ args
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'),
      l => buf.append(l).append('\n'))
    (Process(cmd).!(logger), buf.toString)
  }

  test("psql \\dt lists scope tables with schema/type/owner") {
    assume(havePsql)
    withServer { port =>
      val (rc, out) = psql(port, "-c", "\\dt")
      assert(rc == 0, out)
      assert(!out.contains("ERROR"), out)
      assert(out.contains("nation") && out.contains("table") &&
        out.contains("public") && out.contains("graft"), out)
    }
  }

  test("psql \\d <table> renders columns with formatted types") {
    assume(havePsql)
    withServer { port =>
      val (rc, out) = psql(port, "-c", "\\d nation")
      assert(rc == 0, out)
      assert(!out.contains("ERROR"), out)
      assert(out.contains("n_nationkey") && out.contains("integer"), out)
      assert(out.contains("n_name") && out.contains("text"), out)
    }
  }

  test("psql \\d+ and \\dt+ verbose forms render") {
    assume(havePsql)
    withServer { port =>
      val (rc1, out1) = psql(port, "-c", "\\d+ nation")
      assert(rc1 == 0 && !out1.contains("ERROR"), out1)
      assert(out1.contains("Access method: heap"), out1)
      val (rc2, out2) = psql(port, "-c", "\\dt+")
      assert(rc2 == 0 && !out2.contains("ERROR"), out2)
      assert(out2.contains("permanent"), out2)
    }
  }

  test("psql sees tables created mid-session (live scope reflection)") {
    assume(havePsql)
    withServer { port =>
      val (rc, out) = psql(port,
        "-c", "create table topn as select n_name from nation limit 3",
        "-c", "\\dt")
      assert(rc == 0 && !out.contains("ERROR"), out)
      assert(out.contains("topn"), out)
    }
  }

  test("pg_class/pg_attribute reflect schema; OIDs stable across statements") {
    val exec = new Executor(spark,
      Map("t1" -> Seq((1L, "a")).toDF("id", "s")))
    val rel = exec.query(
      "select oid, relname from pg_class where relname = 't1'").head()
    val oid = rel.getLong(0)
    // same OID when re-queried (psql resolves the OID in one statement
    // and reads pg_attribute with it in the next)
    val attrs = exec.query(
      s"""select attname, atttypid from pg_attribute
         |where attrelid = '$oid' and attnum > 0 order by attnum""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(attrs.toSeq == Seq(("id", 20L), ("s", 25L)))
    // format_type maps the advertised OIDs to PG names
    val types = exec.query(
      s"""select format_type(atttypid, atttypmod) as t from pg_attribute
         |where attrelid = '$oid' and attnum > 0 order by attnum""".stripMargin)
      .collect().map(_.getString(0))
    assert(types.toSeq == Seq("bigint", "text"))
  }

  test("information_schema.tables and .columns reflect the scope") {
    val exec = new Executor(spark,
      Map("t1" -> Seq((1L, "a")).toDF("id", "s")))
    val t = exec.query("""select table_name, table_type
      |from information_schema.tables order by 1""".stripMargin).head()
    assert(t.getString(0) == "t1" && t.getString(1) == "BASE TABLE")
    val cols = exec.query(
      """select column_name, data_type from information_schema.columns
        |where table_name = 't1' order by ordinal_position""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(cols.toSeq == Seq(("id", "bigint"), ("s", "text")))
  }

  test("regex match operators ~ ~* !~ !~* and OPERATOR() syntax") {
    val exec = new Executor(spark,
      Map("nation" -> Tables.load(spark, dir, "nation")))
    def n(sql: String): Long = exec.query(sql).head().getLong(0)
    val total = n("select count(1) as n from nation")
    // names are NATION_0..NATION_24 — _1x matches the 10s decade
    val anchored = n("select count(1) as n from nation where n_name ~ '_1[0-9]$'")
    assert(anchored > 0 && anchored < total)
    assert(n("select count(1) as n from nation where n_name ~* '^nation_1[0-9]$'") ==
      anchored)
    assert(n("select count(1) as n from nation where n_name !~ '_1[0-9]$'") ==
      total - anchored)
    assert(n("""select count(1) as n from nation
      |where n_name operator(pg_catalog.~) '_1[0-9]$'
      |  collate pg_catalog.default""".stripMargin) == anchored)
  }

  test("= ANY(array) membership and <> ALL(array)") {
    val exec = new Executor(spark)
    val r = exec.query(
      """select 2 = any(array[1, 2, 3]) as a,
        |       5 = any(array[1, 2, 3]) as b,
        |       5 <> all(array[1, 2, 3]) as c""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
  }

  test("|| concatenates arrays as arrays and scalars as text") {
    val exec = new Executor(spark)
    val r = exec.query(
      """select array[1, 2] || array[3] as arr, 1 || 'a' as s""".stripMargin)
      .head()
    assert(r.getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(r.getString(1) == "1a")
  }

  test("non-aggregate correlated scalar subquery: NULL on miss, value on hit") {
    val exec = new Executor(spark, Map(
      "o" -> Seq(1L, 2L).toDF("id"),
      "i" -> Seq((1L, "x")).toDF("k", "v")))
    val rows = exec.query(
      """select id, (select v from i where i.k = o.id) as v
        |from o order by id""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq((1L, Some("x")), (2L, None)))
  }

  test("non-aggregate correlated scalar subquery: >1 match raises (PG parity)") {
    val exec = new Executor(spark, Map(
      "o" -> Seq(1L).toDF("id"),
      "i" -> Seq((1L, "x"), (1L, "y")).toDF("k", "v")))
    val e = intercept[Exception] {
      exec.query(
        "select (select v from i where i.k = o.id) as v from o").collect()
    }
    assert(e.getMessage.contains("more than one row"), e.getMessage)
  }

  test("correlated unnest generator: explode of an outer array column") {
    val exec = new Executor(spark, Map(
      "o" -> Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
        .toDF("id", "tags")))
    // the \d+ reloptions shape: ARRAY(correlated subquery over unnest)
    val rows = exec.query(
      """select id,
        |  array_to_string(array(select 't.' || x from unnest(o.tags) x), ',')
        |    as opts
        |from o order by id""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq((1L, Some("t.a,t.b")), (2L, None)))
  }

  test("psql drives the round-10 statement surface end to end") {
    assume(havePsql)
    withServer { port =>
      // recursive CTE over the wire
      val (rc1, out1) = psql(port, "-c",
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t " +
          "WHERE n < 5) SELECT cast(sum(n) as bigint) AS s FROM t")
      assert(rc1 == 0 && out1.contains("15"), out1)
      // CREATE VIEW → MERGE INTO it → read back, one session (-c chains
      // run in separate connections, so use a single multi-statement -c)
      val script =
        "CREATE TABLE tgt AS select n_nationkey as id, n_name as name " +
          "from nation where n_nationkey < 3;\n" +
        "MERGE INTO tgt USING (select 1 as sid, 'PATCHED' as sname) AS s " +
          "ON id = sid WHEN MATCHED THEN UPDATE SET name = sname " +
          "WHEN NOT MATCHED THEN INSERT (id, name) VALUES (sid, sname);\n" +
        "SELECT id, name FROM tgt ORDER BY id;"
      val (rc2, out2) = psql(port, "-c", script)
      assert(rc2 == 0, out2)
      assert(out2.contains("PATCHED") && !out2.contains("ERROR"), out2)
      // EXPLAIN ANALYZE renders plan + metrics over the wire
      val (rc3, out3) = psql(port, "-c",
        "EXPLAIN ANALYZE SELECT n_regionkey, count(1) FROM nation " +
          "GROUP BY n_regionkey")
      assert(rc3 == 0, out3)
      assert(out3.contains("Physical Plan") &&
        out3.contains("Runtime metrics:"), out3)
    }
  }
}
