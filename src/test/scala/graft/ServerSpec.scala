package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.{SqlClient, SqlServer}

/** Network round-trip through the DBAPI-analog server (reference
  * src/framequery/alchemy/dbapi.py:5-161 — cursor execute/fetchall,
  * parameter substitution, error behavior; dialect.py:13-62 — the
  * network client surface). */
class ServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def withServer[A](body: SqlClient => A): A = {
    val scope = Map(
      "stores" -> Seq((0, 1), (0, 2), (1, 3), (1, 4)).toDF("country", "id"),
      "sales" -> Seq((1, 5), (2, 6), (3, 7), (4, 8)).toDF("store_id", "sales"))
    val server = new SqlServer(spark, scope)
    val client = new SqlClient("127.0.0.1", server.boundPort)
    try body(client)
    finally { client.close(); server.close() }
  }

  test("select round-trip: columns + positional rows") {
    withServer { c =>
      val Some((cols, rows)) = c.execute(
        """select country, sum(sales) as sales from sales
           join stores on sales.store_id = stores.id
           group by country order by country""")
      assert(cols == Seq("country", "sales"))
      assert(rows == Seq(Seq(0L, 11L), Seq(1L, 15L)))
    }
  }

  test("parameterized query escapes through the wire") {
    withServer { c =>
      val Some((_, rows)) = c.execute(
        "select count(*) as n from stores where country = %s", Seq(1))
      assert(rows == Seq(Seq(2L)))
      // injection attempt stays a literal
      val Some((_, r2)) = c.execute(
        "select count(*) as n from stores where 'x' = %s",
        Seq("x' or '1'='1"))
      assert(r2 == Seq(Seq(0L)))
    }
  }

  test("statements persist within a connection session") {
    withServer { c =>
      assert(c.execute(
        "create table big as select * from sales where sales > 6").isEmpty)
      val Some((_, rows)) = c.execute("select count(*) as n from big")
      assert(rows == Seq(Seq(2L)))
    }
  }

  test("sessions are isolated across connections") {
    val server = new SqlServer(spark,
      Map("t" -> Seq(1, 2, 3).toDF("x")))
    val c1 = new SqlClient("127.0.0.1", server.boundPort)
    val c2 = new SqlClient("127.0.0.1", server.boundPort)
    try {
      c1.execute("create table mine as select x + 10 as x from t")
      // c2 must not see c1's scope mutation
      val e = intercept[RuntimeException](c2.execute("select * from mine"))
      assert(e.getMessage.toLowerCase.contains("mine"))
    } finally { c1.close(); c2.close(); server.close() }
  }

  test("errors keep the connection usable") {
    withServer { c =>
      intercept[RuntimeException](c.execute("select * from nope"))
      val Some((_, rows)) = c.execute("select 1 as one")
      assert(rows == Seq(Seq(1L)))
    }
  }

  test("malformed protocol input yields an error line, not a dead socket") {
    withServer { c =>
      // raw junk, valid JSON with no sql field, wrong params type —
      // each must produce {"error": ...} and leave the session usable
      assert(c.request("this is not json").has("error"))
      assert(c.request("""{"q": "select 1"}""").has("error"))
      assert(c.request("""{"sql": "select 1", "params": 7}""").has("error"))
      val Some((_, rows)) = c.execute("select 2 as two")
      assert(rows == Seq(Seq(2L)))
    }
  }

  test("concurrent clients execute safely in parallel") {
    val server = new SqlServer(spark,
      Map("t" -> (1 to 100).toDF("x")))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    try {
      val threads = (1 to 4).map { i =>
        val t = new Thread(null, () => {
          try {
            val c = new SqlClient("127.0.0.1", server.boundPort)
            try {
              (1 to 5).foreach { _ =>
                val Some((_, rows)) = c.execute(
                  "select sum(x) as s from t where x <= %s", Seq(i * 10))
                if (rows != Seq(Seq((1 to i * 10).sum.toLong)))
                  throw new AssertionError(s"client $i got $rows")
              }
            } finally c.close()
          } catch { case e: Throwable => errs.add(e) }
        }, s"client-$i")
        t.start(); t
      }
      threads.foreach(_.join(60000))
      assert(threads.forall(!_.isAlive), "client thread timed out")
      assert(errs.isEmpty, s"client errors: $errs")
    } finally server.close()
  }

  test("scope-spec bootstrap runs per connection (dialect.py setup parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_srv_spec")
    Seq((1, "x"), (2, "y")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    java.nio.file.Files.writeString(dir.resolve("scope.json"),
      s"""{"tables": {"t": "t.parquet"},
         | "setup": ["create table doubled as select id * 2 as id2 from t"]}"""
        .stripMargin)
    val server = new SqlServer(spark,
      scopeSpecPath = Some(s"$dir/scope.json"))
    val client = new SqlClient("127.0.0.1", server.boundPort)
    try {
      val Some((_, rows)) = client.execute(
        "select id2 from doubled order by id2")
      assert(rows == Seq(Seq(2L), Seq(4L)))
    } finally { client.close(); server.close() }
  }

  test("bootstrap failure answers the client instead of hanging it") {
    // r6 bug found by tools/sql_client.py: a bad scope spec threw OUTSIDE
    // serve()'s try/finally, leaving the socket open — every client hung
    // forever on its first readline. Now: one error line, then close.
    val server = new SqlServer(spark,
      scopeSpecPath = Some("/nonexistent/scope.json"))
    val client = new SqlClient("127.0.0.1", server.boundPort)
    try {
      val resp = client.request("""{"sql": "select 1"}""")
      assert(resp.has("error"), s"expected bootstrap error, got $resp")
      assert(resp.get("error").asText.contains("bootstrap"))
    } finally { client.close(); server.close() }
  }

  test("duplicate result column names stay positional") {
    withServer { c =>
      val Some((cols, rows)) = c.execute(
        "select country as k, id as k from stores where id = 1")
      assert(cols == Seq("k", "k"))
      assert(rows == Seq(Seq(0L, 1L)))
    }
  }

  test("null round-trip and row truncation") {
    withServer { c =>
      val Some((cols, rows)) = c.execute(
        "select null as a, 'x' as b from stores", maxRows = 3)
      assert(cols == Seq("a", "b"))
      assert(rows.length == 3)
      assert(rows.head == Seq(null, "x"))
    }
  }
}
