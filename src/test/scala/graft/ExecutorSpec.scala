package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.exec.Executor

/** Statement handlers + session surface (reference Executor semantics:
  * tests/test__executor__execute.py, tests/test__alchemy.py). */
class ExecutorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** README flagship (reference Readme.md:27-35, golden {(0,11),(1,15)}) */
  test("flagship join-aggregate") {
    val exec = new Executor(spark, Map(
      "stores" -> Seq((0, 1), (0, 2), (1, 3), (1, 4)).toDF("country", "id"),
      "sales" -> Seq((1, 5), (2, 6), (3, 7), (4, 8)).toDF("store_id", "sales")))
    val got = exec.query(
      """select country, sum(sales) as sales from sales
         join stores on sales.store_id = stores.id group by country""")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((0, 11L), (1, 15L)))
  }

  /** executor golden fixture (reference tests/test__executor__execute.py:12-63) */
  test("golden: projections and grouped aggregates") {
    val exec = new Executor(spark, Map(
      "example" -> Seq((1, 4, 0), (2, 5, 0), (3, 6, 1)).toDF("a", "b", "g")))
    assert(exec.query("select * from example").collect().length == 3)
    assert(exec.query("select a + b as c from example")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(5, 7, 9))
    assert(exec.query("select g, sum(a) as s from example group by g")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet == Set((0, 3L), (1, 3L)))
    assert(exec.query("select 2 * g as gg, sum(a) as s from example group by gg")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 3L), (2L, 3L)))
    assert(exec.query("select sum(a) as s from example group by 2 * g")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    assert(exec.query("select a from example order by a desc")
      .collect().map(_.getInt(0)).toSeq == Seq(3, 2, 1))
  }

  test("copy from / copy to round trip (reference csv fixture)") {
    val dir = Files.createTempDirectory("graft_csv")
    val src = dir.resolve("test.csv")
    // reference fixture tests/data/test.csv (semicolon csv)
    Files.writeString(src,
      "f;g;i\n7.0;0;1\n8.0;0;2\n9.0;0;3\n0.0;1;4\n1.0;1;5\n2.0;2;6\n")
    val exec = new Executor(spark)
    exec.setBasepath(dir.toString)
    exec.execute("COPY foo FROM 'test.csv' WITH delimiter ';', format 'csv'")
    val got = exec.query("select g, sum(i) as s from foo group by g")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((0, 6L), (1, 9L), (2, 6L))) // golden (FIXTURES §4)

    exec.execute("CREATE TABLE bar AS select g, sum(i) as s from foo group by g")
    exec.execute(s"COPY bar TO 'out.csv' WITH delimiter ';', format 'csv'")
    val written = Files.readString(dir.resolve("out.csv"))
    assert(written.startsWith("g;s\n") || written.startsWith("g;s\r\n"))
    assert(written.linesIterator.size == 4)

    exec.execute("DROP TABLE foo, bar")
    assert(exec.tableNames.isEmpty)
    intercept[Exception] { exec.query("select * from foo") }
  }

  test("copy_from as table function in FROM") {
    val dir = Files.createTempDirectory("graft_csv2")
    Files.writeString(dir.resolve("t.csv"), "a;b\n1;2\n3;4\n")
    val exec = new Executor(spark)
    exec.setBasepath(dir.toString)
    val got = exec.query(
      "select sum(a + b) as s from copy_from('t.csv', 'delimiter', ';', 'format', 'csv')")
      .collect()(0).getLong(0)
    assert(got == 10L)
  }

  test("show stubs") {
    val exec = new Executor(spark)
    val df = exec.execute("SHOW TRANSACTION ISOLATION LEVEL").get
    assert(df.collect()(0).getString(0) == "read only")
  }

  test("scalar UDF registration (reference add_function)") {
    val exec = new Executor(spark, Map("t" -> Seq(1, 2, 3).toDF("x")))
    exec.addFunction("double_it", args => args.head * 2)
    assert(exec.query("select double_it(x) as y from t")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4, 6))
  }

  test("aggregate UDAF registration (Aggregator surface, SURVEY §2.10)") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    object Product extends Aggregator[Long, Long, Long] {
      def zero: Long = 1L
      def reduce(b: Long, a: Long): Long = b * a
      def merge(l: Long, r: Long): Long = l * r
      def finish(b: Long): Long = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    val exec = new Executor(spark, Map(
      "t" -> Seq((0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L)).toDF("k", "v")))
    exec.addAggregate("prod", Product)
    // grouped
    assert(exec.query("select k, prod(v) as p from t group by k order by k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 6L), (1L, 20L)))
    // global (no GROUP BY — requires the parser to type prod as a set fn)
    assert(exec.query("select prod(v) as p from t")
      .collect().head.getLong(0) == 120L)
    // HAVING over the custom aggregate
    assert(exec.query(
      "select k from t group by k having prod(v) > 10 order by k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("UDAF name classification is per-executor, not process-wide") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    object SessionProd extends Aggregator[Long, Long, Long] {
      def zero: Long = 1L
      def reduce(b: Long, a: Long): Long = b * a
      def merge(x: Long, y: Long): Long = x * y
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    val df = Seq((0L, 2L), (1L, 3L)).toDF("k", "v")
    val exec1 = new Executor(spark, Map("t" -> df))
    exec1.addAggregate("sessionprod", SessionProd)
    assert(exec1.query("select sessionprod(v) as p from t")
      .collect().head.getLong(0) == 6L)
    // HAVING routes through the parser's set-function classification
    // (helper agg columns are created only for parsed aggregates)
    assert(exec1.query("select k from t group by k having sessionprod(v) > 2")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a DIFFERENT executor must not see sessionprod as an aggregate:
    // GROUP BY ALL excludes parsed aggregates from the grouping set, so
    // exec1 groups by k alone while exec2 (scalar classification) tries
    // to group by the aggregate itself and is rejected by Spark
    // (previously the name leaked process-wide and silently reclassified
    // for every session)
    assert(exec1
      .query("select k, sessionprod(v) as p from t group by all order by k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 2L), (1L, 3L)))
    val exec2 = new Executor(spark, Map("t" -> df))
    intercept[Exception] {
      exec2.query("select k, sessionprod(v) as p from t group by all")
        .collect()
    }
  }

  test("parameterized query entry (%s / %(name)s, DBAPI parity)") {
    val exec = new Executor(spark,
      Map("t" -> Seq((1L, "a'b"), (2L, "c")).toDF("id", "s")))
    // string escaping: the embedded quote cannot terminate the literal
    assert(exec.query("select id from t where s = %s", Seq("a'b"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(exec.query(
      "select count(1) as n from t where id > %s and s <> %s",
      Seq(0L, "zzz")).collect().head.getLong(0) == 2L)
    // named placeholders
    assert(exec.query("select id from t where s = %(v)s", Map("v" -> "c"))
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // %% literal percent (LIKE pattern) + NULL parameter
    assert(exec.query(
      "select count(1) as n from t where s like 'a%%' and %s is null",
      Seq(null)).collect().head.getLong(0) == 1L)
    // arity errors
    intercept[IllegalArgumentException] {
      exec.query("select %s, %s from t", Seq(1))
    }
    intercept[IllegalArgumentException] {
      exec.query("select %s from t", Seq(1, 2))
    }
  }

  test("eager CREATE TABLE AS materializes a snapshot (opt-in)") {
    val dir = Files.createTempDirectory("graft_ctas_eager").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    val eager = new Executor(spark,
      Map("t" -> spark.read.parquet(dir)), eagerCtas = true)
    eager.execute("create table snap as select * from t")
    // mutate the source AFTER the CTAS: the snapshot must not move
    // (reference materialize-into-scope semantics, _executor.py:445-448)
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    assert(eager.query("select count(1) as n from snap")
      .collect().head.getLong(0) == 1L)
  }

  test("persisted CREATE TABLE AS survives a session restart") {
    val dir = Files.createTempDirectory("graft_ctas_persist").toString
    val src = s"$dir/src"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.mode("overwrite").parquet(src)
    val exec1 = new Executor(spark)
    exec1.setBasepath(dir)
    exec1.execute(s"COPY t FROM '$src' WITH format 'parquet'")
    exec1.execute(
      "CREATE TABLE big WITH (persist='parquet', path='big_pq') AS " +
        "select id, s from t where id >= 2")
    // the scope entry is backed by the written files, not the plan:
    // overwriting the CTAS input must not move the persisted table
    Seq((9L, "z")).toDF("id", "s").write.mode("overwrite").parquet(src)
    assert(exec1.query("select count(1) as n from big")
      .collect().head.getLong(0) == 2L)

    // a FRESH session re-attaches to the same storage via ScopeSpec
    Files.writeString(Paths.get(s"$dir/scope.json"),
      s"""{"basepath": "$dir", "tables": {"big": "big_pq"}}""")
    val exec2 = graft.exec.ScopeSpec.load(spark, s"$dir/scope.json")
    assert(exec2.query("select id, s from big order by id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "b"), (3L, "c")))

    // COPY FROM re-attach works too (no spec file needed)
    val exec3 = new Executor(spark)
    exec3.setBasepath(dir)
    exec3.execute("COPY big2 FROM 'big_pq' WITH format 'parquet'")
    assert(exec3.query("select count(1) as n from big2")
      .collect().head.getLong(0) == 2L)

    // csv persist rides the same machinery (single-file contract)
    exec1.execute(
      "CREATE TABLE small WITH persist 'csv', path 'small.csv' AS " +
        "select 1 as x")
    assert(Files.exists(Paths.get(s"$dir/small.csv")))
    assert(exec1.query("select x from small")
      .collect().head.get(0).toString == "1")
  }

  test("COPY TO/FROM with parquet and json formats (extension)") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1L, "a"), (2L, "b")).toDF("id", "s")))
    val dir = Files.createTempDirectory("graft_copy_fmt").toString
    exec.execute(s"COPY t TO '$dir/t_parquet' WITH format 'parquet'")
    exec.execute(s"COPY t TO '$dir/t_json' WITH format 'json'")
    exec.execute(s"COPY p FROM '$dir/t_parquet' WITH format 'parquet'")
    exec.execute(s"COPY j FROM '$dir/t_json' WITH format 'json'")
    assert(exec.query("select id, s from p order by id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(exec.query("select id, s from j order by id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    exec.execute(s"COPY t TO '$dir/t_orc' WITH format 'orc'")
    exec.execute(s"COPY o FROM '$dir/t_orc' WITH format 'orc'")
    assert(exec.query("select id, s from o order by id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    exec.execute(s"COPY t TO '$dir/t_xml' WITH format 'xml', rowTag 'doc'")
    exec.execute(s"COPY x FROM '$dir/t_xml' WITH format 'xml', rowTag 'doc'")
    assert(exec.query("select id, s from x order by id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("COPY TO/FROM parquet round-trips every testdata table exactly") {
    // the scale-native format must preserve schema and values for the
    // whole star schema — including embeddings' Array[Float] column and
    // events' nanos-derived ts/ts_nanos pair (r6 verdict: the csv/json
    // paths were covered more heavily than the parquet one)
    val dir = Files.createTempDirectory("graft_pq_rt").toString
    val sf = "/root/testdata/sf0.001"
    graft.sources.Tables.all.foreach { name =>
      val src = graft.sources.Tables.load(spark, sf, name)
      val exec = new Executor(spark, Map(name -> src))
      exec.execute(s"COPY $name TO '$dir/$name' WITH format 'parquet'")
      exec.execute(s"COPY back FROM '$dir/$name' WITH format 'parquet'")
      val back = exec.table("back").get
      assert(back.schema == src.schema,
        s"$name schema drifted:\n got ${back.schema}\n exp ${src.schema}")
      // exact multiset equality, both directions (works for array
      // columns too — Spark set ops hash complex types)
      assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty,
        s"$name values drifted through the parquet round-trip")
    }
  }

  test("COPY with jsonl format and gzip compression round-trips") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1L, "a"), (2L, "b")).toDF("id", "s")))
    val dir = Files.createTempDirectory("graft_copy_gz").toString
    exec.execute(s"COPY t TO '$dir/t_jsonl' WITH format 'jsonl', compression 'gzip'")
    // part-files must actually be gzip-compressed
    val parts = Files.list(java.nio.file.Paths.get(s"$dir/t_jsonl"))
      .toArray.map(_.toString)
      .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".json.gz")), parts.toSeq)
    exec.execute(s"COPY j FROM '$dir/t_jsonl' WITH format 'jsonl'")
    assert(exec.query("select id, s from j order by id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))

    // single-file csv contract holds under compression too
    exec.execute(s"COPY t TO '$dir/t.csv.gz' WITH compression 'gzip'")
    exec.execute(s"COPY c FROM '$dir/t.csv.gz' WITH header 'true'")
    assert(exec.query("select count(*) as n from c").collect()(0).getLong(0) == 2)
  }

  test("INSERT INTO appends via values, select, and column subsets") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1L, "a", 1.5)).toDF("id", "s", "v")))
    exec.execute("insert into t values (2, 'b', 2.5), (3, 'c', 3.5)")
    exec.execute("insert into t select id + 10, s, v from t where id = 1")
    exec.execute("insert into t (id, s) values (99, 'z')") // v fills NULL
    val got = exec.query("select id, s, v from t order by id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull)).toSeq
    assert(got == Seq((1L, "a", "1.5"), (2L, "b", "2.5"), (3L, "c", "3.5"),
      (11L, "a", "1.5"), (99L, "z", null)))
    val e = intercept[Exception] {
      exec.execute("insert into t values (1, 'x')") // arity mismatch
    }
    assert(e.getMessage.contains("columns"), e.getMessage)
  }

  test("UPDATE / DELETE / TRUNCATE rebind scope entries") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")))
    exec.execute("update t set v = v * 2 where id >= 2")
    assert(exec.query("select v from t order by id")
      .collect().map(_.getDouble(0)).toSeq == Seq(10.0, 40.0, 60.0))
    // SET expressions see OLD values: swap-style update is consistent
    exec.execute("update t set v = id, id = v where id = 1")
    assert(exec.query("select id, v from t order by v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head == (10L, 1.0))
    // rows now: (10, 1.0), (2, 40.0), (3, 60.0)
    exec.execute("delete from t where v > 30")
    assert(exec.query("select count(1) as n from t")
      .collect().head.getLong(0) == 1L)
    exec.execute("truncate table t")
    assert(exec.query("select count(1) as n from t")
      .collect().head.getLong(0) == 0L)
  }

  test("DML validates column names and supports subquery predicates") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"),
      "dead" -> Seq(2L, 3L).toDF("id")))
    // unknown columns error instead of silently no-op / NULL-filling
    assert(intercept[Exception] {
      exec.execute("update t set bogus = 1")
    }.getMessage.contains("does not exist"))
    assert(intercept[Exception] {
      exec.execute("insert into t (id, sx) values (9, 'x')")
    }.getMessage.contains("does not exist"))
    // case-insensitive resolution
    exec.execute("update t set S = 'z' where ID = 1")
    assert(exec.query("select s from t where id = 1").collect().head.getString(0) == "z")
    // delete / update with IN-subquery predicates
    exec.execute("delete from t where id in (select id from dead where id > 2)")
    assert(exec.query("select count(1) as n from t").collect().head.getLong(0) == 2)
    exec.execute("update t set s = 'gone' where id in (select id from dead)")
    assert(exec.query("select s from t order by id")
      .collect().map(_.getString(0)).toSeq == Seq("z", "gone"))
  }

  test("SHOW TABLES / SHOW COLUMNS list the live scope") {
    val exec = new Executor(spark, Map(
      "zz" -> Seq(1).toDF("x"), "aa" -> Seq(("s", 2L)).toDF("name", "n")))
    assert(exec.execute("SHOW TABLES").get.collect().map(_.getString(0)).toSeq
      == Seq("aa", "zz"))
    val cols = exec.execute("SHOW COLUMNS FROM aa").get.collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cols == Seq(("name", "string"), ("n", "bigint")))
    // scope changes reflect immediately
    exec.execute("DROP TABLE zz")
    assert(exec.execute("SHOW TABLES").get.collect().map(_.getString(0)).toSeq
      == Seq("aa"))
  }

  test("splitStatements: comment-aware top-level semicolon split") {
    import graft.exec.Executor.splitStatements
    assert(splitStatements("select 1; select 2") ==
      Seq("select 1", "select 2"))
    // trailing comment-only fragment is dropped, not parsed
    assert(splitStatements("select 1; -- done") == Seq("select 1"))
    assert(splitStatements("select 1; /* all done */") == Seq("select 1"))
    // an apostrophe inside a comment must not flip the string state;
    // the comment rides with the following statement (tokenizer strips it)
    assert(splitStatements("select 1; -- don't\nselect 2") ==
      Seq("select 1", "-- don't\nselect 2"))
    assert(splitStatements("select 1 /* won't; split */; select 2") ==
      Seq("select 1 /* won't; split */", "select 2"))
    // semicolons inside strings/identifiers still opaque
    assert(splitStatements("select ';' as a; select \"b;c\" from t") ==
      Seq("select ';' as a", "select \"b;c\" from t"))
    // leading comment before a real statement is kept with it
    assert(splitStatements("-- header\nselect 1") == Seq("-- header\nselect 1"))
  }

  test("UPDATE ... FROM / scalar-subquery SET / DELETE ... USING (PG forms)") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      "s" -> Seq((1L, 100L), (3L, 300L), (3L, 299L), (9L, 900L))
        .toDF("sid", "sv")))
    // scalar subquery in SET (uncorrelated)
    exec.execute("UPDATE t SET v = (SELECT max(sv) FROM s) WHERE id = 2")
    assert(exec.query("select v from t where id = 2")
      .collect()(0).getLong(0) == 900L)
    // correlated scalar subquery in SET: NULL where no match keeps NULL
    exec.execute(
      "UPDATE t SET v = (SELECT max(sv) FROM s WHERE sid = id) WHERE id = 1")
    assert(exec.query("select v from t where id = 1")
      .collect()(0).getLong(0) == 100L)
    // UPDATE ... FROM: SET sees the joined columns; row 3 has TWO s
    // matches — exactly one applies (deterministic smallest tuple)
    exec.execute("UPDATE t SET v = sv FROM s WHERE id = sid AND id = 3")
    assert(exec.query("select v from t where id = 3")
      .collect()(0).getLong(0) == 299L)
    assert(exec.query("select count(*) from t").collect()(0).getLong(0) == 3L)
    // DELETE ... USING: rows with a match go, others stay
    exec.execute("DELETE FROM t USING s WHERE id = sid")
    assert(exec.query("select id from t order by id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // shared column names between target and FROM side (the common join
    // shape): qualified refs must resolve, passthrough columns included
    val exec2 = new Executor(spark, Map(
      "t" -> Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L)),
        (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(20L)))
        .toDF("id", "v"),
      "s" -> Seq((1L, 77L)).toDF("id", "v")))
    exec2.execute("UPDATE t SET v = s.v FROM s WHERE t.id = s.id")
    assert(exec2.query("select v from t order by id")
      .collect().map(_.getLong(0)).toSeq == Seq(77L, 20L))
    // correlated scalar subquery with NO match must SET NULL (PG), not
    // keep the old value
    exec2.execute(
      "UPDATE t SET v = (SELECT max(s.v) FROM s WHERE s.id = t.id) WHERE id = 2")
    val r2 = exec2.query("select v from t where id = 2").collect()(0)
    assert(r2.isNullAt(0), s"expected NULL, got $r2")
  }

  test("MERGE INTO: upsert with update, delete and conditional insert") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("id", "s", "v"),
      "chg" -> Seq((1, 100, "upd"), (3, 0, "del"), (4, 40, "new"),
        (5, -1, "skip")).toDF("cid", "cv", "op")))
    exec.execute(
      """MERGE INTO t USING chg ON id = cid
        |WHEN MATCHED AND op = 'del' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = cv
        |WHEN NOT MATCHED AND cv >= 0 THEN INSERT (id, s, v) VALUES (cid, op, cv)
        |""".stripMargin)
    val rows = exec.query("select id, s, v from t order by id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    // 1 updated, 2 untouched, 3 deleted, 4 inserted, 5 skipped (cv < 0)
    assert(rows == Seq((1, "a", 100), (2, "b", 20), (4, "new", 40)))
  }

  test("MERGE INTO: clause order wins; multi-match errors; subquery source") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1, 10), (2, 20)).toDF("id", "v"),
      "s" -> Seq((1, 1), (1, 2), (2, 5)).toDF("sid", "sv")))
    // first-wins: the unconditional UPDATE shadows the later DELETE
    exec.execute(
      """MERGE INTO t USING (select sid, max(sv) as sv from s group by sid) AS m
        |ON id = m.sid
        |WHEN MATCHED THEN UPDATE SET v = v + m.sv
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(exec.query("select id, v from t order by id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 12), (2, 25)))
    // a target row matching multiple source rows is an error
    val e = intercept[graft.compiler.CompileException] {
      exec.execute(
        """MERGE INTO t USING s ON id = sid
          |WHEN MATCHED THEN UPDATE SET v = sv""".stripMargin)
    }
    assert(e.getMessage.contains("multiple source rows"))
  }

  test("MERGE: first applicable clause consumes the row across ALL columns") {
    // SQL:2003 — exactly one clause acts per row. A later clause's SET on a
    // DIFFERENT column must not also apply to a row the first clause took.
    val exec = new Executor(spark, Map(
      "t" -> Seq((1, 10, "a"), (2, 200, "b")).toDF("id", "v", "name"),
      "s" -> Seq((1, 1), (2, 2)).toDF("sid", "sv")))
    exec.execute(
      """MERGE INTO t USING s ON id = sid
        |WHEN MATCHED AND v < 100 THEN UPDATE SET v = sv
        |WHEN MATCHED THEN UPDATE SET name = 'x'""".stripMargin)
    // row 1: clause 1 applies -> v updated, name untouched
    // row 2: clause 1 fails -> clause 2 -> name updated, v untouched
    assert(exec.query("select id, v, name from t order by id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, 1, "a"), (2, 200, "x")))
  }

  test("MERGE: multi-match only errors when a matched clause actually acts") {
    val exec = new Executor(spark, Map(
      "t" -> Seq((1, 10)).toDF("id", "v"),
      "s" -> Seq((1, 1), (1, 2), (3, 30)).toDF("sid", "sv")))
    // insert-only MERGE against a duplicate-matching source is legal (PG)
    exec.execute(
      """MERGE INTO t USING s ON id = sid
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (sid, sv)""".stripMargin)
    assert(exec.query("select id, v from t order by id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 10), (3, 30)))
    // duplicate matches excluded by every clause condition: also legal
    exec.execute(
      """MERGE INTO t USING s ON id = sid
        |WHEN MATCHED AND sv > 100 THEN DELETE""".stripMargin)
    assert(exec.query("select count(*) from t").collect()(0).getLong(0) == 2)
    // exactly ONE of several matching source rows triggers the clause:
    // legal (PG) — the acted copy wins, no duplicate survivors
    exec.execute(
      """MERGE INTO t USING s ON id = sid
        |WHEN MATCHED AND sv = 2 THEN UPDATE SET v = 99""".stripMargin)
    assert(exec.query("select id, v from t order by id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 99), (3, 30)))
    // but when a matched clause does act via >1 source row: error
    val e = intercept[graft.compiler.CompileException] {
      exec.execute(
        """MERGE INTO t USING s ON id = sid
          |WHEN MATCHED THEN UPDATE SET v = sv""".stripMargin)
    }
    assert(e.getMessage.contains("multiple source rows"))
  }

  test("MERGE property: 40 random clause programs match a reference fold") {
    val rnd = new scala.util.Random(20260814L)
    for (caseNo <- 1 to 40) {
      // target may carry duplicate ids (bag semantics); source ids are
      // unique (multi-match is a tested ERROR, not a property case).
      // TWO value columns so cross-column clause bleed-over (a later
      // clause's SET on another column leaking onto an already-consumed
      // row) is caught, not just same-column shadowing.
      val tgt = (0 until 6).map(_ => (rnd.nextInt(8), rnd.nextInt(50), rnd.nextInt(50)))
      val src = rnd.shuffle((0 until 12).toList).take(5)
        .map(id => (id, rnd.nextInt(50)))
      val srcMap = src.toMap
      // matched-clause generator: (sqlCond, predicate(v, w, sv))
      def mCond(): (String, (Int, Int, Int) => Boolean) = rnd.nextInt(4) match {
        case 0 => ("", (_, _, _) => true)
        case 1 => val c = rnd.nextInt(50); (s" AND sv > $c", (_, _, sv) => sv > c)
        case 2 => val c = rnd.nextInt(50); (s" AND v < $c", (v, _, _) => v < c)
        case _ => val c = rnd.nextInt(50); (s" AND w < $c", (_, w, _) => w < c)
      }
      val mClauses = (0 until 1 + rnd.nextInt(2)).map { _ =>
        val (cs, cp) = mCond()
        rnd.nextInt(5) match {
          case 0 => (s"WHEN MATCHED$cs THEN UPDATE SET v = sv",
            cp, Some((v: Int, w: Int, sv: Int) => (sv, w)))
          case 1 => (s"WHEN MATCHED$cs THEN UPDATE SET v = v + sv",
            cp, Some((v: Int, w: Int, sv: Int) => (v + sv, w)))
          case 2 => (s"WHEN MATCHED$cs THEN UPDATE SET w = sv",
            cp, Some((v: Int, w: Int, sv: Int) => (v, sv)))
          case 3 => (s"WHEN MATCHED$cs THEN UPDATE SET v = sv, w = w + 1",
            cp, Some((v: Int, w: Int, sv: Int) => (sv, w + 1)))
          case _ => (s"WHEN MATCHED$cs THEN DELETE", cp, None)
        }
      }
      val (insCondSql, insCondP) =
        if (rnd.nextBoolean()) ("", (_: Int) => true)
        else { val c = rnd.nextInt(50); (s" AND sv >= $c", (sv: Int) => sv >= c) }
      val withInsert = rnd.nextInt(4) > 0
      val insClause = if (withInsert)
        Seq(s"WHEN NOT MATCHED$insCondSql THEN INSERT (id, v, w) VALUES (sid, sv, 0)")
      else Nil
      val sql = "MERGE INTO t USING s ON id = sid\n" +
        (mClauses.map(_._1) ++ insClause).mkString("\n")
      // reference fold, first-applicable-clause-wins, one clause per row
      val expectKept = tgt.flatMap { case (id, v, w) =>
        srcMap.get(id) match {
          case None => Some((id, v, w))
          case Some(sv) =>
            mClauses.find { case (_, p, _) => p(v, w, sv) } match {
              case Some((_, _, Some(f))) =>
                val (nv, nw) = f(v, w, sv); Some((id, nv, nw))
              case Some((_, _, None)) => None // delete
              case None => Some((id, v, w))
            }
        }
      }
      val tgtIds = tgt.map(_._1).toSet
      val expectIns =
        if (withInsert)
          src.filter { case (id, sv) => !tgtIds.contains(id) && insCondP(sv) }
            .map { case (id, sv) => (id, sv, 0) }
        else Nil
      val expected = (expectKept ++ expectIns).sorted
      val exec = new Executor(spark, Map(
        "t" -> tgt.toDF("id", "v", "w"), "s" -> src.toDF("sid", "sv")))
      exec.execute(sql)
      val got = exec.query("select id, v, w from t").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq.sorted
      assert(got == expected,
        s"case $caseNo:\n$sql\ntarget=$tgt\nsource=$src\ngot     =$got\nexpected=$expected")
    }
  }

  test("EXPLAIN statement returns the physical plan as rows") {
    val exec = new Executor(spark, Map("t" -> Seq(1, 2, 3).toDF("x")))
    val rows = exec.execute("explain select x, x + 1 from t where x > 1")
      .get.collect().map(_.getString(0))
    assert(rows.exists(_.contains("Physical Plan")))
    // local fixture folds to a LocalTableScan; just check node lines exist
    assert(rows.exists(_.matches("\\(\\d+\\) .*")))
  }

  test("CTAS persist 'bucket': engine-declared co-location joins shuffle-free") {
    val exec = new Executor(spark, Map(
      "src_a" -> Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "va"),
      "src_b" -> Seq((1, 10), (2, 20), (4, 40)).toDF("k", "vb")))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      exec.execute(
        "CREATE TABLE ba WITH (persist 'bucket', bucket_by 'k', buckets '4') " +
          "AS select k, va from src_a")
      exec.execute(
        "CREATE TABLE bb WITH (persist 'bucket', bucket_by 'k', buckets '4') " +
          "AS select k, vb from src_b")
      val joined = exec.query("select ba.k, va, vb from ba join bb on ba.k = bb.k")
      assert(joined.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
        .toSet == Set((1, "x", 10), (2, "y", 20)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"expected shuffle-free bucketed join through the engine, got:\n$plan")
      // loud errors: missing bucket_by, absent column
      val e = intercept[graft.compiler.CompileException] {
        exec.execute("CREATE TABLE bad WITH (persist 'bucket') AS select 1 as x")
      }
      assert(e.getMessage.contains("bucket_by"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_ba")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_bb")
    }
  }

  test("COPY TO partition_by: hive layout out, partition pruning back in") {
    val exec = new Executor(spark, Map("t" ->
      Seq((1, "a", 10), (2, "b", 20), (3, "a", 30)).toDF("id", "grp", "v")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    exec.setBasepath(tmp)
    exec.execute("COPY t TO 'out' WITH (format 'parquet', partition_by 'grp')")
    // hive-style directories on disk
    val dirs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("grp=a", "grp=b"), s"unexpected layout: $dirs")
    // a reader filtering the partition column prunes at plan time
    val back = spark.read.parquet(s"$tmp/out").filter(col("grp") === "a")
    assert(back.select("id").collect().map(_.getInt(0)).toSet == Set(1, 3))
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("grp"),
      s"partition filter not pushed:\n$scan")
    // loud errors: unknown column, single-file formats
    val e1 = intercept[graft.compiler.CompileException] {
      exec.execute("COPY t TO 'o2' WITH (format 'parquet', partition_by 'nope')")
    }
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[graft.compiler.CompileException] {
      exec.execute("COPY t TO 'o3' WITH (format 'csv', partition_by 'grp')")
    }
    assert(e2.getMessage.contains("directory format"))
  }

  test("CREATE [OR REPLACE] VIEW / DROP VIEW: lazy scope views") {
    val exec = new Executor(spark, Map("t" -> Seq(1, 2, 3).toDF("x")))
    exec.execute("CREATE VIEW v AS select x * 2 as y from t where x > 1")
    assert(exec.query("select sum(y) as s from v")
      .collect().head.getLong(0) == 10)
    exec.execute("CREATE OR REPLACE VIEW v AS select x as y from t")
    assert(exec.query("select sum(y) as s from v")
      .collect().head.getLong(0) == 6)
    exec.execute("DROP VIEW v")
    val e = intercept[graft.compiler.CompileException] {
      exec.query("select * from v")
    }
    assert(e.getMessage.contains("not found"))
  }

  test("EXPLAIN ANALYZE executes and reports runtime metrics") {
    val exec = new Executor(spark, Map("t" -> Seq(1, 2, 3).toDF("x")))
    val rows = exec.execute(
      "explain analyze select x % 2 as k, count(1) as n from t group by x % 2")
      .get.collect().map(_.getString(0))
    assert(rows.exists(_.contains("Physical Plan")))
    assert(rows.exists(_.startsWith("Execution time:")))
    assert(rows.exists(_.contains("Runtime metrics:")))
    // the aggregate actually ran: its output-rows metric is populated
    assert(rows.exists(r => r.contains("numOutputRows=")),
      s"no populated metrics in:\n${rows.mkString("\n")}")
  }

  test("table UDF registration (reference add_table_function)") {
    val exec = new Executor(spark)
    exec.addTableFunction("two_rows", _ => Seq(1, 2).toDF("v"))
    assert(exec.query("select * from two_rows()")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("lateral UDF registration (reference add_lateral_function)") {
    val exec = new Executor(spark, Map("t" -> Seq(2, 3).toDF("n")))
    exec.addLateralFunction("repeat_n", (left, args) =>
      left.select(col("*"), explode(sequence(lit(1), args.head)).as("i")))
    assert(exec.query("select n, i from t, lateral repeat_n(n)")
      .collect().length == 5)
  }

  test("create table as is visible to later statements") {
    val exec = new Executor(spark, Map("t" -> Seq(1, 2, 3).toDF("x")))
    exec.execute("create table big as select x from t where x > 1")
    assert(exec.query("select count(*) as n from big").collect()(0).getLong(0) == 2L)
  }

  test("ambiguous column reference errors (reference raises)") {
    val exec = new Executor(spark, Map(
      "a" -> Seq((1, 2)).toDF("x", "y"),
      "b" -> Seq((1, 3)).toDF("x", "z")))
    val e = intercept[Exception] {
      exec.query("select x from a join b on a.x = b.x").collect()
    }
    assert(e.getMessage.toLowerCase.contains("ambiguous"))
  }
}
