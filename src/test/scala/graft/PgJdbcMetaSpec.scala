package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.exec.Executor
import graft.server.PgWireServer
import graft.sources.Tables

/** pgjdbc DatabaseMetaData coverage (VERDICT r9 #7).
  *
  * No PostgreSQL JDBC driver jar exists in this zero-egress sandbox, so
  * a literal `DatabaseMetaData` object can't be constructed; the
  * closest honest equivalent is executing the driver's metadata SQL
  * VERBATIM — the exact query strings pgjdbc's public
  * `org.postgresql.jdbc.PgDatabaseMetaData` builds for getTables /
  * getColumns / getPrimaryKeys — through the engine, plus one wire-level
  * round trip via the real psql binary. These probe exactly the
  * pg_class/pg_attribute/pg_type/pg_attrdef/pg_description/pg_index
  * join paths a JDBC client exercises, including the constructs the
  * engine had to grow for them: comma-join mixed with LEFT JOIN chains,
  * CASE-on-boolean selectors, `::regclass`, `~`/`!~`, typbasetype,
  * `information_schema._pg_expandarray` and `(expr).field` composite
  * access.
  */
class PgJdbcMetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private lazy val exec = new Executor(spark, Map(
    "nation" -> Tables.load(spark, dir, "nation"),
    "region" -> Tables.load(spark, dir, "region")))

  /** pgjdbc PgDatabaseMetaData#getTables(null, "public", "%",
    * ["TABLE"]) — the TABLE-type branch of its generated SQL. */
  private val getTablesSql =
    """SELECT NULL AS TABLE_CAT, n.nspname AS TABLE_SCHEM, c.relname AS TABLE_NAME,  CASE n.nspname ~ '^pg_' OR n.nspname = 'information_schema'  WHEN true THEN CASE  WHEN n.nspname = 'pg_catalog' OR n.nspname = 'information_schema' THEN CASE c.relkind   WHEN 'r' THEN 'SYSTEM TABLE'   WHEN 'v' THEN 'SYSTEM VIEW'   WHEN 'i' THEN 'SYSTEM INDEX'   ELSE NULL   END  WHEN n.nspname = 'pg_toast' THEN CASE c.relkind   WHEN 'r' THEN 'SYSTEM TOAST TABLE'   WHEN 'i' THEN 'SYSTEM TOAST INDEX'   ELSE NULL   END  ELSE CASE c.relkind   WHEN 'r' THEN 'TEMPORARY TABLE'   WHEN 'p' THEN 'TEMPORARY TABLE'   WHEN 'i' THEN 'TEMPORARY INDEX'   WHEN 'S' THEN 'TEMPORARY SEQUENCE'   WHEN 'v' THEN 'TEMPORARY VIEW'   ELSE NULL   END  END  WHEN false THEN CASE c.relkind  WHEN 'r' THEN 'TABLE'  WHEN 'p' THEN 'PARTITIONED TABLE'  WHEN 'i' THEN 'INDEX'  WHEN 'P' then 'PARTITIONED INDEX'  WHEN 'S' THEN 'SEQUENCE'  WHEN 'v' THEN 'VIEW'  WHEN 'c' THEN 'TYPE'  WHEN 'f' THEN 'FOREIGN TABLE'  WHEN 'm' THEN 'MATERIALIZED VIEW'  ELSE NULL  END  ELSE NULL  END  AS TABLE_TYPE, d.description AS REMARKS,  '' as TYPE_CAT, '' as TYPE_SCHEM, '' as TYPE_NAME, '' AS SELF_REFERENCING_COL_NAME, '' AS REF_GENERATION  FROM pg_catalog.pg_namespace n, pg_catalog.pg_class c  LEFT JOIN pg_catalog.pg_description d ON (c.oid = d.objoid AND d.objsubid = 0  and d.classoid = 'pg_class'::regclass)  WHERE c.relnamespace = n.oid  AND (false  OR  ( c.relkind = 'r' AND n.nspname !~ '^pg_' AND n.nspname <> 'information_schema' ) )  ORDER BY TABLE_TYPE,TABLE_SCHEM,TABLE_NAME """

  /** pgjdbc PgDatabaseMetaData#getColumns(null, "public", "nation",
    * "%") — the ≥PG12 form (attidentity + attgenerated). */
  private val getColumnsSql =
    """SELECT n.nspname,c.relname,a.attname,a.atttypid,a.attnotnull OR (t.typtype = 'd' AND t.typnotnull) AS attnotnull,a.atttypmod,a.attlen,t.typtypmod,row_number() OVER (PARTITION BY a.attrelid ORDER BY a.attnum) AS attnum, nullif(a.attidentity, '') as attidentity,nullif(a.attgenerated, '') as attgenerated,pg_catalog.pg_get_expr(def.adbin, def.adrelid) AS adsrc,dsc.description,t.typbasetype,t.typtype FROM pg_catalog.pg_namespace n JOIN pg_catalog.pg_class c ON (c.relnamespace = n.oid) JOIN pg_catalog.pg_attribute a ON (a.attrelid=c.oid) LEFT JOIN pg_catalog.pg_type t ON (a.atttypid = t.oid) LEFT JOIN pg_catalog.pg_attrdef def ON (a.attrelid=def.adrelid AND a.attnum = def.adnum) LEFT JOIN pg_catalog.pg_description dsc ON (c.oid=dsc.objoid AND a.attnum = dsc.objsubid) LEFT JOIN pg_catalog.pg_class dc ON (dc.oid=dsc.classoid AND dc.relname='pg_description') LEFT JOIN pg_catalog.pg_namespace dn ON (dc.relnamespace=dn.oid AND dn.nspname='pg_catalog') WHERE c.relkind in ('r','p','v','f','m') and a.attnum > 0 AND NOT a.attisdropped  AND n.nspname LIKE 'public' AND c.relname LIKE 'nation' ORDER BY nspname,c.relname,attnum """

  /** pgjdbc PgDatabaseMetaData#getPrimaryKeys(null, "public",
    * "nation"). */
  private val getPrimaryKeysSql =
    """SELECT result.TABLE_CAT, result.TABLE_SCHEM, result.TABLE_NAME, result.COLUMN_NAME, result.KEY_SEQ, result.PK_NAME FROM (SELECT NULL AS TABLE_CAT, n.nspname AS TABLE_SCHEM, ct.relname AS TABLE_NAME, a.attname AS COLUMN_NAME, (information_schema._pg_expandarray(i.indkey)).n AS KEY_SEQ, ci.relname AS PK_NAME, information_schema._pg_expandarray(i.indkey) AS KEYS, a.attnum AS A_ATTNUM FROM pg_catalog.pg_class ct JOIN pg_catalog.pg_attribute a ON (ct.oid = a.attrelid) JOIN pg_catalog.pg_namespace n ON (ct.relnamespace = n.oid) JOIN pg_catalog.pg_index i ON ( a.attrelid = i.indrelid) JOIN pg_catalog.pg_class ci ON (ci.oid = i.indexrelid) WHERE true  AND n.nspname = 'public' AND ct.relname = 'nation' AND i.indisprimary ) result where result.A_ATTNUM = (result.KEYS).x  ORDER BY result.table_name, result.pk_name, result.key_seq"""

  test("getTables lists exactly the scope tables as TABLE") {
    val rows = exec.query(getTablesSql).collect()
    val names = rows.map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(names.toSet == Set(("public", "nation", "TABLE"),
      ("public", "region", "TABLE")), names.mkString(", "))
    // 10-column JDBC result contract
    assert(rows.head.length == 10)
  }

  test("getColumns returns every column with type OIDs and 1-based attnum") {
    val rows = exec.query(getColumnsSql).collect()
    val cols = rows.map(r => (r.getString(2),
      r.getAs[Number](3).longValue(), r.getAs[Number](8).longValue()))
    assert(cols.toSeq == Seq(
      ("n_nationkey", 23L, 1L), // int4
      ("n_name", 25L, 2L),      // text
      ("n_regionkey", 23L, 3L)), cols.mkString(", "))
    // typbasetype joined from pg_type (0 = not a domain), typtype 'b'
    rows.foreach { r =>
      assert(r.getAs[Number](13).longValue() == 0L && r.getString(14) == "b")
    }
  }

  test("getPrimaryKeys executes the _pg_expandarray path; no PKs declared") {
    // the engine has no constraint objects, so the correct JDBC answer
    // is an empty result set — what matters is the query EXECUTING
    // through pg_index + _pg_expandarray + (expr).field composite access
    assert(exec.query(getPrimaryKeysSql).collect().isEmpty)
  }

  test("a declared primary key surfaces through the verbatim getPrimaryKeys") {
    // ALTER TABLE ... ADD PRIMARY KEY is metadata-only: it feeds the
    // pg_index/pg_constraint synthesis that JDBC metadata reads
    exec.execute("ALTER TABLE nation ADD PRIMARY KEY (n_nationkey)")
    val rows = exec.query(getPrimaryKeysSql).collect()
    assert(rows.length == 1, rows.mkString(", "))
    val r = rows.head
    assert((r.getString(1), r.getString(2), r.getString(3),
      r.getAs[Number](4).intValue(), r.getString(5)) ==
      ("public", "nation", "n_nationkey", 1, "nation_pkey"))
    // pg_constraint carries the same key as contype 'p'
    val con = exec.query(
      "SELECT conname, contype FROM pg_constraint WHERE contype = 'p'")
      .collect()
    assert(con.map(r2 => (r2.getString(0), r2.getString(1))).toSeq ==
      Seq(("nation_pkey", "p")))
    // a multi-column declaration is rejected loudly, not misreported
    val e = intercept[Exception] {
      exec.execute("ALTER TABLE region ADD PRIMARY KEY (r_regionkey, r_name)")
    }
    assert(String.valueOf(e.getMessage).contains("multi-column"))
    // rebinding the table drops the stale key
    exec.execute("CREATE TABLE nation AS SELECT * FROM nation")
    assert(exec.query(getPrimaryKeysSql).collect().isEmpty,
      "rebind must invalidate the declared key")
  }

  /** pgjdbc PgDatabaseMetaData#getImportedKeys(null, "public",
    * "nation") — comma-join of 9 catalogs including a column-aliased
    * generate_series table function and column-indexed subscripts. */
  private val getImportedKeysSql =
    """SELECT NULL::text AS PKTABLE_CAT, pkn.nspname AS PKTABLE_SCHEM, pkc.relname AS PKTABLE_NAME, pka.attname AS PKCOLUMN_NAME, NULL::text AS FKTABLE_CAT, fkn.nspname AS FKTABLE_SCHEM, fkc.relname AS FKTABLE_NAME, fka.attname AS FKCOLUMN_NAME, pos.n AS KEY_SEQ, CASE con.confupdtype  WHEN 'c' THEN 0 WHEN 'n' THEN 2 WHEN 'd' THEN 4 WHEN 'r' THEN 1 WHEN 'p' THEN 1 WHEN 'a' THEN 3 ELSE NULL END AS UPDATE_RULE, CASE con.confdeltype  WHEN 'c' THEN 0 WHEN 'n' THEN 2 WHEN 'd' THEN 4 WHEN 'r' THEN 1 WHEN 'p' THEN 1 WHEN 'a' THEN 3 ELSE NULL END AS DELETE_RULE, con.conname AS FK_NAME, pkic.relname AS PK_NAME, CASE  WHEN con.condeferrable AND con.condeferred THEN 5 WHEN con.condeferrable THEN 6 ELSE 7 END AS DEFERRABILITY FROM pg_catalog.pg_namespace pkn, pg_catalog.pg_class pkc, pg_catalog.pg_attribute pka, pg_catalog.pg_namespace fkn, pg_catalog.pg_class fkc, pg_catalog.pg_attribute fka, pg_catalog.pg_constraint con, pg_catalog.generate_series(1, 32) pos(n), pg_catalog.pg_class pkic WHERE pkn.oid = pkc.relnamespace AND pkc.oid = pka.attrelid AND pka.attnum = con.confkey[pos.n] AND con.confrelid = pkc.oid AND fkn.oid = fkc.relnamespace AND fkc.oid = fka.attrelid AND fka.attnum = con.conkey[pos.n] AND con.conrelid = fkc.oid AND con.contype = 'f' AND pkic.relkind = 'i' AND pkic.oid = con.conindid AND fkn.nspname = 'public' AND fkc.relname = 'nation' ORDER BY pkn.nspname,pkc.relname,con.conname,pos.n"""

  test("a declared foreign key surfaces through the verbatim getImportedKeys") {
    // FK requires the referenced column to carry a declared PK (the
    // metadata analog of PG's unique-index requirement)
    val e0 = intercept[Exception] {
      exec.execute(
        "ALTER TABLE nation ADD FOREIGN KEY (n_regionkey) REFERENCES region (r_regionkey)")
    }
    assert(String.valueOf(e0.getMessage).contains("PRIMARY KEY"), e0.getMessage)
    exec.execute("ALTER TABLE region ADD PRIMARY KEY (r_regionkey)")
    exec.execute(
      "ALTER TABLE nation ADD FOREIGN KEY (n_regionkey) REFERENCES region (r_regionkey)")
    val rows = exec.query(getImportedKeysSql).collect()
    assert(rows.length == 1, rows.mkString(", "))
    val r = rows.head
    assert((r.getString(1), r.getString(2), r.getString(3),
      r.getString(5), r.getString(6), r.getString(7),
      r.getAs[Number](8).intValue(), r.getString(11), r.getString(12)) ==
      ("public", "region", "r_regionkey",
        "public", "nation", "n_regionkey",
        1, "nation_n_regionkey_fkey", "region_pkey"), r.toString)
    // UPDATE/DELETE rules are NO ACTION (3) for metadata-only keys
    assert(r.getAs[Number](9).intValue() == 3 &&
      r.getAs[Number](10).intValue() == 3)
    // rebinding the REFERENCED table drops the dependent FK as stale
    exec.execute("CREATE TABLE region AS SELECT * FROM region")
    assert(exec.query(getImportedKeysSql).collect().isEmpty,
      "rebinding the referenced table must invalidate the FK")
  }

  test("_pg_expandarray expands a 1-element key and fails loudly on wider") {
    val one = exec.query(
      "SELECT (information_schema._pg_expandarray(array[7])).x AS x, " +
        "(information_schema._pg_expandarray(array[7])).n AS n").collect()
    assert(one.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((7L, 1)))
    val e = intercept[Exception] {
      exec.query("SELECT (information_schema._pg_expandarray(array[1, 2])).n AS n")
        .collect()
    }
    assert(String.valueOf(e.getMessage).contains("multi-column"),
      s"expected loud multi-column failure, got: ${e.getMessage}")
  }

  test("information_schema constraint views reflect declared keys") {
    // relies on the prior tests' declarations: region PK + nation FK
    // were declared, then nation PK was dropped by rebinding and region
    // was rebound too — re-declare a clean pair here
    exec.execute("ALTER TABLE region ADD PRIMARY KEY (r_regionkey)")
    exec.execute(
      "ALTER TABLE nation ADD FOREIGN KEY (n_regionkey) REFERENCES region (r_regionkey)")
    val tc = exec.query(
      "SELECT constraint_name, table_name, constraint_type " +
        "FROM information_schema.table_constraints ORDER BY constraint_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tc.contains(("region_pkey", "region", "PRIMARY KEY")), tc.toSeq)
    assert(tc.contains(("nation_n_regionkey_fkey", "nation", "FOREIGN KEY")),
      tc.toSeq)
    val kcu = exec.query(
      "SELECT constraint_name, column_name, ordinal_position " +
        "FROM information_schema.key_column_usage ORDER BY constraint_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(kcu.contains(("region_pkey", "r_regionkey", 1)), kcu.toSeq)
    assert(kcu.contains(("nation_n_regionkey_fkey", "n_regionkey", 1)), kcu.toSeq)
    val rc = exec.query(
      "SELECT constraint_name, unique_constraint_name, delete_rule " +
        "FROM information_schema.referential_constraints").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rc.toSeq == Seq(("nation_n_regionkey_fkey", "region_pkey",
      "NO ACTION")), rc.toSeq)
  }

  // ---- wire-level round trip: the same metadata SQL over PgWire via psql
  private def havePsql = new java.io.File("/usr/bin/psql").canExecute

  test("psql \\d renders the Indexes section for a declared primary key") {
    assume(havePsql)
    val server = new PgWireServer(spark,
      Map("nation" -> Tables.load(spark, dir, "nation")))
    try {
      import scala.sys.process._
      val buf = new StringBuilder
      val logger = ProcessLogger(l => buf.append(l).append('\n'),
        l => buf.append(l).append('\n'))
      val rc = Process(Seq("/usr/bin/psql", "-h", "127.0.0.1",
        "-p", server.boundPort.toString, "-U", "graft", "-d", "g", "-X",
        "-c", "ALTER TABLE nation ADD PRIMARY KEY (n_nationkey)",
        "-c", "\\d nation")).!(logger)
      val out = buf.toString
      assert(rc == 0 && !out.contains("ERROR"), out)
      // psql renders the pg_index/pg_get_indexdef join as an Indexes:
      // footer naming the PK index
      assert(out.contains("nation_pkey"), out)
    } finally server.close()
  }

  test("getTables round-trips over the wire protocol") {
    assume(havePsql)
    val server = new PgWireServer(spark,
      Map("nation" -> Tables.load(spark, dir, "nation")))
    try {
      import scala.sys.process._
      val buf = new StringBuilder
      val logger = ProcessLogger(l => buf.append(l).append('\n'),
        l => buf.append(l).append('\n'))
      val rc = Process(Seq("/usr/bin/psql", "-h", "127.0.0.1",
        "-p", server.boundPort.toString, "-U", "graft", "-d", "g", "-X",
        "-c", getTablesSql)).!(logger)
      val out = buf.toString
      assert(rc == 0 && !out.contains("ERROR"), out)
      assert(out.contains("nation") && out.contains("TABLE"), out)
    } finally server.close()
  }
}
