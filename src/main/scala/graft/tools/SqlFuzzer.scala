package graft.tools

import java.util.Random

/** Seeded random-SELECT generator for cross-engine differential testing
  * (the grammar-driven upgrade over PropertySpec's expression-level
  * fuzzing). Every emitted query is written in the three-way dialect
  * intersection graft ∩ Spark SQL ∩ DuckDB, so one corpus drives both
  * the in-process differential (graft front-end vs Spark's own SQL
  * front-end, FuzzSpec) and the external one (DuckDB via
  * tools/check_fuzz.py over the same parquet tables).
  *
  * Determinism contract: query i is a pure function of (seed, i) —
  * java.util.Random's LCG is spec-fixed — and the corpus for the
  * release seed is committed as a regression file; FuzzSpec fails if
  * the generator drifts.
  *
  * Deliberately excluded (documented divergences or nondeterminism,
  * not bugs to surface):
  *   - `^`/`#` (power/xor in the graft dialect, different in Spark),
  *     `!>`/`!<`, `concat()` (PG NULL-coalescing here), ILIKE/SIMILAR
  *   - `/` on integers (PG truncates, DuckDB yields double)
  *   - avg()/sum() over raw doubles (merge-order ulps differ across
  *     engines; sums go through DECIMAL(18,2) casts, scalar subqueries
  *     use min/max, which are exact)
  *   - min/max over strings (collation), timestamp columns (render
  *     formats), ORDER BY without a unique key under LIMIT
  */
object SqlFuzzer {

  /** One fuzzable table: primary key, integer / double / string columns. */
  final case class Tbl(name: String, alias: String, key: String,
      intCols: Seq[String], dblCols: Seq[String], strCols: Seq[String]) {
    def allCols: Seq[String] = intCols ++ dblCols ++ strCols
  }

  val region = Tbl("region", "r", "r_regionkey",
    Seq("r_regionkey"), Nil, Seq("r_name"))
  val nation = Tbl("nation", "n", "n_nationkey",
    Seq("n_nationkey", "n_regionkey"), Nil, Seq("n_name"))
  val customer = Tbl("customer", "c", "c_custkey",
    Seq("c_custkey", "c_nationkey"), Seq("c_acctbal"),
    Seq("c_name", "c_mktsegment"))
  val supplier = Tbl("supplier", "s", "s_suppkey",
    Seq("s_suppkey", "s_nationkey"), Seq("s_acctbal"), Seq("s_name"))
  val orders = Tbl("orders", "o", "o_orderkey",
    Seq("o_orderkey", "o_custkey"), Seq("o_totalprice"),
    Seq("o_orderstatus", "o_orderpriority"))
  val part = Tbl("part", "p", "p_partkey",
    Seq("p_partkey", "p_size"), Seq("p_retailprice"),
    Seq("p_name", "p_brand", "p_type"))

  val tables: Seq[Tbl] = Seq(region, nation, customer, supplier, orders, part)

  /** (left, right, join condition) — the star-schema join graph. */
  val joins: Seq[(Tbl, Tbl, String)] = Seq(
    (nation, region, "n_regionkey = r_regionkey"),
    (customer, nation, "c_nationkey = n_nationkey"),
    (supplier, nation, "s_nationkey = n_nationkey"),
    (orders, customer, "o_custkey = c_custkey"))

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))

  // ------------------------------------------------------------ predicates

  private def intPred(r: Random, c: String): String = r.nextInt(4) match {
    case 0 => s"$c ${pick(r, Seq("<", ">", "<=", ">=", "=", "<>"))} ${r.nextInt(2000)}"
    case 1 => { val lo = r.nextInt(1500); s"$c BETWEEN $lo AND ${lo + 1 + r.nextInt(400)}" }
    case 2 => s"$c IN (${Seq.fill(2 + r.nextInt(4))(r.nextInt(200)).distinct.mkString(", ")})"
    case _ => s"$c + ${1 + r.nextInt(9)} < ${r.nextInt(2000)}"
  }

  private def dblPred(r: Random, c: String): String =
    s"$c ${pick(r, Seq("<", ">", "<=", ">="))} ${r.nextInt(9000)}.${r.nextInt(100)}"

  private def strPred(r: Random, c: String): String = r.nextInt(3) match {
    case 0 => s"$c LIKE '${('a' + r.nextInt(26)).toChar}%'"
    case 1 => s"$c NOT LIKE '%${('a' + r.nextInt(26)).toChar}%'"
    case _ => s"length($c) ${pick(r, Seq(">", "<", ">=", "<="))} ${4 + r.nextInt(16)}"
  }

  private def basePred(r: Random, t: Tbl, q: String): String = {
    def qual(c: String) = if (q.isEmpty) c else s"$q.$c"
    val choices =
      t.intCols.map(c => () => intPred(r, qual(c))) ++
        t.dblCols.map(c => () => dblPred(r, qual(c))) ++
        t.strCols.map(c => () => strPred(r, qual(c)))
    pick(r, choices)()
  }

  /** Boolean combination, depth ≤ 2. */
  private def pred(r: Random, t: Tbl, q: String = "", depth: Int = 2): String =
    if (depth <= 0 || r.nextInt(3) == 0) basePred(r, t, q)
    else r.nextInt(3) match {
      case 0 => s"(${pred(r, t, q, depth - 1)} AND ${pred(r, t, q, depth - 1)})"
      case 1 => s"(${pred(r, t, q, depth - 1)} OR ${pred(r, t, q, depth - 1)})"
      case _ => s"NOT (${pred(r, t, q, depth - 1)})"
    }

  // ------------------------------------------------------------ select items

  /** One projected expression; computed items get an `AS fzK` alias so
    * both engines report the same output schema. */
  private def selectItem(r: Random, t: Tbl, k: Int, q: String = ""): String = {
    def qual(c: String) = if (q.isEmpty) c else s"$q.$c"
    r.nextInt(6) match {
      case 0 | 1 => qual(pick(r, t.allCols))
      case 2 =>
        val c = qual(pick(r, t.intCols))
        s"$c ${pick(r, Seq("+", "-", "*"))} ${1 + r.nextInt(9)} AS fz$k"
      case 3 =>
        val c = qual(pick(r, t.strCols))
        pick(r, Seq(s"upper($c) AS fz$k", s"lower($c) AS fz$k",
          s"substring($c, 1, ${1 + r.nextInt(5)}) AS fz$k",
          s"$c || '_x' AS fz$k", s"length($c) AS fz$k"))
      case 4 =>
        s"CASE WHEN ${basePred(r, t, q)} THEN ${qual(pick(r, t.intCols))} ELSE ${-r.nextInt(10)} END AS fz$k"
      case _ =>
        val c = qual(pick(r, t.intCols))
        s"abs($c - ${r.nextInt(100)}) AS fz$k"
    }
  }

  /** Output names must be unique (parquet/result-compare contract): a
    * plain column drawn twice gets an `AS fzK` alias the second time. */
  private def dedupe(items: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set[String]()
    items.zipWithIndex.map { case (it, k) =>
      val name =
        if (it.contains(" AS ")) it.substring(it.lastIndexOf(" AS ") + 4)
        else it.substring(it.lastIndexOf('.') + 1)
      if (seen.add(name)) it
      else if (it.contains(" AS ")) it.substring(0, it.lastIndexOf(" AS ")) + s" AS fzd$k"
      else s"$it AS fzd$k"
    }
  }

  private def selectList(r: Random, t: Tbl, q: String = ""): String =
    dedupe((0 until (1 + r.nextInt(4))).map(k => selectItem(r, t, k, q)))
      .mkString(", ")

  // ------------------------------------------------------------ query shapes

  private def singleTable(r: Random): String = {
    val t = pick(r, tables)
    val distinct = if (r.nextInt(5) == 0) "DISTINCT " else ""
    val base = s"SELECT $distinct${selectList(r, t)} FROM ${t.name} WHERE ${pred(r, t)}"
    // ORDER BY a non-projected key is illegal under DISTINCT (and the
    // unique key is what makes LIMIT deterministic) — plain selects only
    if (distinct.isEmpty && r.nextInt(3) == 0)
      s"$base ORDER BY ${t.key}${if (r.nextBoolean()) " DESC" else ""} LIMIT ${5 + r.nextInt(40)}"
    else base
  }

  private def joined(r: Random): String = {
    val (a, b, on) = pick(r, joins)
    val how = pick(r, Seq("JOIN", "INNER JOIN", "LEFT JOIN"))
    val items = dedupe((0 until (1 + r.nextInt(3))).map(k =>
      selectItem(r, if (r.nextBoolean()) a else b, k, ""))).mkString(", ")
    val w = s" WHERE ${pred(r, if (how == "LEFT JOIN") a else pick(r, Seq(a, b)), "", 1)}"
    s"SELECT $items FROM ${a.name} $how ${b.name} ON $on" +
      (if (r.nextInt(3) > 0) w else "")
  }

  private def aggregated(r: Random): String = {
    val withJoin = r.nextInt(3) == 0
    val (fromSql, t, g) =
      if (withJoin) {
        val (a, b, on) = pick(r, joins)
        (s"${a.name} JOIN ${b.name} ON $on", a,
          pick(r, b.strCols ++ b.intCols))
      } else {
        val t = pick(r, tables)
        (t.name, t, pick(r, t.strCols ++ t.intCols))
      }
    val aggs = Seq.newBuilder[String]
    aggs += "count(*) AS fz_cnt"
    if (r.nextBoolean()) aggs += s"min(${pick(r, t.intCols)}) AS fz_min"
    if (r.nextBoolean()) aggs += s"max(${pick(r, t.intCols)}) AS fz_max"
    if (r.nextBoolean()) aggs += s"sum(${pick(r, t.intCols)}) AS fz_sum"
    if (t.dblCols.nonEmpty && r.nextBoolean())
      aggs += s"sum(CAST(${pick(r, t.dblCols)} AS DECIMAL(18,2))) AS fz_dsum"
    val having = if (r.nextInt(3) == 0) s" HAVING count(*) > ${r.nextInt(5)}" else ""
    val where = if (r.nextInt(2) == 0) s" WHERE ${pred(r, t, "", 1)}" else ""
    s"SELECT $g, ${aggs.result().mkString(", ")} FROM $fromSql$where GROUP BY $g$having"
  }

  private def subquery(r: Random): String = r.nextInt(3) match {
    case 0 => // IN over the nation keys
      val neg = if (r.nextBoolean()) "" else "NOT "
      s"SELECT ${selectList(r, customer)} FROM customer WHERE c_nationkey ${neg}IN " +
        s"(SELECT n_nationkey FROM nation WHERE ${pred(r, nation, "", 1)})"
    case 1 => // correlated EXISTS customer→orders
      val neg = if (r.nextBoolean()) "" else "NOT "
      s"SELECT c_custkey, c_acctbal FROM customer c WHERE ${neg}EXISTS " +
        s"(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND ${pred(r, orders, "o", 1)})"
    case _ => // IN over supplier nations
      s"SELECT ${selectList(r, supplier)} FROM supplier WHERE s_nationkey IN " +
        s"(SELECT n_nationkey FROM nation WHERE ${pred(r, nation, "", 1)})"
  }

  private def scalarSub(r: Random): String = {
    val t = pick(r, Seq(customer, supplier, orders))
    val c = pick(r, t.dblCols)
    val mm = pick(r, Seq("min", "max"))
    val frac = pick(r, Seq("0.25", "0.5", "0.75"))
    s"SELECT ${t.key}, $c FROM ${t.name} WHERE $c ${pick(r, Seq("<", ">"))} " +
      s"(SELECT $mm($c) FROM ${t.name}) * $frac"
  }

  private def setOp(r: Random): String = {
    val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
    val pairs = Seq(
      (nation, "n_regionkey", region, "r_regionkey"),
      (customer, "c_nationkey", supplier, "s_nationkey"),
      (orders, "o_custkey", customer, "c_custkey"))
    val (a, ca, b, cb) = pick(r, pairs)
    s"SELECT $ca AS fz_k FROM ${a.name} WHERE ${pred(r, a, "", 1)} $op " +
      s"SELECT $cb AS fz_k FROM ${b.name} WHERE ${pred(r, b, "", 1)}"
  }

  // ------------------------------------------------------------ v2 shapes
  // (window functions, CTEs, nested aggregation — the r9 corpus only
  // covered flat shapes)

  /** Window functions in a derived table. Determinism: OVER order is
    * always the table's unique key, so ranks are total and lag/lead are
    * well-defined; partition aggregates don't order at all. */
  private def windowed(r: Random): String = {
    val t = pick(r, Seq(nation, customer, supplier, orders, part))
    val g = pick(r, t.intCols)
    val desc = if (r.nextBoolean()) " DESC" else ""
    r.nextInt(3) match {
      case 0 => // top-k per group via row_number
        val k = 1 + r.nextInt(5)
        s"SELECT fk, fzw FROM (SELECT ${t.key} AS fk, " +
          s"row_number() OVER (PARTITION BY $g ORDER BY ${t.key}$desc) AS fzw " +
          s"FROM ${t.name} WHERE ${pred(r, t, "", 1)}) AS dt WHERE fzw <= $k"
      case 1 => // whole-partition aggregate, no window order
        val ic = pick(r, t.intCols)
        val fn = pick(r, Seq("sum", "min", "max", "count"))
        s"SELECT fk, fzg, fzw FROM (SELECT ${t.key} AS fk, $g AS fzg, " +
          s"$fn($ic) OVER (PARTITION BY $g) AS fzw FROM ${t.name}) AS dt " +
          s"WHERE ${intPred(r, "fk")}"
      case _ => // lag/lead along the key order
        val ic = pick(r, t.intCols)
        val fn = pick(r, Seq("lag", "lead"))
        s"SELECT fk, fzw FROM (SELECT ${t.key} AS fk, " +
          s"$fn($ic, 1, -1) OVER (PARTITION BY $g ORDER BY ${t.key}) AS fzw " +
          s"FROM ${t.name} WHERE ${pred(r, t, "", 1)}) AS dt " +
          s"WHERE ${intPred(r, "fk")}"
    }
  }

  /** star-schema fk→pk pairs usable for CTE joins: (fact, fkCol, dim,
    * pkCol). */
  private val ctePairs = Seq(
    (nation, "n_regionkey", region, "r_regionkey"),
    (customer, "c_nationkey", nation, "n_nationkey"),
    (supplier, "s_nationkey", nation, "n_nationkey"),
    (orders, "o_custkey", customer, "c_custkey"))

  private def cteQuery(r: Random): String = r.nextInt(2) match {
    case 0 => // filtered CTE re-selected (scope layering)
      val t = pick(r, tables)
      s"WITH base AS (SELECT ${selectList(r, t)} FROM ${t.name} " +
        s"WHERE ${pred(r, t, "", 1)}) SELECT * FROM base"
    case _ => // aggregate CTE joined back to its dimension
      val (fact, fk, dim, pk) = pick(r, ctePairs)
      val w = if (r.nextBoolean()) s" WHERE ${pred(r, fact, "", 1)}" else ""
      val dw = if (r.nextBoolean()) s" WHERE ${pred(r, dim, "", 1)}" else ""
      s"WITH agg AS (SELECT $fk AS fzk, count(*) AS fz_cnt, " +
        s"min(${fact.key}) AS fz_min FROM ${fact.name}$w GROUP BY $fk) " +
        s"SELECT ${dim.key}, fz_cnt, fz_min FROM ${dim.name} " +
        s"JOIN agg ON $pk = fzk$dw"
  }

  /** Aggregate over an aggregate (derived-table regrouping). */
  private def nestedAgg(r: Random): String = {
    val t = pick(r, Seq(nation, customer, supplier, orders, part))
    val g = pick(r, t.intCols)
    val w = if (r.nextBoolean()) s" WHERE ${pred(r, t, "", 1)}" else ""
    val hv = if (r.nextInt(3) == 0) s" WHERE fz_cnt > ${r.nextInt(4)}" else ""
    s"SELECT count(*) AS fz_n, min(fz_cnt) AS fz_lo, max(fz_cnt) AS fz_hi " +
      s"FROM (SELECT $g, count(*) AS fz_cnt FROM ${t.name}$w GROUP BY $g) " +
      s"AS dt$hv"
  }

  /** v2 query i: window/CTE/nested shapes mixed with the v1 grammar. */
  def queryV2(seed: Long, i: Int): String = {
    val r = new Random(seed * 2000003L + i)
    r.nextInt(100) match {
      case n if n < 10 => singleTable(r)
      case n if n < 20 => joined(r)
      case n if n < 30 => aggregated(r)
      case n if n < 55 => windowed(r)
      case n if n < 75 => cteQuery(r)
      case n if n < 90 => nestedAgg(r)
      case _ => setOp(r)
    }
  }

  /** Query i for the given corpus seed. */
  def query(seed: Long, i: Int): String = {
    val r = new Random(seed * 1000003L + i)
    r.nextInt(100) match {
      case n if n < 30 => singleTable(r)
      case n if n < 50 => joined(r)
      case n if n < 70 => aggregated(r)
      case n if n < 80 => subquery(r)
      case n if n < 90 => scalarSub(r)
      case _ => setOp(r)
    }
  }

  /** The committed corpus: seed 20260814, 600 queries. */
  val CorpusSeed = 20260814L
  val CorpusSize = 600

  def corpus(): Seq[String] = (0 until CorpusSize).map(query(CorpusSeed, _))

  /** The committed v2 corpus (windows/CTEs/nested aggregation). */
  val CorpusV2Seed = 20260815L
  val CorpusV2Size = 400

  def corpusV2(): Seq[String] =
    (0 until CorpusV2Size).map(queryV2(CorpusV2Seed, _))

  // -------------------------------------------------- v3: WITH RECURSIVE
  // Spark 4.1 executes recursive CTEs natively, so the graft fixpoint
  // gets a THREE-way differential: graft loop vs Spark's native
  // recursion vs DuckDB. Shapes bound iteration counts (driver loop
  // cost) to ≲ 25.

  /** UNION ALL arithmetic series with data-independent depth. */
  private def recSeries(r: Random): String = {
    val a = r.nextInt(4); val step = 1 + r.nextInt(3)
    val b = a + 3 + r.nextInt(22)
    s"WITH RECURSIVE t(n) AS (SELECT $a UNION ALL " +
      s"SELECT n + $step FROM t WHERE n < $b) " +
      "SELECT CAST(count(1) AS BIGINT) AS fz_n, " +
      "CAST(sum(n) AS BIGINT) AS fz_s, max(n) AS fz_m FROM t"
  }

  /** UNION (distinct) modular walk — termination comes from the set
    * semantics alone; visits m/gcd(s,m) residues then cycles. */
  private def recCycle(r: Random): String = {
    val m = 5 + r.nextInt(8)
    val s = 1 + r.nextInt(m - 1)
    s"WITH RECURSIVE c(id) AS (SELECT 0 UNION " +
      s"SELECT (id + $s) % $m FROM c) " +
      "SELECT CAST(count(1) AS BIGINT) AS fz_n, max(id) AS fz_m FROM c"
  }

  /** region→nation hierarchy walk with a random predicate pruning the
    * recursive term (a join inside the recursion). */
  private def recHierarchy(r: Random): String = {
    val w = s" WHERE ${intPred(r, "n_nationkey")}"
    s"WITH RECURSIVE h(id, d) AS (" +
      "SELECT r_regionkey + 100, 0 FROM region UNION ALL " +
      "SELECT n_nationkey, h.d + 1 FROM nation " +
      s"JOIN h ON n_regionkey + 100 = h.id$w) " +
      "SELECT CAST(count(1) AS BIGINT) AS fz_n, " +
      "CAST(sum(id) AS BIGINT) AS fz_s, max(d) AS fz_d FROM h"
  }

  def queryV3(seed: Long, i: Int): String = {
    val r = new Random(seed * 3000017L + i)
    r.nextInt(100) match {
      case n if n < 40 => recSeries(r)
      case n if n < 70 => recCycle(r)
      case _ => recHierarchy(r)
    }
  }

  /** The committed v3 corpus (recursive CTE differential). */
  val CorpusV3Seed = 20260816L
  val CorpusV3Size = 60

  def corpusV3(): Seq[String] =
    (0 until CorpusV3Size).map(queryV3(CorpusV3Seed, _))

  // -------------------------------------------------- v4: DML sequences
  /** A fuzzed DML statement SEQUENCE plus the expected final table from
    * an independent in-memory fold — the differential reference for the
    * stateful surface (INSERT VALUES / column-subset INSERT /
    * self-referencing INSERT…SELECT / single- and multi-column UPDATE
    * incl. the old-row swap / subquery-free and IN-subquery predicates /
    * DELETE / TRUNCATE). DuckDB cannot replay graft's scope-table
    * statements and Spark SQL has no UPDATE/DELETE on temp views, so the
    * fold plays the oracle role the way the MERGE property test does.
    * Row model: (id, v) BIGINTs, v nullable via column-subset INSERTs —
    * SQL three-valued WHERE logic is part of what the fold checks. */
  final case class DmlProgram(statements: Seq[String],
      expected: Seq[(Option[Long], Option[Long])])

  def programV4(seed: Long, i: Int): DmlProgram = {
    type Row = (Option[Long], Option[Long])
    val r = new Random(seed * 4000037L + i)
    var rows = Vector.empty[Row]
    val stmts = Seq.newBuilder[String]
    def insertValues(): Unit = {
      val vals = (0 until 1 + r.nextInt(3))
        .map(_ => (r.nextInt(20).toLong, r.nextInt(50).toLong))
      stmts += s"INSERT INTO t VALUES ${vals.map { case (a, b) => s"($a, $b)" }.mkString(", ")}"
      rows ++= vals.map { case (a, b) => (Some(a), Some(b)) }
    }
    insertValues() // every program starts from a seeded table
    def pred(): (String, Row => Boolean) = r.nextInt(6) match {
      case 0 => val c = r.nextInt(50)
        (s"v < $c", row => row._2.exists(_ < c))
      case 1 => val m = 2 + r.nextInt(3); val k = r.nextInt(m)
        (s"id % $m = $k", row => row._1.exists(_ % m == k))
      case 2 => ("v IS NULL", row => row._2.isEmpty)
      case 3 => val c = r.nextInt(20)
        (s"id > $c", row => row._1.exists(_ > c))
      case 4 => val c = r.nextInt(50); val d = r.nextInt(20)
        (s"v >= $c AND id <= $d",
          row => row._2.exists(_ >= c) && row._1.exists(_ <= d))
      case _ => val c = r.nextInt(50)
        // IN-subquery predicate over the SAME table: must evaluate
        // against the pre-statement state
        (s"id IN (SELECT id FROM t WHERE v < $c)",
          row => row._1.isDefined) // refined at the call site (needs state)
    }
    def vexpr(): (String, Row => Option[Long]) = r.nextInt(4) match {
      case 0 => val c = r.nextInt(30); (s"v + $c", row => row._2.map(_ + c))
      case 1 => val c = r.nextInt(50); (s"$c", _ => Some(c.toLong))
      case 2 => ("id", row => row._1)
      case _ => ("v * 2", row => row._2.map(_ * 2))
    }
    // predicate with state-dependent IN-subquery resolved against a
    // snapshot of the CURRENT rows (pre-statement semantics)
    def predOn(snapshot: Vector[Row]): (String, Row => Boolean) = {
      val (s0, f0) = pred()
      if (!s0.contains("IN (SELECT")) (s0, f0)
      else {
        val c = s0.substring(s0.lastIndexOf("v < ") + 4).init.toLong
        val ids = snapshot.filter(_._2.exists(_ < c)).flatMap(_._1).toSet
        (s0, row => row._1.exists(ids.contains))
      }
    }
    val n = 4 + r.nextInt(5)
    for (_ <- 0 until n) r.nextInt(100) match {
      case x if x < 20 =>
        if (r.nextBoolean()) insertValues()
        else {
          val ids = (0 until 1 + r.nextInt(2)).map(_ => r.nextInt(20).toLong)
          stmts += s"INSERT INTO t (id) VALUES ${ids.map(a => s"($a)").mkString(", ")}"
          rows ++= ids.map(a => (Some(a), None))
        }
      case x if x < 35 =>
        val k = 20 + r.nextInt(30)
        val (ps, pf) = predOn(rows)
        stmts += s"INSERT INTO t SELECT id + $k, v FROM t WHERE $ps"
        rows ++= rows.filter(pf).map { case (a, b) => (a.map(_ + k), b) }
      case x if x < 55 =>
        val (es, ef) = vexpr()
        if (r.nextInt(4) == 0) {
          stmts += s"UPDATE t SET v = $es"
          rows = rows.map(row => (row._1, ef(row)))
        } else {
          val (ps, pf) = predOn(rows)
          stmts += s"UPDATE t SET v = $es WHERE $ps"
          rows = rows.map(row => if (pf(row)) (row._1, ef(row)) else row)
        }
      case x if x < 60 =>
        // multi-column UPDATE: both RHS see the OLD row (the swap case)
        val (ps, pf) = predOn(rows)
        stmts += s"UPDATE t SET id = v, v = id WHERE $ps"
        rows = rows.map(row => if (pf(row)) (row._2, row._1) else row)
      case x if x < 68 =>
        // PG UPDATE ... FROM a VALUES relation (unique mids): SET sees
        // the joined column; join key + extra target-side predicate
        val src = (0 until 2 + r.nextInt(3))
          .map(j => (r.nextInt(10) + j * (1 + r.nextInt(3)), r.nextInt(50).toLong))
          .distinctBy(_._1)
        val srcMap = src.map { case (a, b) => (a.toLong, b) }.toMap
        val valuesSql = src.map { case (a, b) => s"($a, $b)" }.mkString(", ")
        val (ps, pf) = predOn(rows)
        val plus = r.nextBoolean()
        val es = if (plus) "v + mv" else "mv"
        stmts += s"UPDATE t SET v = $es FROM (VALUES $valuesSql) AS m(mid, mv) " +
          s"WHERE id = mid AND ($ps)"
        rows = rows.map { row =>
          row._1.flatMap(srcMap.get) match {
            case Some(mv) if pf(row) =>
              (row._1, if (plus) row._2.map(_ + mv) else Some(mv))
            case _ => row
          }
        }
      case x if x < 78 =>
        val (ps, pf) = predOn(rows)
        stmts += s"DELETE FROM t WHERE $ps"
        rows = rows.filterNot(pf)
      case x if x < 84 =>
        // PG DELETE ... USING a VALUES relation: matched rows go
        val src = (0 until 2 + r.nextInt(3))
          .map(j => (r.nextInt(10) + j * (1 + r.nextInt(3)), r.nextInt(50).toLong))
          .distinctBy(_._1)
        val srcIdSet = src.map(_._1.toLong).toSet
        val valuesSql = src.map { case (a, b) => s"($a, $b)" }.mkString(", ")
        val (ps, pf) = predOn(rows)
        stmts += s"DELETE FROM t USING (VALUES $valuesSql) AS m(mid, mv) " +
          s"WHERE id = mid AND ($ps)"
        rows = rows.filterNot(row =>
          row._1.exists(srcIdSet.contains) && pf(row))
      case x if x < 96 =>
        // MERGE from a VALUES source (unique source ids — duplicate
        // TARGET ids are legal bag semantics; a target row matching >1
        // source row is the tested cardinality ERROR, not a fuzz case).
        // Fold semantics: first applicable clause wins, exactly one
        // clause per row, across ALL columns.
        val srcIds = r.nextInt(40) // base offset keeps some matches/misses
        val src = (0 until 2 + r.nextInt(3))
          .map(j => (srcIds + j * (1 + r.nextInt(4)), r.nextInt(50).toLong))
          .distinctBy(_._1)
        val srcMap = src.map { case (a, b) => (a.toLong, b) }.toMap
        val mClauses = (0 until 1 + r.nextInt(2)).map { _ =>
          val (cs, cp): (String, (Option[Long], Long) => Boolean) =
            r.nextInt(3) match {
              case 0 => ("", (_, _) => true)
              case 1 => val c = r.nextInt(50)
                (s" AND mv > $c", (_, mv) => mv > c)
              case _ => val c = r.nextInt(50)
                (s" AND v < $c", (v, _) => v.exists(_ < c))
            }
          r.nextInt(3) match {
            case 0 => (s"WHEN MATCHED$cs THEN UPDATE SET v = mv",
              cp, Some((v: Option[Long], mv: Long) => Some(mv)))
            case 1 => (s"WHEN MATCHED$cs THEN UPDATE SET v = v + mv",
              cp, Some((v: Option[Long], mv: Long) => v.map(_ + mv)))
            case _ => (s"WHEN MATCHED$cs THEN DELETE", cp, None)
          }
        }
        val withInsert = r.nextInt(3) > 0
        val insClause = if (withInsert)
          Seq("WHEN NOT MATCHED THEN INSERT (id, v) VALUES (mid, mv)")
        else Nil
        val valuesSql = src.map { case (a, b) => s"($a, $b)" }.mkString(", ")
        stmts += (s"MERGE INTO t USING (VALUES $valuesSql) AS m(mid, mv) " +
          s"ON id = mid " + (mClauses.map(_._1) ++ insClause).mkString(" "))
        val kept = rows.flatMap { case (idO, v) =>
          idO.flatMap(srcMap.get) match {
            case None => Some((idO, v))
            case Some(mv) =>
              mClauses.find { case (_, p, _) => p(v, mv) } match {
                case Some((_, _, Some(f))) => Some((idO, f(v, mv)))
                case Some((_, _, None)) => None
                case None => Some((idO, v))
              }
          }
        }
        val tgtIds = rows.flatMap(_._1).toSet
        val ins = if (withInsert)
          src.filterNot(s0 => tgtIds.contains(s0._1.toLong))
            .map { case (a, b) => (Some(a.toLong), Some(b)) }
        else Nil
        rows = kept ++ ins
      case _ =>
        stmts += "TRUNCATE TABLE t"
        rows = Vector.empty
    }
    DmlProgram(stmts.result(), rows)
  }

  /** The committed v4 corpus: 100 DML statement sequences. */
  val CorpusV4Seed = 20260816L
  val CorpusV4Size = 100

  def programsV4(): Seq[DmlProgram] =
    (0 until CorpusV4Size).map(programV4(CorpusV4Seed, _))

  /** Corpus serialization: one program per line, statements joined by
    * "; " (no string literals in the grammar, so the separator is safe). */
  def corpusV4(): Seq[String] = programsV4().map(_.statements.mkString("; "))
}
