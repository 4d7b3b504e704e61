package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** Session wiring for graft's native expressions and the `graft_sql`
  * dialect gateway.
  *
  * Two paths, same registrations:
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    at session build (the SparkSessionExtensions contract), or
  *  - `GraftFunctions.register(spark)` on a live session.
  *
  * After either, `spark.sql("select float_dot(a, b) ...")` — and the
  * graft dialect engine, whose function registry falls through to
  * `call_function` — resolve to the codegen'd native expressions, and
  * `SELECT * FROM graft_sql('<dialect stmt>')` executes graft dialect
  * SQL from ANY Spark SQL surface — including a remote Spark Connect
  * client, which otherwise submits only Spark SQL (the reference's
  * "remote client executes dialect SQL" role,
  * `src/framequery/alchemy/dialect.py:13-62`, over the Spark-native
  * wire as well as the PG wire). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectTableFunction(GraftFunctions.graftSqlDescription)
    // automatic file-level data skipping for manifest-carrying parquet
    // tables (see ManifestSkipping) — a no-op for every other relation
    ext.injectOptimizerRule(session => ManifestSkippingRule(session))
    // metadata-only aggregates (count/min/max/sum/avg + file-constant
    // GROUP BY answered from the manifest with zero files opened;
    // identity-gated, decline-on-doubt)
    ext.injectOptimizerRule(session => MetadataAggRule(session))
    // top-k file pruning: ORDER BY c LIMIT k gains a derived range
    // filter that provably preserves the top-k, so manifest pruning
    // drops the files outside the bound (decline-on-doubt)
    ext.injectOptimizerRule(session => TopKPruningRule(session))
    // join-driven dynamic file pruning: a broadcast-eligible build
    // side's distinct join keys become an IN filter on a
    // manifest-carrying probe side, so star joins prune fact files
    // like literal predicates do (decline-on-doubt)
    ext.injectOptimizerRule(session => DynamicFilePruningRule(session))
    // per-partition top-k pruning: QUALIFY row_number()/rank() OVER
    // (PARTITION BY p ORDER BY c) <= k over file-constant p gains a
    // per-group bound OR filter the manifest prunes on
    ext.injectOptimizerRule(session => WindowTopKPruningRule(session))
  }
}

object GraftFunctions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("float_dot"),
        info("float_dot",
          "float_dot(a, b) - dot product of two float arrays in double precision"),
        (args: Seq[Expression]) => FloatDot(args(0), args(1))),
      (FunctionIdentifier("float_double_dist2"),
        info("float_double_dist2",
          "float_double_dist2(a, b) - squared L2 of array<float> vs array<double>"),
        (args: Seq[Expression]) => FloatDoubleDist2(args(0), args(1))))

  /** Register on an already-built session (temp function registry). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    descriptions.foreach { case (ident, _, builder) =>
      spark.asInstanceOf[SparkSession].sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
    spark.asInstanceOf[SparkSession].sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(
        "graft_sql", graftSqlDescription._3, "built-in")
  }

  /** `graft_sql('<stmt>')` — the dialect gateway as a Spark SQL TABLE
    * function. The statement (or ';'-separated script) runs through the
    * graft [[graft.exec.Executor]] cluster-side against a scope
    * assembled from everything the calling session can see (temp views,
    * global temp views, catalog tables), and the call resolves to the
    * result relation. Dialect statements that CREATE or mutate scope
    * tables republish them as session temp views, so a remote session
    * carries dialect state across calls:
    * `graft_sql('create table t as ...')` then
    * `graft_sql('select ... from t')`.
    *
    * The statement must be a string LITERAL: the dialect compile needs
    * the text at analysis time. SIDE-EFFECT TIMING (r14): a script that
    * contains any mutating statement (DDL/DML/COPY/OPTIMIZE/ANALYZE)
    * resolves to a deferred command ([[GraftSqlCommand]]) that executes
    * when the query RUNS — so `EXPLAIN` never executes it (Spark plans
    * EXPLAIN with command execution skipped) and a re-analyzed plan
    * (view expansion, cached-view re-plan) does not silently re-append.
    * Such scripts resolve to a one-row `status` relation carrying the
    * command tag; a mixed script ending in a query still reports only
    * `status` (its result-set schema cannot be known before the earlier
    * statements ran) — split the final query into its own graft_sql
    * call. Pure query scripts compile to a LAZY plan at analysis time —
    * no side effects to defer. */
  val graftSqlDescription: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    (FunctionIdentifier("graft_sql"),
      info("graft_sql",
        "graft_sql(stmt) - execute a graft dialect SQL statement and return its result relation"),
      (args: Seq[Expression]) => graftSqlPlan(args))

  private def graftSqlPlan(args: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types.StringType
    require(args.length == 1 && args.head.foldable &&
      args.head.dataType == StringType,
      "graft_sql expects exactly one string literal argument")
    val stmt = Option(args.head.eval()).map(_.toString).getOrElse(
      throw new IllegalArgumentException("graft_sql: statement is NULL"))
    // classify WITHOUT executing: any mutating statement in the script
    // defers the whole run to execution time. A script that fails to
    // parse classifies as pure — the executor will surface its own
    // error at analysis, same as before.
    val mutating =
      try graft.exec.Executor.splitStatements(stmt).exists(s =>
        graft.parser.Parser.parse(s) match {
          case _: graft.ast.Select | _: graft.ast.ShowStmt |
               _: graft.ast.ExplainStmt => false
          case _ => true
        })
      catch { case _: Exception => false }
    if (mutating) GraftSqlCommand(stmt)
    else {
      val session = org.apache.spark.sql.SparkSession.getActiveSession
        .getOrElse(throw new IllegalStateException(
          "graft_sql: no active SparkSession"))
      val (result, _) = runScript(session, stmt)
      result
        .getOrElse(session.sql("SELECT 'OK' AS status"))
        .queryExecution.analyzed
    }
  }

  /** Assemble the scope from everything the session can see, run the
    * script, republish dialect-created/mutated tables as temp views and
    * drop removed ones. Returns (last result set, command tag). Called
    * at ANALYSIS time for pure query scripts (no side effects to time)
    * and at EXECUTION time for mutating ones ([[GraftSqlCommand]]). */
  private[graft] def runScript(session: org.apache.spark.sql.SparkSession,
      stmt: String): (Option[org.apache.spark.sql.DataFrame], String) = {
    // scope = every table the calling session can see, keyed by bare
    // name (the dialect's flat-scope model; global temp views span
    // Connect client sessions, which is how a remote caller reaches
    // graft-published results)
    val names = scala.collection.mutable.LinkedHashMap.empty[String, String]
    scala.util.Try(session.catalog.listTables("global_temp").collect())
      .getOrElse(Array.empty)
      .foreach(t => names += (t.name -> s"global_temp.`${t.name}`"))
    scala.util.Try(session.catalog.listTables().collect())
      .getOrElse(Array.empty)
      .foreach(t => names += (t.name -> s"`${t.name}`")) // temp shadows global
    val scope0: Map[String, org.apache.spark.sql.DataFrame] =
      names.map { case (n, ref) => n -> session.table(ref) }.toMap
    val exec = new graft.exec.Executor(session, scope0)
    val result = exec.executeScript(stmt)
    // republish dialect-created/mutated tables as session temp views so
    // the next graft_sql (or plain Spark SQL) call sees them
    exec.tableNames.foreach { n =>
      exec.table(n).foreach { df =>
        if (!scope0.get(n).exists(_ eq df)) df.createOrReplaceTempView(n)
      }
    }
    // ... and dialect DROPs must stick the same way: a scope name the
    // script removed loses its temp view (then its global temp view).
    // Persistent catalog tables are NOT deleted here — the dialect
    // DROP is scope-level, and destroying warehouse data from a
    // gateway call would be a privilege the PG-wire path doesn't
    // exercise either.
    val after = exec.tableNames.toSet
    scope0.keysIterator.filterNot(after).foreach { n =>
      if (!session.catalog.dropTempView(n))
        session.catalog.dropGlobalTempView(n)
    }
    (result, exec.lastCommandTag.getOrElse("OK"))
  }
}

/** Deferred execution node for mutating `graft_sql` scripts: analysis
  * resolves the schema (one `status` string) WITHOUT running anything;
  * the script executes when the surrounding query runs — once per
  * submission, never under EXPLAIN, never again on re-analysis. The
  * ADVICE r13 footgun (EXPLAIN / view re-expansion silently
  * double-appending an INSERT) is closed by construction. */
case class GraftSqlCommand(stmt: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "status", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(sparkSession: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.Row] = {
    val (_, tag) = GraftFunctions.runScript(sparkSession, stmt)
    Seq(org.apache.spark.sql.Row(tag))
  }
}
