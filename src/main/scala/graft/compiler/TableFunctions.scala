package graft.compiler

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ast._
import graft.functions.{Json, JsonKV}

/** Table-valued functions: FROM-level and LATERAL dispatch.
  *
  * Reference: table_functions registry (src/framequery/executor/
  * _pandas.py:58-62), lateral driver (_pandas.py:292-319 — a row-at-a-time
  * iterrows loop there; here LATERAL compiles to `explode`, which is a
  * narrow, codegen'd, fully distributed operator).
  */
final class TableFunctions(spark: SparkSession) {
  import spark.implicits._

  /** COPY/copy_from base directory (reference with_basepath, _pandas.py:78-87). */
  @volatile var basepath: String = "."

  /** user-registered FROM-level table functions: args are evaluated scalars */
  private var userTfs: Map[String, Seq[Any] => DataFrame] = Map.empty
  /** user-registered LATERAL functions: (left, compiled arg columns) → df */
  private var userLateral: Map[String, (DataFrame, Seq[Column]) => DataFrame] = Map.empty

  def register(name: String, f: Seq[Any] => DataFrame): Unit =
    userTfs += (name.toLowerCase -> f)
  def registerLateral(name: String, f: (DataFrame, Seq[Column]) => DataFrame): Unit =
    userLateral += (name.toLowerCase -> f)

  def resolvePath(p: String): String =
    if (p.startsWith("/") || p.contains("://")) p else s"$basepath/$p"

  /** Evaluate constant arguments of a FROM-level table function. Scalar
    * args in FROM position are literals/constant expressions (reference
    * evaluates them against df=None, _pandas.py:222-230). */
  private def evalConst(e: Expr, c: Compiler): Any = e match {
    case IntLit(v) => v
    case FloatLit(v) => v
    case StringLit(v) => v
    case BoolLit(v) => v
    case NullLit => null
    case CastExpr(x, _) => evalConst(x, c) // ::json etc. — value unchanged
    case other =>
      // general constant expression: evaluate via a 1-row plan
      spark.range(1).select(c.compileExpr(other)).collect()(0).get(0)
  }

  def compile(tf: TableFunctionRel, c: Compiler,
      scope: Map[String, DataFrame]): DataFrame = {
    val args = tf.args.map(evalConst(_, c))
    val df = tf.func match {
      case "json_each" =>
        Json.parseObject(args.head.asInstanceOf[String])
          .map { case (k, v) => JsonKV(k, v) }.toDF()
      case "json_array_elements" =>
        Json.parseArray(args.head.asInstanceOf[String]).toDF("value")
      case "generate_series" =>
        val (a, b) = (toLong(args(0)), toLong(args(1)))
        val step = if (args.length > 2) toLong(args(2)) else 1L
        // spark.range is end-exclusive; PG generate_series is inclusive.
        // Distributed — a 10^12-row series is fine.
        spark.range(a, b + step, step).toDF("generate_series")
      case "copy_from" =>
        // copy_from('path', 'delimiter', ';', 'format', 'csv') — option
        // name/value pairs after the path (reference _pandas.py:222-230)
        val path = resolvePath(args.head.asInstanceOf[String])
        val opts = args.tail.map(_.toString).grouped(2).collect {
          case Seq(k, v) => k -> v
        }.toMap
        readCsv(path, opts)
      case "unnest" =>
        // PG unnest(array) → one row per element, column named like PG
        import spark.implicits._
        args.head match {
          case null => Seq.empty[String].toDF("unnest")
          case s: Seq[_] if s.forall(_.isInstanceOf[java.lang.Long]) ||
              s.forall(_.isInstanceOf[java.lang.Integer]) =>
            s.map(v => v.asInstanceOf[Number].longValue).toDF("unnest")
          case s: Seq[_] => s.map(String.valueOf).toDF("unnest")
          case other => throw CompileException(
            s"unnest expects an array argument, got $other")
        }
      case other =>
        userTfs.get(other) match {
          case Some(f) => f(args)
          case None => throw CompileException(s"unknown table function '$other'")
        }
    }
    val renamed =
      if (tf.aliasCols.isEmpty) df
      else if (tf.aliasCols.length == df.columns.length) df.toDF(tf.aliasCols: _*)
      else throw CompileException(
        s"alias column list has ${tf.aliasCols.length} names but " +
          s"'${tf.func}' returns ${df.columns.length} columns")
    renamed.alias(tf.alias.getOrElse(tf.func))
  }

  /** LATERAL f(args): a true correlated lateral join (Spark 4
    * `Dataset.lateralJoin` + `Column.outer()` on the left-referencing
    * args) — the generated columns live under the function's own alias,
    * exactly like PG, and execution is a distributed generator, not the
    * reference's per-row iterrows loop (_pandas.py:292-319). */
  def compileLateral(left: DataFrame, tf: TableFunctionRel, c: Compiler): DataFrame = {
    tf.func match {
      case "json_each" | "json_array_elements" | "generate_series" =>
        val argCols = tf.args.map(c.compileExprOuter)
        // outer references are only legal in a Project inside the lateral
        // subquery, so materialize the per-row array first, then explode
        val gen = tf.func match {
          case "json_each" =>
            // DEFAULT: from_json → map<string,string> — value rendering
            // identical to the Jackson UDF (Json.jsonEachEntries), pair
            // order = document order (PG json semantics). VARIANT MODE
            // (graft.json.variant=true): try_parse_json + the
            // VariantExplode generator — fully codegen'd where
            // from_json is CodegenFallback, at the cost of key-sorted
            // pair order (PG jsonb semantics; see Json.variantMode).
            if (Json.variantMode(spark))
              // key IS NOT NULL = object entries only (an array input
              // yields null-key rows, which json_each must not emit —
              // the default mode's from_json(Map) on an array parses
              // to null and emits nothing). The outer reference lives
              // in the first Project (the only place Spark allows it);
              // the generator then reads the local column.
              spark.range(1).select(argCols.head.as("__js"))
                .select(Json.variantEntries(col("__js")))
                .filter(col("key").isNotNull)
                .select(col("key"),
                  Json.variantValueText(col("value")).as("value"))
            else
              spark.range(1)
                .select(Json.jsonEachEntries(argCols.head).as("__m"))
                .select(explode(col("__m")))
          case "json_array_elements" =>
            if (Json.variantMode(spark))
              // key IS NULL = array elements only (JSON object keys are
              // never null, so an object input emits nothing — the
              // default mode's from_json(Array) contract)
              spark.range(1).select(argCols.head.as("__js"))
                .select(Json.variantEntries(col("__js")))
                .filter(col("key").isNull)
                .select(Json.variantValueText(col("value")).as("value"))
            else
              spark.range(1)
                .select(Json.jsonArrayEntries(argCols.head).as("__arr"))
                .select(explode(col("__arr")).as("value"))
          case "generate_series" =>
            val step = if (argCols.length > 2) argCols(2) else lit(1L)
            // sequence() is inclusive like PG
            spark.range(1).select(sequence(argCols(0), argCols(1), step).as("__arr"))
              .select(explode(col("__arr")).as("generate_series"))
        }
        left.lateralJoin(tf.alias.map(gen.alias(_)).getOrElse(gen))
      case other =>
        // user lateral functions transform the left frame directly
        val argCols = tf.args.map(c.compileExpr)
        userLateral.get(other) match {
          case Some(f) =>
            val out = f(left, argCols)
            tf.alias.map(out.alias(_)).getOrElse(out)
          case None => throw CompileException(s"unknown lateral function '$other'")
        }
    }
  }

  def readCsv(path: String, options: Map[String, String]): DataFrame = {
    var r = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
    for ((k, v) <- options) k match {
      case "delimiter" | "sep" => r = r.option("sep", v)
      case "header" => r = r.option("header", v)
      case "format" => () // csv is the only format, as in the reference
      case other => r = r.option(other, v)
    }
    r.csv(path)
  }

  private def toLong(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
    case d: Double => d.toLong
    case s: String => s.toLong
    case other => throw CompileException(s"expected integer, got $other")
  }
}
