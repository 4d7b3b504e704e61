package graft.compiler

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ast._
import graft.functions.Registry

final case class CompileException(msg: String) extends RuntimeException(msg)

/** AST → DataFrame compiler.
  *
  * Plays the role of the reference's `execute_ast` + Model pair
  * (reference src/framequery/executor/_executor.py:162-448 and
  * _pandas.py) but emits a *declarative* Spark logical plan instead of
  * eagerly executing operators: Catalyst then does predicate pushdown,
  * column pruning, join selection (broadcast vs shuffle), partial
  * aggregation and whole-stage codegen. None of the reference's
  * hand-rolled physical machinery survives — the 3-phase aggregate split
  * (_executor.py:451-519), the outer-theta-join rowid skeleton
  * (_pandas.py:260-288) and the odd-even partition sort (_dask.py) are
  * all native Spark operators here (SURVEY §4).
  */
final class Compiler(spark: SparkSession, registry: Registry,
    tableFunctions: TableFunctions,
    /** ANALYZE-collected statistics (Executor session state); consulted
      * at TableRef compile time for the broadcast-join decision. */
    statsFor: String => Option[TableStats] = _ => None) {

  /** The session's broadcast budget. Honors the standard Spark knob —
    * a measured table at or under the threshold gets a broadcast hint,
    * `-1` disables hinting exactly like it disables Spark's own
    * size-estimate broadcasts. */
  private def broadcastThreshold: Long = {
    val v = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    if (v.trim.startsWith("-")) -1L
    else try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
    catch { case _: NumberFormatException => 10485760L }
  }

  /** Resolve-and-compile a full SELECT against a scope (name → DataFrame). */
  def compileSelect(sel: Select, scope: Map[String, DataFrame]): DataFrame = {
    // CTEs evaluate into a child scope (reference _executor.py:167-171).
    // Under WITH RECURSIVE, an entry whose body references its own name
    // takes the iterative-fixpoint path instead of plain evaluation.
    val scope2 = sel.cte.foldLeft(scope) { case (sc, (name, sub)) =>
      val declared = sel.cteCols.getOrElse(name, Nil)
      val df =
        if (sel.cteRecursive && selectReferences(sub, name))
          compileRecursiveCte(name, declared, sub, sc)
        else withDeclaredCols(compileSelect(sub, sc), name, declared)
      sc + (name -> df)
    }
    var df = compileCore(sel, scope2)

    // set operations (extension; the reference lists them unsupported §2.7)
    for ((op, rhsSel) <- sel.setOps) {
      val rhs = compileCore(rhsSel, scope2)
      df = op match {
        case "union all" => df.union(rhs)
        case "union" => df.union(rhs).distinct()
        case "intersect" => df.intersect(rhs)
        case "intersect all" => df.intersectAll(rhs)
        case "except" => df.except(rhs)
        case "except all" => df.exceptAll(rhs)
      }
    }
    // ORDER BY over a set-op result may only reference output columns
    if (sel.setOps.nonEmpty && sel.orderBy.nonEmpty) {
      val names = df.columns.toSeq
      df = df.orderBy(sel.orderBy.map { si =>
        si.e match {
          case IntLit(n) if n >= 1 && n <= names.length =>
            sortCol(col(names((n - 1).toInt)), si)
          case e => sortCol(compileExpr(e), si)
        }
      }: _*)
    }
    for (o <- sel.offset) df = df.offset(o.toInt)
    for (l <- sel.limit) df = df.limit(l.toInt)
    df
  }

  /** In aggregate context, references to lifted scalar-subquery helper
    * columns (`__sqN`, `__csqN_*`) must themselves aggregate — they are
    * constant per row (uncorrelated) or per correlation key (which PG
    * requires to be grouped), so `first()` is exact. Stops at CallSet
    * boundaries: refs already inside an aggregate need no wrapping. */
  private def firstWrapScalarHelpers(e: Expr): Expr = e match {
    case ColRef(Seq(nm)) if nm.startsWith("__sq") || nm.startsWith("__csq") =>
      CallSet("first", Seq(e))
    case _: CallSet => e
    case BinaryOp(op, l, r) =>
      BinaryOp(op, firstWrapScalarHelpers(l), firstWrapScalarHelpers(r))
    case UnaryOp(op, x) => UnaryOp(op, firstWrapScalarHelpers(x))
    case Call(fn, args) => Call(fn, args.map(firstWrapScalarHelpers))
    case CastExpr(x, t) => CastExpr(firstWrapScalarHelpers(x), t)
    case FieldAccess(x, f) => FieldAccess(firstWrapScalarHelpers(x), f)
    case CaseExpr(bs, o) => CaseExpr(
      bs.map { case (c, v) =>
        firstWrapScalarHelpers(c) -> firstWrapScalarHelpers(v) },
      o.map(firstWrapScalarHelpers))
    case InList(x, vs, n) =>
      InList(firstWrapScalarHelpers(x), vs.map(firstWrapScalarHelpers), n)
    case RowCtor(items) => RowCtor(items.map(firstWrapScalarHelpers))
    case InSubquery(x, s, n) => InSubquery(firstWrapScalarHelpers(x), s, n)
    case CallAnalytics(c, pb, ob, fr) =>
      // window args in agg context: operand aggregates are untouched
      // (CallSet stops recursion); bare helper refs inside get wrapped
      CallAnalytics(firstWrapScalarHelpers(c), pb.map(firstWrapScalarHelpers),
        ob.map(si => si.copy(e = firstWrapScalarHelpers(si.e))), fr)
    case other => other
  }

  /** Bottom-up expression rewrite. */
  private def rewriteExpr(e: Expr)(f: Expr => Expr): Expr = {
    val r: Expr = e match {
      case BinaryOp(op, l, x) => BinaryOp(op, rewriteExpr(l)(f), rewriteExpr(x)(f))
      case UnaryOp(op, x) => UnaryOp(op, rewriteExpr(x)(f))
      case Call(fn, args) => Call(fn, args.map(rewriteExpr(_)(f)))
      case CallSet(fn, args, d, s) => CallSet(fn, args.map(rewriteExpr(_)(f)), d, s)
      case CallAnalytics(c, pb, ob, fr) =>
        CallAnalytics(rewriteExpr(c)(f), pb.map(rewriteExpr(_)(f)),
          ob.map(si => si.copy(e = rewriteExpr(si.e)(f))), fr)
      case CastExpr(x, t) => CastExpr(rewriteExpr(x)(f), t)
      case FieldAccess(x, fld) => FieldAccess(rewriteExpr(x)(f), fld)
      case CaseExpr(bs, o) => CaseExpr(
        bs.map { case (c, v) => rewriteExpr(c)(f) -> rewriteExpr(v)(f) },
        o.map(rewriteExpr(_)(f)))
      case InList(x, vs, n) => InList(rewriteExpr(x)(f), vs.map(rewriteExpr(_)(f)), n)
      case RowCtor(items) => RowCtor(items.map(rewriteExpr(_)(f)))
      case InSubquery(x, s, n) => InSubquery(rewriteExpr(x)(f), s, n)
      case NamedWindowRef(b, n) => NamedWindowRef(rewriteExpr(b)(f), n)
      case IgnoreNulls(x) => IgnoreNulls(rewriteExpr(x)(f))
      case other => other
    }
    f(r)
  }

  // -------------------------------------------------------- recursive CTEs

  /** Apply a declared CTE column list: `WITH t(a, b) AS (...)`. */
  private def withDeclaredCols(df: DataFrame, name: String,
      declared: Seq[String]): DataFrame =
    if (declared.isEmpty) df
    else if (declared.length != df.columns.length)
      throw CompileException(s"CTE $name declares ${declared.length} columns " +
        s"but its body produces ${df.columns.length}")
    else df.toDF(declared: _*)

  /** How many times does `sel` read table `name` in FROM position?
    * (PG parity: a recursive arm may reference its CTE exactly once —
    * `t JOIN t` inside the arm would silently compute delta⋈delta under
    * working-table semantics, so it must be rejected, not mis-run.) */
  private def countFromRefs(sel: Select, name: String): Int = {
    def rel(r: Relation): Int = r match {
      case TableRef(None, t, _) => if (t.equalsIgnoreCase(name)) 1 else 0
      case TableRef(_, _, _) => 0
      case SubqueryRel(s, _) => countFromRefs(s, name)
      case SampleRel(c, _, _, _) => rel(c)
      case PivotRel(c, _, _, _) => rel(c)
      case UnpivotRel(c, _, _, _, _) => rel(c)
      case JoinRel(_, l, r2, _) => rel(l) + rel(r2)
      case TableFunctionRel(_, _, _, _, _) => 0
      case ValuesRel(_, _, _) => 0
    }
    if (sel.cte.exists(_._1.equalsIgnoreCase(name))) 0 // shadowed
    else sel.from.map(rel).sum +
      sel.setOps.map { case (_, s) => countFromRefs(s, name) }.sum
  }

  /** Does `sel` (or any nested select) read from table `name`? Drives
    * the WITH RECURSIVE classification of base vs recursive arms. An
    * inner CTE of the same name shadows the outer one (PG behavior), so
    * the walk stops there.
    *
    * With `exprSubqueryOnly` set, only references reached THROUGH an
    * expression-position subquery (scalar/IN/EXISTS/quantified — PG's
    * SubLink) count; bare FROM-position reads do not. PG rejects the
    * former inside a recursive term ("recursive reference ... must not
    * appear within a subquery", parse_cte.c) while permitting the
    * latter — the flag lets the recursion compiler make that exact
    * distinction. Once inside an expression subquery ANY reference
    * counts, so those cases recurse in normal mode. */
  private def selectReferences(sel: Select, name: String,
      exprSubqueryOnly: Boolean = false): Boolean = {
    def rel(r: Relation): Boolean = r match {
      case TableRef(None, t, _) =>
        !exprSubqueryOnly && t.equalsIgnoreCase(name)
      case TableRef(_, _, _) => false
      case SubqueryRel(s, _) => selectReferences(s, name, exprSubqueryOnly)
      case SampleRel(c, _, _, _) => rel(c)
      case PivotRel(c, agg, _, vs) =>
        rel(c) || expr(agg) || vs.exists(v => expr(v._1))
      case UnpivotRel(c, _, _, _, _) => rel(c)
      case JoinRel(_, l, r2, on) => rel(l) || rel(r2) || on.exists(expr)
      case TableFunctionRel(_, args, _, _, _) => args.exists(expr)
      case ValuesRel(_, _, _) => false
    }
    def expr(e: Expr): Boolean = e match {
      case ScalarSubquery(s) => selectReferences(s, name)
      case InSubquery(x, s, _) => expr(x) || selectReferences(s, name)
      case ExistsSubquery(s, _) => selectReferences(s, name)
      case QuantifiedCmp(_, x, s, _) => expr(x) || selectReferences(s, name)
      case BinaryOp(_, l, r) => expr(l) || expr(r)
      case UnaryOp(_, x) => expr(x)
      case Call(_, args) => args.exists(expr)
      case CallSet(_, args, _, _) => args.exists(expr)
      case CallAnalytics(c, pb, ob, _) =>
        expr(c) || pb.exists(expr) || ob.exists(si => expr(si.e))
      case NamedWindowRef(b, _) => expr(b)
      case IgnoreNulls(x) => expr(x)
      case CastExpr(x, _) => expr(x)
      case FieldAccess(x, _) => expr(x)
      case CaseExpr(bs, o) =>
        bs.exists { case (c, v) => expr(c) || expr(v) } || o.exists(expr)
      case InList(x, vs, _) => expr(x) || vs.exists(expr)
      case RowCtor(items) => items.exists(expr)
      case OuterTagged(x) => expr(x)
      case _ => false
    }
    if (sel.cte.exists(_._1.equalsIgnoreCase(name))) false // shadowed
    else sel.from.exists(rel) ||
      sel.items.exists { case ExprItem(e, _) => expr(e); case _ => false } ||
      sel.where.exists(expr) || sel.having.exists(expr) ||
      sel.qualify.exists(expr) ||
      sel.setOps.exists { case (_, s) =>
        selectReferences(s, name, exprSubqueryOnly) }
  }

  /** `WITH RECURSIVE name AS (base UNION [ALL] recursive)` — iterative
    * fixpoint with PostgreSQL semantics: the recursive term is re-run
    * with `name` bound to the *working table* (only the rows produced by
    * the previous iteration, not the whole accumulation), until an
    * iteration adds no rows. `UNION` deduplicates globally — each
    * iteration's rows are set-subtracted against everything seen so far
    * (which also terminates cyclic graphs); `UNION ALL` appends as-is.
    *
    * Scale shape: each iteration is one Spark job over the working
    * table (typically a frontier, small relative to the accumulation);
    * the delta is materialized through [[graft.Checkpoints]] so plan
    * lineage stays flat (a reliable checkpoint on a real cluster when
    * `graft.checkpoint.dir` is set). The final result is a flat union of
    * the materialized deltas — never re-written per iteration, so total
    * work is O(Σ|deltaᵢ|); under UNION the seen-before test is a
    * Bloom-pruned broadcast confirm (see the loop comment), so a
    * repeat-free recursion never rescans the accumulation and a cyclic
    * one pays one streamed (never shuffled) scan per iteration. The
    * driver holds only the delta-emptiness flag and the fixed-size
    * merged Bloom filter.
    *
    * The iteration cap (`graft.recursive.maxIterations`, default 1000)
    * turns a non-terminating recursion into a loud error instead of an
    * infinite loop. */
  private def compileRecursiveCte(name: String, declared: Seq[String],
      sub: Select, scope: Map[String, DataFrame]): DataFrame = {
    if (sub.setOps.isEmpty)
      throw CompileException(s"recursive CTE $name must be " +
        "'base UNION [ALL] recursive-term'")
    if (sub.orderBy.nonEmpty || sub.limit.nonEmpty || sub.offset.nonEmpty)
      throw CompileException(s"recursive CTE $name: ORDER BY/LIMIT/OFFSET " +
        "on the recursive union is not supported")
    val coreRefs = selectReferences(sub.copy(setOps = Nil), name)
    if (coreRefs)
      throw CompileException(s"recursive CTE $name: the non-recursive " +
        "(base) term may not reference the CTE")
    val (recArms, baseArms) = sub.setOps.partition {
      case (_, s) => selectReferences(s, name)
    }
    recArms.find { case (_, s) => countFromRefs(s, name) > 1 }.foreach { _ =>
      throw CompileException(s"recursive CTE $name: the recursive term " +
        "may reference the CTE only once (PG restriction — a self-join " +
        "of the working table would not mean what it looks like)")
    }
    // PG parity: a self-reference inside an expression subquery (scalar/
    // IN/EXISTS/quantified) of the recursive term would silently evaluate
    // against the working table (the current delta), not the CTE — reject
    // loudly like PG's "must not appear within a subquery" instead
    recArms.find { case (_, s) =>
      selectReferences(s, name, exprSubqueryOnly = true) }.foreach { _ =>
      throw CompileException(s"recursive CTE $name: recursive reference " +
        "must not appear within a subquery (PG restriction — it would " +
        "see only the working table, not the CTE)")
    }
    if (recArms.isEmpty) // plain self-less union; treat as ordinary CTE
      return withDeclaredCols(compileSelect(sub, scope), name, declared)
    val badOp = (recArms ++ baseArms).collect {
      case (op, _) if op != "union" && op != "union all" => op }
    if (badOp.nonEmpty)
      throw CompileException(s"recursive CTE $name: only UNION [ALL] may " +
        s"combine arms (got ${badOp.head})")
    val distinctMode = recArms.exists(_._1 == "union")

    // The recursive body's own inner WITH list (WITH RECURSIVE t AS
    // (WITH h AS (...) SELECT ... UNION ALL ...)) evaluates FIRST into a
    // child scope — PG accepts this shape; both the base term and every
    // recursive arm then compile against it. Inner CTEs cannot see the
    // recursive name (it is not bound yet), matching PG.
    val innerScope = sub.cte.foldLeft(scope) { case (sc, (cn, cs)) =>
      val decl = sub.cteCols.getOrElse(cn, Nil)
      val df =
        if (sub.cteRecursive && selectReferences(cs, cn))
          compileRecursiveCte(cn, decl, cs, sc)
        else withDeclaredCols(compileSelect(cs, sc), cn, decl)
      sc + (cn -> df)
    }

    val base0 = compileSelect(
      sub.copy(setOps = baseArms, cte = Nil, cteRecursive = false), innerScope)
    val base = withDeclaredCols(
      if (distinctMode) base0.distinct() else base0, name, declared)
    val outCols = base.columns.toSeq
    val baseTypes = base.schema.fields.map(_.dataType)

    val maxIters = spark.conf.get("graft.recursive.maxIterations", "1000").toInt
    var working = graft.Checkpoints.materialize(base)
    // acc is a flat union over MATERIALIZED deltas, grown once per
    // iteration — never re-built, never re-written (the leaves are
    // already computed, so referencing acc costs only their re-read)
    var acc = working
    var done = working.isEmpty
    var iter = 0
    // UNION-distinct bookkeeping: "seen before?" is adjudicated by a
    // driver-merged Bloom filter over a null-safe row hash plus an exact
    // confirm, NOT by `step.except(acc)` — except() re-shuffles and
    // re-aggregates the WHOLE accumulation every iteration (O(depth ×
    // total)). Here:
    //  - Bloom NEGATIVES are provably unseen (no false negatives) and
    //    never touch the accumulator at all — a repeat-free recursion
    //    (series walk) has flat per-iteration cost in |delta|;
    //  - Bloom positives (real repeats + ~1% FPs) pay one exact confirm:
    //    a streamed scan of acc against a BROADCAST hash of the small
    //    candidate set, then a broadcast anti-join back — acc is never
    //    shuffled, sorted, or re-aggregated. Hash collisions in the row
    //    hash are harmless: they only route a row through the exact
    //    confirm. Fixed Bloom sizing keeps per-delta filters mergeable.
    val bloomItems = 1L << 20
    def rowHashed(df: DataFrame): DataFrame =
      df.withColumn("__rh", xxhash64(outCols.map(col): _*))
    def nullSafeEq(l: DataFrame, r: DataFrame): Column =
      outCols.map(c => l(c) <=> r(c)).reduce(_ && _)
    var seenBloom: org.apache.spark.util.sketch.BloomFilter =
      if (distinctMode && !done)
        rowHashed(working).stat.bloomFilter("__rh", bloomItems, 0.01)
      else null
    while (!done) {
      iter += 1
      if (iter > maxIters)
        throw CompileException(s"recursive CTE $name exceeded " +
          s"$maxIters iterations (raise graft.recursive.maxIterations " +
          "if the recursion is genuinely this deep)")
      val stepScope = innerScope + (name -> working)
      val step0 = recArms.map { case (_, s) =>
        val armDf = compileSelect(s.copy(cteRecursive = false), stepScope)
        if (armDf.columns.length != outCols.length)
          throw CompileException(s"recursive CTE $name: recursive term " +
            s"produces ${armDf.columns.length} columns, base has " +
            s"${outCols.length}")
        // conform each arm to the BASE term's types (PG: the recursive
        // union is typed by the non-recursive term). Without this a
        // narrower arm type (e.g. int vs the base's bigint) would make
        // the row hash of a revisited value differ from the one the
        // Bloom filter recorded — a silently re-admitted duplicate.
        armDf.toDF(outCols: _*).select(outCols.zipWithIndex.map {
          case (c, i) => col(c).cast(baseTypes(i)).as(c) }: _*)
      }.reduce(_ union _)
      if (!distinctMode) {
        working = graft.Checkpoints.materialize(step0)
        done = working.isEmpty
      } else {
        val stepD = graft.Checkpoints.materialize(step0.distinct())
        val bc = spark.sparkContext.broadcast(seenBloom)
        val mightSeen = udf((h: Long) => bc.value.mightContainLong(h))
        val h = rowHashed(stepD)
        // ONE narrow job answers both "is the step empty?" and "how
        // many rows might be repeats?": a per-partition fold over the
        // projected row hash, probing the broadcast Bloom directly —
        // no exchange, no second emptiness probe. On a big cluster
        // (and equally on a tiny fixpoint like the mod-11 walk) the
        // per-iteration floor is driver ROUND-TRIPS, not data volume,
        // so the common no-repeat iteration pays exactly three
        // actions: the delta checkpoint, this fold, the Bloom build.
        val (nStep, nMaybe) = h.select(col("__rh")).queryExecution.toRdd
          .mapPartitions { it =>
            var n = 0L; var m = 0L
            it.foreach { r =>
              n += 1L
              if (bc.value.mightContainLong(r.getLong(0))) m += 1L
            }
            Iterator.single((n, m))
          }.fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
        if (nMaybe == 0) {
          // Bloom negatives are provably unseen: the whole delta is new
          // and stepD is already materialized — no confirm join, no
          // second checkpoint, no extra emptiness probe
          working = stepD
          done = nStep == 0
        } else {
          val maybe = graft.Checkpoints.materialize(
            h.filter(mightSeen(col("__rh"))).drop("__rh"))
          // broadcast gate in BYTES, not rows: schema.defaultSize is a
          // static per-row width proxy (underestimates long strings but
          // bounds the shape) — wide candidate rows fall back to the
          // shuffle anti-join instead of OOMing the driver on a forced
          // multi-GB broadcast
          val maybeBytes = nMaybe * math.max(maybe.schema.defaultSize, 1)
          val step =
            if (maybeBytes <= 64L * 1024 * 1024) {
              val reappeared = acc.join(broadcast(maybe),
                nullSafeEq(acc, maybe), "left_semi")
              val confirmedNew = maybe.join(broadcast(reappeared),
                nullSafeEq(maybe, reappeared), "left_anti")
              h.filter(!mightSeen(col("__rh"))).drop("__rh")
                .union(confirmedNew)
            } else
              // candidate set too big to broadcast (massive genuine
              // re-visitation): plain null-safe anti-join — still cheaper
              // than except(), which would also re-distinct acc
              stepD.join(acc, nullSafeEq(stepD, acc), "left_anti")
          working = graft.Checkpoints.materialize(step)
          done = working.isEmpty
        }
        bc.unpersist()
        if (!done)
          seenBloom.mergeInPlace(
            rowHashed(working).stat.bloomFilter("__rh", bloomItems, 0.01))
      }
      if (!done) acc = acc.union(working)
    }
    acc
  }

  // ------------------------------------------------------------- core select
  private def compileCore(sel00: Select, scope: Map[String, DataFrame]): DataFrame = {
    // Named windows (`WINDOW w AS (...)`) inline into their references
    // before anything else sees the tree — downstream window handling
    // is then identical to inline OVER (...).
    val sel0 = if (sel00.windows.isEmpty) sel00 else {
      def rw(e: Expr): Expr = rewriteExpr(e) {
        case NamedWindowRef(base, name) =>
          val d = sel00.windows.getOrElse(name, throw CompileException(
            s"window '$name' is not defined in the WINDOW clause"))
          CallAnalytics(base, d.partitionBy, d.orderBy, d.frame)
        case other => other
      }
      sel00.copy(
        items = sel00.items.map {
          case ExprItem(e, a) => ExprItem(rw(e), a)
          case w => w
        },
        qualify = sel00.qualify.map(rw),
        having = sel00.having.map(rw),
        orderBy = sel00.orderBy.map(si => si.copy(e = rw(si.e))))
    }
    // Scalar subqueries are lifted out of expressions into joins on FROM —
    // fully lazy and distributed, no driver collect:
    //  - uncorrelated: 1-row frame broadcast-cross-joined onto FROM;
    //  - correlated (equality correlation): decorrelated to a grouped
    //    aggregate left-joined on the correlation keys (one shuffle of the
    //    inner keyed by the correlation columns — the classic Kim/Neumann
    //    agg-decorrelation; TPC-H Q2/Q17 shape).
    var scalarJoins = Seq.empty[DataFrame => DataFrame]
    var scalarCount = 0
    // correlated-scalar helper tag → outer correlation key exprs (needed
    // to validate HAVING/agg use: the keys must be grouped, else the
    // joined value varies within a group)
    var csqOuterKeys = Map.empty[String, Seq[Expr]]
    def liftScalars(e: Expr): Expr = rewriteExpr(e) {
      case ScalarSubquery(sub) =>
        scalarCount += 1
        val n = scalarCount
        val correlated =
          try innerContext(sub, scope) match {
            case Some(ctx) =>
              sub.where.toSeq.flatMap(conjuncts).exists(c => !ctx.allInner(c))
            case None => false
          } catch {
            // inner FROM not compilable standalone (e.g. a table function
            // over an outer column) — correlated by construction; the
            // row-path lowering decides how to handle it
            case _: Exception => true
          }
        if (!correlated) {
          val df = compileSelect(sub, scope)
          if (df.columns.length != 1)
            throw CompileException("scalar subquery must return one column")
          val name = s"__sq$n"
          scalarJoins :+= ((f: DataFrame) => f.crossJoin(broadcast(df.toDF(name))))
          ColRef(Seq(name))
        } else {
          val (joinFn, replacement, outerKeys) =
            lowerCorrelatedScalar(sub, scope, n)
          scalarJoins :+= joinFn
          csqOuterKeys += (s"__csq$n" -> outerKeys)
          replacement
        }
      case other => other
    }
    val sel = sel0.copy(
      items = sel0.items.map {
        case ExprItem(e, a) => ExprItem(liftScalars(e), a)
        case w => w
      },
      where = sel0.where.map(liftScalars),
      having = sel0.having.map(liftScalars),
      qualify = sel0.qualify.map(liftScalars))

    // FROM: left-fold comma items as cross joins; join chains inside
    // (reference execute_from, _executor.py:336-368). WHERE conjuncts that
    // span sides need no manual promotion — Catalyst pushes predicates
    // into joins natively (PushPredicateThroughJoin).
    var from: DataFrame = null
    for (rel <- sel.from) {
      from =
        if (from == null) compileRelation(rel, scope)
        else rel match {
          case tf: TableFunctionRel if tf.lateral =>
            tableFunctions.compileLateral(from, tf, this)
          case _ => from.crossJoin(compileRelation(rel, scope))
        }
    }
    if (from == null) from = spark.range(1).select() // dual (SURVEY §1.1)

    // scalar-subquery joins add helper columns; a bare `*` must expand to
    // the pre-join column set, so isolate it behind a subquery alias
    // (skipped when a `t.*` is also present — those must see inner aliases)
    val starTag: Option[String] =
      if (scalarJoins.nonEmpty &&
          sel.items.exists { case Wildcard(None) => true; case _ => false } &&
          !sel.items.exists { case Wildcard(Some(_)) => true; case _ => false }) {
        existsCounter += 1
        Some(s"__base$existsCounter")
      } else None
    for (t <- starTag) from = from.alias(t)
    for (jf <- scalarJoins) from = jf(from)

    for (w <- sel.where) from = applyWhere(from, w, scope)

    // DISTINCT ON (exprs): keep the first row per key under ORDER BY —
    // Window.partitionBy + row_number = 1 (SURVEY §2.2's proposed mapping;
    // one shuffle on the key set)
    if (sel.distinctOn.nonEmpty) {
      val keys = sel.distinctOn.map(compileExpr)
      val order =
        if (sel.orderBy.nonEmpty) sel.orderBy.map(si => sortCol(compileExpr(si.e), si))
        else keys
      val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      from = from.withColumn("__don", row_number().over(w))
        .filter(col("__don") === 1).drop("__don")
    }

    val items = expandWildcards(sel.items, starTag)
    val hasAgg = items.exists(i => containsAgg(itemExpr(i))) ||
      sel.groupBy.nonEmpty || sel.having.exists(containsAgg)

    if (!hasAgg) compileProjection(from, items, sel)
    else compileAggregate(from, items, sel, csqOuterKeys)
  }

  private def itemExpr(i: SelectItem): Expr = i match {
    case ExprItem(e, _) => e
    case Wildcard(_) => IntLit(0)
  }

  // -------------------------------------------------------------- wildcards
  /** `*` and `t.*` become star ColRefs that Catalyst expands; a bare `*`
    * is qualified with the pre-scalar-join base alias when one exists. */
  private def expandWildcards(items: Seq[SelectItem],
      starTag: Option[String]): Seq[SelectItem] =
    items.map {
      case Wildcard(None) =>
        ExprItem(ColRef(starTag.toSeq :+ "*"), None)
      case Wildcard(Some(t)) => ExprItem(ColRef(Seq(t, "*")), None)
      case other => other
    }

  private def isStar(i: SelectItem): Boolean = i match {
    case ExprItem(ColRef(parts), None) => parts.last == "*"
    case _ => false
  }

  /** output naming (reference auto-aliasing _util.py:173-213:
    * explicit alias > source column name > function name > generated). */
  private def outName(i: SelectItem, idx: Int): String = i match {
    case ExprItem(_, Some(a)) => a
    case ExprItem(ColRef(parts), None) => parts.last
    case ExprItem(CallSet(fn, _, _, _), None) => fn
    case ExprItem(CallAnalytics(CallSet(fn, _, _, _), _, _, _), None) => fn
    case ExprItem(CallAnalytics(Call(fn, _), _, _, _), None) => fn
    case ExprItem(Call(fn, _), None) => fn
    case ExprItem(CastExpr(ColRef(parts), _), None) => parts.last
    case _ => s"_col$idx"
  }

  // ------------------------------------------------------------- projection
  private def compileProjection(from: DataFrame, items: Seq[SelectItem],
      sel: Select): DataFrame = {
    if (items.exists(isStar)) return compileStarProjection(from, items, sel)

    val names = items.zipWithIndex.map { case (i, k) => outName(i, k) }
    val compiled = items.zipWithIndex.map {
      case (ExprItem(e, _), k) => compileExpr(e).as(s"__out$k")
      case (Wildcard(_), _) => throw CompileException("unexpanded wildcard")
    }

    // ORDER BY resolution: ordinal / output name / arbitrary expression
    // (expressions ride along as hidden projection columns — legal because
    // non-output sort keys come from the same FROM frame)
    val hidden = Seq.newBuilder[Column]
    val specs: Seq[Column] =
      if (sel.setOps.nonEmpty) Nil
      else sel.orderBy.zipWithIndex.map { case (si, j) =>
        si.e match {
          case IntLit(n) if n >= 1 && n <= names.length =>
            sortCol(col(s"__out${n - 1}"), si)
          case ColRef(Seq(nm)) if names.contains(nm) =>
            sortCol(col(s"__out${names.indexOf(nm)}"), si)
          case e =>
            hidden += compileExpr(e).as(s"__ord$j")
            sortCol(col(s"__ord$j"), si)
        }
      }
    // QUALIFY: window predicate rides along as a hidden column (window
    // functions evaluate in the projection stage), filtered then dropped
    // — so DISTINCT below sees only output columns
    val qualCol = sel.qualify.map(q => compileExpr(q).as("__qualify"))
    val hiddenCols = hidden.result()

    var df = from.select(compiled ++ hiddenCols ++ qualCol.toSeq: _*)
    if (qualCol.isDefined) df = df.filter(col("__qualify")).drop("__qualify")
    if (sel.distinct) {
      if (hiddenCols.nonEmpty)
        throw CompileException(
          "for SELECT DISTINCT, ORDER BY expressions must appear in the select list")
      df = df.distinct()
    }
    if (specs.nonEmpty) df = df.orderBy(specs: _*)
    df.select(names.indices.map(k => col(s"__out$k")): _*).toDF(names: _*)
  }

  /** Projection containing `*` / `t.*` — column set is Catalyst-expanded,
    * so output renaming is skipped and sorts compile against the result. */
  private def compileStarProjection(from: DataFrame, items: Seq[SelectItem],
      sel: Select): DataFrame = {
    val cols = items.zipWithIndex.map {
      case (i @ ExprItem(e, _), k) =>
        val c = compileExpr(e)
        if (isStar(i)) c else c.as(outName(i, k))
      case (Wildcard(_), _) => throw CompileException("unexpanded wildcard")
    }
    // QUALIFY with star output: filter on the hidden window column, drop
    val qualCol = sel.qualify.map(q => compileExpr(q).as("__qualify"))
    var df = from.select(cols ++ qualCol.toSeq: _*)
    if (qualCol.isDefined) df = df.filter(col("__qualify")).drop("__qualify")
    if (sel.distinct) df = df.distinct()
    if (sel.orderBy.nonEmpty && sel.setOps.isEmpty) {
      val names = df.columns.toSeq
      df = df.orderBy(sel.orderBy.map { si =>
        si.e match {
          case IntLit(n) if n >= 1 && n <= names.length =>
            sortCol(col(names((n - 1).toInt)), si)
          case e => sortCol(compileExpr(e), si)
        }
      }: _*)
    }
    df
  }

  // -------------------------------------------------------------- aggregate
  private def compileAggregate(from: DataFrame, items: Seq[SelectItem],
      sel: Select, csqOuterKeys: Map[String, Seq[Expr]] = Map.empty): DataFrame = {
    val names = items.zipWithIndex.map { case (i, k) => outName(i, k) }
    val itemsE: Seq[Expr] = items.map {
      case ExprItem(e, _) => e
      case Wildcard(_) => throw CompileException("wildcards cannot appear with aggregates")
    }
    val aliasMap: Map[String, Expr] = items.zipWithIndex.collect {
      case (ExprItem(e, Some(a)), _) => a -> e
    }.toMap

    // normalize GROUP BY: ordinals, select-list aliases, expressions
    // (reference normalize_group_by, _executor.py:258-306). Source columns
    // shadow aliases, as in PG.
    val fromCols = from.columns.toSet
    val groupExprs: Seq[Expr] = sel.groupBy.map {
      case IntLit(n) =>
        if (n < 1 || n > itemsE.length)
          throw CompileException(s"GROUP BY position $n is out of range")
        itemsE((n - 1).toInt)
      case ColRef(Seq(name)) if !fromCols.contains(name) && aliasMap.contains(name) =>
        aliasMap(name)
      case e => e
    }
    val groupCols = groupExprs.map(compileExpr)

    // correlated scalar subqueries used in aggregate context (HAVING /
    // select items): their correlation keys must be grouping expressions
    // — otherwise the joined value varies within a group and first()
    // would pick one nondeterministically (PG rejects these queries too)
    if (csqOuterKeys.nonEmpty) {
      val used = scala.collection.mutable.Set.empty[String]
      def findHelpers(e: Expr): Unit = e match {
        case ColRef(Seq(nm)) if nm.startsWith("__csq") =>
          val cut = nm.indexOf("_a")
          used += (if (cut > 0) nm.take(cut) else nm)
        case BinaryOp(_, l, r) => findHelpers(l); findHelpers(r)
        case UnaryOp(_, x) => findHelpers(x)
        case Call(_, as) => as.foreach(findHelpers)
        case CallSet(_, as, _, _) => as.foreach(findHelpers)
        case CastExpr(x, _) => findHelpers(x)
        case FieldAccess(x, _) => findHelpers(x)
        case CaseExpr(bs, o) =>
          bs.foreach { case (c, v) => findHelpers(c); findHelpers(v) }
          o.foreach(findHelpers)
        case InList(x, vs, _) => findHelpers(x); vs.foreach(findHelpers)
        case _ => ()
      }
      (itemsE ++ sel.having ++ sel.orderBy.map(_.e)).foreach(findHelpers)
      for (tag <- used; keys <- csqOuterKeys.get(tag);
           k <- keys if !groupExprs.contains(k))
        throw CompileException(
          s"correlated scalar subquery in aggregate context requires its " +
            s"correlation key ($k) to appear in GROUP BY")
    }

    // Each select item compiles to one Column; Catalyst validates that
    // non-aggregate fragments are grouping expressions. This single step
    // replaces the reference's pre-agg/agg/post-agg projection split.
    //
    // Lifted scalar-subquery helper columns (__sqN / __csqN_*) are
    // per-row-constant join outputs, not grouping columns; in aggregate
    // context they are re-read through first() so e.g.
    // `HAVING sum(x) > (select ...)` aggregates cleanly.
    val itemCols = itemsE.zipWithIndex.map { case (e, k) =>
      compileExpr(firstWrapScalarHelpers(e)).as(s"__out$k")
    }
    val havingCol =
      sel.having.map(h => compileExpr(firstWrapScalarHelpers(h)).as("__having"))

    // agg-context ORDER BY: output refs use the projection; anything else
    // (e.g. `order by sum(x)` not in the list) becomes a hidden agg column
    val extras = Seq.newBuilder[Column]
    val specs: Seq[Column] =
      if (sel.setOps.nonEmpty) Nil
      else sel.orderBy.zipWithIndex.map { case (si, j) =>
        si.e match {
          case IntLit(n) if n >= 1 && n <= names.length =>
            sortCol(col(s"__out${n - 1}"), si)
          case ColRef(Seq(nm)) if names.contains(nm) =>
            sortCol(col(s"__out${names.indexOf(nm)}"), si)
          case e if itemsE.contains(e) =>
            sortCol(col(s"__out${itemsE.indexOf(e)}"), si)
          case e =>
            extras += compileExpr(firstWrapScalarHelpers(e)).as(s"__ord$j")
            sortCol(col(s"__ord$j"), si)
        }
      }

    val qualCol = sel.qualify.map(q =>
      compileExpr(firstWrapScalarHelpers(q)).as("__qualify"))
    val aggExprs = itemCols ++ havingCol.toSeq ++ qualCol.toSeq ++ extras.result()
    // multi-level aggregates: one pass producing every grouping level
    // (Spark expands to an Expand node — no per-level rescan)
    val grouped = sel.groupType match {
      case "rollup" => from.rollup(groupCols: _*)
      case "cube" => from.cube(groupCols: _*)
      case "sets" =>
        from.groupingSets(sel.groupingSets.map(_.map(compileExpr)), groupCols: _*)
      case _ =>
        if (groupCols.isEmpty) from.groupBy() else from.groupBy(groupCols: _*)
    }
    var df = grouped.agg(aggExprs.head, aggExprs.tail: _*)

    if (havingCol.isDefined) df = df.filter(col("__having"))
    if (qualCol.isDefined) df = df.filter(col("__qualify"))
    if (sel.distinct) df = df.dropDuplicates(names.indices.map(k => s"__out$k"))
    if (specs.nonEmpty) df = df.orderBy(specs: _*)
    df.select(names.indices.map(k => col(s"__out$k")): _*).toDF(names: _*)
  }

  private def sortCol(c: Column, si: SortItem): Column =
    si.nullsFirst match {
      case Some(true) => if (si.asc) c.asc_nulls_first else c.desc_nulls_first
      case Some(false) => if (si.asc) c.asc_nulls_last else c.desc_nulls_last
      case None => if (si.asc) c.asc else c.desc
    }

  // ------------------------------------------------------------------ WHERE
  /** Applies WHERE; lowers IN-subquery conjuncts to semi/anti joins —
    * the Spark-native decorrelation (only the key set shuffles). */
  /** Statement-path entry into the WHERE lowering: DML predicates get
    * the same IN/EXISTS subquery support as SELECT. */
  def filterWhere(df: DataFrame, w: Expr,
      scope: Map[String, DataFrame]): DataFrame = applyWhere(df, w, scope)

  private def applyWhere(from: DataFrame, w: Expr,
      scope: Map[String, DataFrame]): DataFrame = {
    var df = from
    val plain = Seq.newBuilder[Expr]
    for (c0 <- conjuncts(w)) {
      // normalize NOT EXISTS / NOT (x IN (...)) shapes
      val c = c0 match {
        case UnaryOp("not", ExistsSubquery(s, n)) => ExistsSubquery(s, !n)
        case UnaryOp("not", InSubquery(e, s, n)) => InSubquery(e, s, !n)
        case other => other
      }
      c match {
      case q: QuantifiedCmp =>
        df = lowerQuantified(df, q, negated = false, scope)
      case UnaryOp("not", q: QuantifiedCmp) =>
        df = lowerQuantified(df, q, negated = true, scope)
      case InSubquery(e, sub, negated) =>
        val rhs0 = compileSelect(sub, scope)
        val keys = e match {
          case RowCtor(items) => items
          case single => Seq(single)
        }
        if (rhs0.columns.length != keys.length)
          throw CompileException(
            s"IN (subquery) arity mismatch: ${keys.length} key(s) vs " +
              s"${rhs0.columns.length} subquery column(s)")
        val rhs = rhs0.toDF(keys.indices.map(i => s"__in_key$i"): _*)
        val how = if (negated) "left_anti" else "left_semi"
        val eq = keys.zipWithIndex
          .map { case (k, i) => compileExpr(k) === col(s"__in_key$i") }
          .reduce(_ && _)
        // NOT IN is three-valued (PG): a NULL key against a non-empty
        // set, or a non-matching key against a NULL-containing set, is
        // UNKNOWN → row filtered. The anti join expresses that with
        // `eq OR isnull(eq)` — a right row "blocks" the outer row when
        // the comparison is true OR unknown. This is exactly the shape
        // Spark's own NOT IN planning uses (null-aware anti join, which
        // the optimizer fast-paths for single-key broadcasts).
        val cond = if (negated) eq || eq.isNull else eq
        df = df.join(rhs, cond, how)
      case ExistsSubquery(sub, negated) =>
        df = lowerExists(df, sub, negated, scope)
      case other => plain += other
      }
    }
    val rest = plain.result()
    if (rest.isEmpty) df
    else df.filter(rest.map(compileExpr).reduce(_ && _))
  }

  // -------------------------------------------- correlated-subquery lowering

  /** AND-flattened conjuncts (reference flatten_ands, _util.py:388-392). */
  private def conjuncts(e: Expr): Seq[Expr] = e match {
    case BinaryOp("and", l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** every column reference in an expression (subquery nodes not entered —
    * their refs belong to deeper scopes). */
  private def collectColRefs(e: Expr): Seq[Seq[String]] = {
    val b = Seq.newBuilder[Seq[String]]
    rewriteExpr(e) { case c @ ColRef(p) => b += p; c; case other => other }
    b.result()
  }

  /** A subquery's own namespace (its FROM columns + relation aliases),
    * used for the origin analysis that splits correlated predicates —
    * the Spark-side analog of the reference's `determine_origin` lattice
    * (_util.py:395-453), applied to subqueries instead of join sides. */
  private final case class InnerCtx(inner: DataFrame, cols: Set[String],
      aliases: Set[String]) {
    /** SQL scoping: a bare ref matching an inner column binds to the
      * inner (innermost scope wins); a qualified ref binds by alias. */
    def isInnerRef(parts: Seq[String]): Boolean =
      if (parts.length >= 2) aliases.contains(parts.head)
      else cols.contains(parts.head)
    /** An expression containing an OuterTagged subtree references the
      * outer scope BY CONSTRUCTION (quantified-comparison desugar) — it
      * must become a join predicate regardless of name collisions. */
    def allInner(e: Expr): Boolean =
      !containsOuterTagged(e) && collectColRefs(e).forall(isInnerRef)
  }

  private def containsOuterTagged(e: Expr): Boolean = {
    var found = false
    rewriteExpr(e) { case o: OuterTagged => found = true; o; case x => x }
    found
  }

  private def relAliases(r: Relation): Set[String] = r match {
    case TableRef(_, n, a) => Set(a.getOrElse(n))
    case SubqueryRel(_, a) => a.toSet
    case ValuesRel(_, a, _) => a.toSet
    case SampleRel(child, _, _, _) => relAliases(child)
    case PivotRel(child, _, _, _) => relAliases(child)
    case UnpivotRel(child, _, _, _, _) => relAliases(child)
    case TableFunctionRel(f, _, a, _, _) => Set(a.getOrElse(f))
    case JoinRel(_, l, rr, _) => relAliases(l) ++ relAliases(rr)
  }

  /** Compile a subquery's FROM fold and namespace; None when FROM-less. */
  private def innerContext(sub: Select,
      scope: Map[String, DataFrame]): Option[InnerCtx] = {
    if (sub.from.isEmpty) return None
    var inner: DataFrame = null
    for (rel <- sub.from)
      inner = if (inner == null) compileRelation(rel, scope)
      else inner.crossJoin(compileRelation(rel, scope))
    Some(InnerCtx(inner, inner.columns.toSet, sub.from.flatMap(relAliases).toSet))
  }

  /** Rewrite inner-scope refs to `tag.col` so they resolve against the
    * aliased right side of a decorrelated join. */
  private def qualifyInner(e: Expr, tag: String, ctx: InnerCtx): Expr =
    rewriteExpr(e) {
      case ColRef(parts) if ctx.isInnerRef(parts) => ColRef(Seq(tag, parts.last))
      case other => other
    }

  /** Lower `x op ANY/ALL (sub)` onto the EXISTS decorrelation path with
    * exact SQL three-valued semantics in BOTH polarities (the filter
    * keeps rows where the predicate is TRUE; NOT keeps rows where it is
    * FALSE — unknown is filtered either way):
    *   ANY       ⟺ EXISTS s: (x op s) is true
    *   NOT ANY   ⟺ NOT EXISTS s: (x op s) is true or unknown
    *   ALL       ⟺ NOT EXISTS s: (x op s) is not true
    *   NOT ALL   ⟺ EXISTS s: (x op s) is false
    * The outer operand is wrapped in OuterTagged so origin analysis
    * binds its columns to the outer scope (capture hazard). */
  private def lowerQuantified(outer: DataFrame, q: QuantifiedCmp,
      negated: Boolean, scope: Map[String, DataFrame]): DataFrame = {
    val se = q.sub.items.head match {
      case ExprItem(e0, _) => e0
      case _ => throw CompileException(
        "quantified subquery must select exactly one column")
    }
    val xo = OuterTagged(q.x)
    val opC = BinaryOp(q.op, xo, se)
    def or(a: Expr, b: Expr) = BinaryOp("or", a, b)
    val nullDisjuncts = or(UnaryOp("is null", se), UnaryOp("is null", xo))
    def withConjunct(extra: Expr): Select =
      q.sub.copy(items = Seq(ExprItem(IntLit(1), None)),
        where = Some(q.sub.where.fold(extra)(w => BinaryOp("and", w, extra))),
        orderBy = Nil, distinct = false)
    (q.quant, negated) match {
      case ("all", false) =>
        lowerExists(outer, withConjunct(
          or(UnaryOp("not", opC), nullDisjuncts)), negated = true, scope)
      case ("all", true) =>
        lowerExists(outer, withConjunct(UnaryOp("not", opC)),
          negated = false, scope)
      case (_, false) =>
        lowerExists(outer, withConjunct(opC), negated = false, scope)
      case (_, true) =>
        lowerExists(outer, withConjunct(or(opC, nullDisjuncts)),
          negated = true, scope)
    }
  }

  /** Lower [NOT] EXISTS (select ... from inner where ...) to a left-semi
    * (anti) join. Decorrelation: inner-only conjuncts filter the inner
    * side *before* the join (only the filtered rows shuffle); everything
    * else — equalities, non-equi comparisons, arbitrary mixed predicates —
    * becomes the join condition, from which Catalyst extracts equi keys
    * for hash joins and leaves residuals as post-filters. An EXISTS with
    * no correlated conjunct degenerates to a semi join against LIMIT 1 of
    * the filtered inner (a non-emptiness probe, broadcast). */
  private def lowerExists(outer: DataFrame, sub: Select, negated: Boolean,
      scope: Map[String, DataFrame]): DataFrame = {
    val ctx = innerContext(sub, scope).getOrElse(
      throw CompileException("EXISTS subquery needs a FROM clause"))
    val (innerFilters, joinPreds) =
      sub.where.toSeq.flatMap(conjuncts).partition(ctx.allInner)

    // unique alias isolates inner columns from same-named outer ones
    existsCounter += 1
    val tag = s"__ex$existsCounter"
    var rhs = ctx.inner
    if (innerFilters.nonEmpty)
      rhs = rhs.filter(innerFilters.map(compileExpr).reduce(_ && _))
    val how = if (negated) "left_anti" else "left_semi"
    if (joinPreds.isEmpty)
      // uncorrelated: non-emptiness probe — one row broadcast
      outer.join(broadcast(rhs.limit(1).alias(tag)), lit(true), how)
    else {
      // Strip OuterTagged markers AFTER qualifyInner (the marker shields
      // its contents from inner qualification): bare refs whose names
      // collide with inner columns are bound against the outer plan via
      // Dataset.apply, so the join condition disambiguates; everything
      // else resolves by the usual alias rules (inner qualifiers are
      // shadowed by the unique `tag`).
      def bindOuter(p: Expr): Expr = rewriteExpr(p) {
        case OuterTagged(x) => rewriteExpr(x) {
          case r @ ColRef(Seq(n)) if ctx.cols.contains(n) =>
            scala.util.Try(ResolvedRef(outer(n))).getOrElse(r)
          case other => other
        }
        case other => other
      }
      val cond = joinPreds
        .map(p => compileExpr(bindOuter(qualifyInner(p, tag, ctx))))
        .reduce(_ && _)
      outer.join(rhs.alias(tag), cond, how)
    }
  }

  /** Decorrelate a correlated scalar subquery `(select AGG-EXPR from
    * inner where corr-conjuncts)` into a grouped aggregate left-joined on
    * the correlation keys: inner-only conjuncts pre-filter, equality
    * conjuncts outer-expr = inner-expr become groupBy keys + join keys,
    * aggregate calls become agg columns, and the returned expression is
    * the item expression over those columns (COUNT coalesced to 0 —
    * SQL's empty-group count). One shuffle of the filtered inner keyed
    * by the correlation columns; the join is a plain equi join Catalyst
    * plans freely (broadcast when the aggregated side is small). */
  private def lowerCorrelatedScalar(sub: Select, scope: Map[String, DataFrame],
      n: Int): (DataFrame => DataFrame, Expr, Seq[Expr]) = {
    val tag = s"__csq$n"
    if (sub.items.length != 1)
      throw CompileException("scalar subquery must return one column")
    if (sub.groupBy.nonEmpty || sub.orderBy.nonEmpty || sub.limit.nonEmpty ||
        sub.offset.nonEmpty || sub.distinct || sub.setOps.nonEmpty ||
        sub.cte.nonEmpty)
      throw CompileException(
        "correlated scalar subquery supports only SELECT <agg> FROM ... WHERE ...")
    val item = sub.items.head match {
      case ExprItem(e, _) => e
      case _ => throw CompileException("scalar subquery cannot select *")
    }
    if (!containsAgg(item))
      return lowerCorrelatedScalarRow(sub, scope, item, tag)

    val ctx =
      try innerContext(sub, scope).get
      catch {
        // inner FROM not compilable standalone (correlated table-function
        // args) — the row path owns that case and its empty-outer guard
        case _: Exception =>
          return lowerCorrelatedScalarRow(sub, scope, item, tag)
      }
    val innerFilters = Seq.newBuilder[Expr]
    val keys = Seq.newBuilder[(Expr, Expr)] // (outer side, inner side)
    for (c <- sub.where.toSeq.flatMap(conjuncts)) c match {
      case _ if ctx.allInner(c) => innerFilters += c
      case BinaryOp("=", l, r) if ctx.allInner(l) =>
        keys += (r -> l)
      case BinaryOp("=", l, r) if ctx.allInner(r) =>
        keys += (l -> r)
      case _ =>
        // non-equi / outer-only correlation: the grouped-aggregate
        // decorrelation can't key on it — take the general row-id path
        return lowerCorrelatedScalarRow(sub, scope, item, tag)
    }
    val keyList = keys.result()

    // aggregate calls → named agg columns; the rest of the item is
    // evaluated post-join over them
    var aggCols = Seq.empty[Column]
    val postExpr = rewriteExpr(item) {
      case cs @ CallSet(fn, _, _, _) =>
        val nm = s"${tag}_a${aggCols.length}"
        aggCols :+= compileAggCall(cs).as(nm)
        val ref: Expr = ColRef(Seq(nm))
        if (fn == "count") Call("coalesce", Seq(ref, IntLit(0))) else ref
      case other => other
    }

    var inner = ctx.inner
    val fs = innerFilters.result()
    if (fs.nonEmpty) inner = inner.filter(fs.map(compileExpr).reduce(_ && _))
    val keyCols = keyList.zipWithIndex.map { case ((_, ie), i) =>
      compileExpr(ie).as(s"${tag}_k$i")
    }
    val agg = inner.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
    val joinFn = (outer: DataFrame) =>
      outer.join(agg,
        keyList.zipWithIndex.map { case ((oe, _), i) =>
          compileExpr(oe) === col(s"${tag}_k$i")
        }.reduce(_ && _),
        "left")
    (joinFn, postExpr, keyList.map(_._1))
  }

  /** General correlated-scalar-subquery decorrelation by row id — the
    * path for what the grouped-aggregate decorrelation above cannot
    * express: non-aggregate items (PG row-subquery semantics: zero
    * matches → NULL, more than one → runtime error, exactly PG's
    * message) and arbitrary correlation conjuncts (non-equi,
    * outer-only, array-membership). Tag each outer row with a row id,
    * join the inner on the FULL predicate, aggregate per row id, join
    * the result back onto the INTACT outer — re-joining (vs pulling the
    * outer columns through the aggregate) keeps the outer's alias
    * qualifiers alive for the enclosing query's later clauses.
    *
    * This shuffles by row id, so the grouped-aggregate decorrelation
    * stays the fast path for big data; this path exists for PG parity —
    * psql's `\d` catalog introspection is its main caller. Bare inner
    * column refs are bound to the inner plan by expression id
    * (Dataset.apply), so outer/inner name collisions (pg_policy.oid vs
    * pg_roles.oid) resolve the way SQL scoping says: innermost wins. */
  private def lowerCorrelatedScalarRow(sub: Select,
      scope: Map[String, DataFrame], item: Expr,
      tag: String): (DataFrame => DataFrame, Expr, Seq[Expr]) = {
    val vName = s"${tag}_v"
    val cName = s"${tag}_c"
    val ctx =
      try innerContext(sub, scope).get
      catch {
        case e: Exception =>
          // The inner FROM does not compile standalone — a table function
          // over an outer column (psql's `FROM unnest(stxkeys) s(attnum)
          // JOIN …` / `unnest(tc.reloptions) x` shapes). Lower with the
          // correlated-generator variant instead.
          return lowerCorrelatedScalarGen(sub, scope, item, tag, e)
      }
    def bindInner(e: Expr): Expr = rewriteExpr(e) {
      case r @ ColRef(Seq(n)) if ctx.cols.contains(n) =>
        scala.util.Try(ResolvedRef(ctx.inner(n))).getOrElse(r)
      case other => other
    }
    val conds = sub.where.toSeq.flatMap(conjuncts).map(bindInner)

    // aggregate calls inside the item become per-row-id agg columns; a
    // non-aggregate item rides as any_value guarded by the match count
    var aggCols = Seq.empty[Column]
    val postExpr =
      if (containsAgg(item)) rewriteExpr(bindInner(item)) {
        case cs @ CallSet(fn, _, _, _) =>
          val nm = s"${tag}_a${aggCols.length}"
          aggCols :+= compileAggCall(cs).as(nm)
          val ref: Expr = ColRef(Seq(nm))
          if (fn == "count") Call("coalesce", Seq(ref, IntLit(0))) else ref
        case other => other
      } else {
        aggCols = Seq(any_value(compileExpr(bindInner(item))).as(vName),
          count(lit(1)).as(cName))
        Call("if", Seq(
          BinaryOp(">", ColRef(Seq(cName)), IntLit(1)),
          Call("raise_error", Seq(StringLit(
            "more than one row returned by a subquery used as an expression"))),
          ColRef(Seq(vName))))
      }

    val joinFn = (outer: DataFrame) => {
      val rid = s"${tag}_rid"
      // The row id is nondeterministic and the tagged frame is referenced
      // twice (match probe + join-back), so pin it with a LAZY local
      // checkpoint: both references then read the same materialized RDD
      // and the ids cannot diverge between the two subtrees.
      val o2 = outer.withColumn(rid, monotonically_increasing_id())
        .localCheckpoint(false)
      val cond = conds.map(compileExpr)
        .reduceOption(_ && _).getOrElse(lit(true))
      val matches = o2.join(ctx.inner, cond, "inner")
        .groupBy(col(rid))
        .agg(aggCols.head, aggCols.tail: _*)
      o2.join(matches, Seq(rid), "left").drop(rid)
    }
    (joinFn, postExpr, Seq.empty)
  }

  /** The correlated-GENERATOR variant of the row-id decorrelation: the
    * subquery's FROM contains a table function over an OUTER column
    * (`unnest(outer.arr)`) — not compilable as a standalone inner plan.
    * Each such relation becomes an `explode` over the tagged outer
    * (exactly FROM-unnest's inner-join-with-ordinality-less semantics:
    * empty/NULL arrays contribute zero rows); standalone relations
    * cross-join in and Catalyst re-plans the filter into proper joins.
    * Only INNER join trees flatten this way; anything else — or a
    * standalone relation that itself fails to compile — falls back to
    * the empty-outer guard: if the outer plan is a provably-empty
    * LocalRelation (the empty-by-construction catalog stubs), a NULL
    * item is exact since no row will ever evaluate it; otherwise the
    * original error is rethrown — never degrade a real query silently. */
  private def lowerCorrelatedScalarGen(sub: Select,
      scope: Map[String, DataFrame], item: Expr, tag: String,
      orig: Exception): (DataFrame => DataFrame, Expr, Seq[Expr]) = {
    val vName = s"${tag}_v"
    val cName = s"${tag}_c"
    def emptyGuard: (DataFrame => DataFrame, Expr, Seq[Expr]) = {
      val joinFn = (outer: DataFrame) => {
        import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        outer.queryExecution.optimizedPlan match {
          case l: LocalRelation if l.data.isEmpty =>
            outer.withColumn(vName, lit(null).cast("string"))
          case _ => throw orig
        }
      }
      (joinFn, ColRef(Seq(vName)), Seq.empty)
    }

    // flatten the FROM into relations + inner-join conditions
    val condsB = Seq.newBuilder[Expr]
    var flattenOk = true
    def flatten(r: Relation): Seq[Relation] = r match {
      case JoinRel("inner", l, rr, on) =>
        on match {
          case Some(Call("__natural" | "__using", _)) =>
            flattenOk = false; Seq(r)
          case other => other.foreach(condsB += _); flatten(l) ++ flatten(rr)
        }
      case other => Seq(other)
    }
    val rels = sub.from.flatMap(flatten)
    if (!flattenOk) return emptyGuard
    condsB ++= sub.where.toSeq.flatMap(conjuncts)

    // classify: standalone-compilable vs correlated unnest generators
    val parts: Seq[Either[(TableFunctionRel, String), DataFrame]] =
      rels.zipWithIndex.map { case (rel, i) =>
        try Right(compileRelation(rel, scope))
        catch {
          case _: Exception => rel match {
            case tf @ TableFunctionRel("unnest", Seq(_), _, _, _) =>
              Left(tf -> s"${tag}_u$i")
            case _ => return emptyGuard
          }
        }
      }
    val standaloneCols =
      parts.collect { case Right(df) => df.columns }.flatten.toSet

    // rewrite refs to a generator's output column onto its unique name:
    // `s.attnum` (alias-qualified) always; bare `x` only when no
    // standalone relation also exposes that name (SQL scoping would make
    // it ambiguous anyway)
    def renameGen(e: Expr): Expr = rewriteExpr(e) {
      case r @ ColRef(parts2) =>
        val hit = parts.collectFirst {
          case Left((tf, uname))
            if (parts2.length == 2 &&
                tf.alias.contains(parts2.head)) ||
              (parts2.length == 1 &&
                tf.aliasCols.headOption.orElse(tf.alias)
                  .contains(parts2.head) &&
                !standaloneCols.contains(parts2.head)) => uname
        }
        hit.fold(r: Expr)(u => ColRef(Seq(u)))
      case other => other
    }
    val conds = condsB.result().map(renameGen)

    var aggCols = Seq.empty[Column]
    val postExpr =
      if (containsAgg(item)) rewriteExpr(renameGen(item)) {
        case cs @ CallSet(fn, _, _, _) =>
          val nm = s"${tag}_a${aggCols.length}"
          aggCols :+= compileAggCall(cs).as(nm)
          val ref: Expr = ColRef(Seq(nm))
          if (fn == "count") Call("coalesce", Seq(ref, IntLit(0))) else ref
        case other => other
      } else {
        aggCols = Seq(any_value(compileExpr(renameGen(item))).as(vName),
          count(lit(1)).as(cName))
        Call("if", Seq(
          BinaryOp(">", ColRef(Seq(cName)), IntLit(1)),
          Call("raise_error", Seq(StringLit(
            "more than one row returned by a subquery used as an expression"))),
          ColRef(Seq(vName))))
      }

    val joinFn = (outer: DataFrame) => {
      val rid = s"${tag}_rid"
      val o2 = outer.withColumn(rid, monotonically_increasing_id())
        .localCheckpoint(false)
      var cur: DataFrame = o2
      parts.foreach {
        case Right(df) => cur = cur.crossJoin(df)
        case Left((tf, uname)) =>
          cur = cur.withColumn(uname, explode(compileExpr(tf.args.head)))
      }
      val cond = conds.map(compileExpr)
        .reduceOption(_ && _).getOrElse(lit(true))
      val matches = cur.filter(cond)
        .groupBy(col(rid))
        .agg(aggCols.head, aggCols.tail: _*)
      o2.join(matches, Seq(rid), "left").drop(rid)
    }
    (joinFn, postExpr, Seq.empty)
  }

  /** PIVOT/UNPIVOT child: the pivoted relation replaces its input's
    * identity, so a derived-table input needs no alias of its own. */
  private def pivotChild(r: Relation, scope: Map[String, DataFrame]): DataFrame =
    r match {
      case SubqueryRel(sub, None) => compileSelect(sub, scope)
      case other => compileRelation(other, scope)
    }

  // -------------------------------------------------------------- relations
  def compileRelation(rel: Relation, scope: Map[String, DataFrame]): DataFrame =
    rel match {
      case TableRef(schemaOpt, name, alias) =>
        val base = schemaOpt.map(_.toLowerCase) match {
          // explicit catalog schemas resolve to the synthesized catalogs
          // even if a scope table shares the name (PG resolution order)
          case Some("pg_catalog") | Some("information_schema") =>
            builtinTable(schemaOpt.map(_.toLowerCase), name, scope).getOrElse(
              throw CompileException(
                s"table '${schemaOpt.get}.$name' not found"))
          case _ => scope.getOrElse(name,
            builtinTable(None, name, scope).getOrElse(
              throw CompileException(s"table '$name' not found in scope")))
        }
        val aliased = base.alias(alias.getOrElse(name))
        // statistics → plan choice: an ANALYZEd table whose MEASURED size
        // fits the session broadcast budget is hinted broadcast here, so
        // joins against it skip the shuffle entirely — covering the two
        // cases Catalyst's static estimate gets wrong (computed CTAS
        // views with product-propagated sizes, and small parquet files
        // dominated by footer overhead). The hint is only attached where
        // stats exist; Catalyst ignores it in positions where a
        // broadcast build side would be illegal (e.g. the preserved side
        // of an outer join), so attaching at the ref is safe.
        statsFor(name) match {
          case Some(st) if {
            val t = broadcastThreshold; t > 0 && st.sizeBytes <= t
          } => broadcast(aliased)
          case _ => aliased
        }
      case SubqueryRel(sub, alias) =>
        val a = alias.getOrElse(
          throw CompileException("subqueries need to be named"))
        compileSelect(sub, scope).alias(a)
      case SampleRel(child, method, pct, seed) =>
        // SYSTEM (block sampling) has different semantics and performance
        // — rejecting beats silently substituting row-level Bernoulli
        if (method != "bernoulli")
          throw CompileException(
            s"unsupported TABLESAMPLE method '$method' (only BERNOULLI)")
        val df = compileRelation(child, scope)
        if (pct < 0 || pct > 100)
          throw CompileException("TABLESAMPLE percentage must be in [0, 100]")
        seed match {
          case Some(s) =>
            // deterministic row-hash Bernoulli: reproducible across runs
            // AND task retries (Spark's native sample is neither when
            // partitions change); a narrow codegen'd filter at the scan
            df.filter(
              pmod(xxhash64(lit(s), struct(df.columns.map(col): _*)),
                lit(1000000L)) < lit(math.round(pct * 10000)))
          case None => df.sample(pct / 100.0)
        }
      case PivotRel(child, agg, forCol, values) =>
        // Spark-native pivot with an EXPLICIT value list: no
        // distinct-values discovery job, and the output schema is known
        // at compile time — the shape that scales (one hash aggregation,
        // map-side partials per pivot cell).
        val df = pivotChild(child, scope)
        val cs = agg match {
          case c: CallSet => c
          case Call(fn, args) => CallSet(fn, args)
          case _ => throw CompileException(
            "PIVOT expects a single aggregate function call")
        }
        def pivotLit(e: Expr): Any = e match {
          case IntLit(n) => n
          case FloatLit(f) => f
          case StringLit(s) => s
          case UnaryOp("-", IntLit(n)) => -n
          case UnaryOp("-", FloatLit(f)) => -f
          case _ => throw CompileException(
            "PIVOT IN values must be literals")
        }
        val aggRefs = cs.args.flatMap(collectColRefs)
          .map(_.last.toLowerCase).toSet
        val forName = forCol.parts.last
        if (!df.columns.exists(_.equalsIgnoreCase(forName)))
          throw CompileException(s"PIVOT column '$forName' not found")
        // implicit grouping: every child column not consumed by the
        // aggregate or the FOR column (Spark SQL PIVOT semantics)
        val groupCols = df.columns.filterNot(c =>
          c.equalsIgnoreCase(forName) || aggRefs.contains(c.toLowerCase))
        val pivoted = df.groupBy(groupCols.map(col).toSeq: _*)
          .pivot(forName, values.map(v => pivotLit(v._1)))
          .agg(compileAggCall(cs))
        val outNames = groupCols.toSeq ++ values.map { case (v, n) =>
          n.getOrElse(pivotLit(v).toString) }
        pivoted.toDF(outNames: _*)
      case UnpivotRel(child, valueCol, nameCol, colSpecs, includeNulls) =>
        val df = pivotChild(child, scope)
        val melted = colSpecs.map { case (c, label) =>
          val cn = c.parts.last
          df.columns.find(_.equalsIgnoreCase(cn)).getOrElse(
            throw CompileException(s"UNPIVOT column '$cn' not found"))
          (cn, label.getOrElse(cn))
        }
        val ids = df.columns.filterNot(c =>
          melted.exists(_._1.equalsIgnoreCase(c)))
        // a narrow Expand (one output row per listed column) — no
        // shuffle; the label is the value column's output name
        val un = df.unpivot(
          ids.map(col),
          melted.map { case (cn, label) => col(cn).as(label) }.toArray,
          nameCol, valueCol)
        if (includeNulls) un else un.filter(col(valueCol).isNotNull)
      case ValuesRel(rows, alias, columns) =>
        // one single-row projection per tuple, unioned — Catalyst folds
        // this to a LocalRelation (type-coercing across rows), so no jobs
        // run; VALUES is driver-literal by construction
        if (rows.isEmpty) throw CompileException("VALUES needs at least one row")
        val arity = rows.head.length
        if (rows.exists(_.length != arity))
          throw CompileException("VALUES rows differ in arity")
        val names =
          if (columns.nonEmpty) {
            if (columns.length != arity)
              throw CompileException(
                s"VALUES has $arity columns but ${columns.length} names")
            columns
          } else (1 to arity).map(i => s"column$i") // PG default names
        val df = rows.map { r =>
          spark.range(1).select(r.zip(names).map { case (e, n) =>
            compileExpr(e).as(n)
          }: _*)
        }.reduce(_ unionAll _)
        alias.fold(df)(df.alias)
      case tf @ TableFunctionRel(_, _, _, lateral, _) =>
        if (lateral)
          throw CompileException("LATERAL requires a preceding FROM item")
        else tableFunctions.compile(tf, this, scope)
      case JoinRel(how, l, r, on) =>
        val left = compileRelation(l, scope)
        r match {
          case tf: TableFunctionRel if tf.lateral =>
            tableFunctions.compileLateral(left, tf, this)
          case _ =>
            val right = compileRelation(r, scope)
            (how, on) match {
              case ("cross", _) => left.crossJoin(right)
              case (_, Some(Call("__natural", _))) =>
                // NATURAL JOIN: USING over all shared column names
                val shared = left.columns.filter(right.columns.contains(_)).toSeq
                if (shared.isEmpty)
                  throw CompileException(
                    "NATURAL JOIN has no common columns; use CROSS JOIN")
                left.join(right, shared,
                  if (how == "full") "full_outer" else how)
              case (_, Some(Call("__using", cols))) =>
                // USING (a, b): equi-join with shared columns coalesced
                left.join(right,
                  cols.map { case ColRef(Seq(c)) => c
                             case other => throw CompileException(
                               s"bad USING column $other") },
                  if (how == "full") "full_outer" else how)
              case (_, Some(cond)) => left.join(right, compileExpr(cond),
                if (how == "full") "full_outer" else how)
              case (_, None) => left.crossJoin(right)
            }
        }
    }

  /** Session-stable relation OIDs: assigned at first reference, never
    * reused — psql resolves a name to an OID in one query and reads
    * pg_attribute by that OID in the next, so the mapping must hold
    * across statements within a session (scope growth cannot shift
    * already-assigned values). */
  private val relationOids =
    scala.collection.mutable.LinkedHashMap.empty[String, Long]
  private def oidOf(name: String): Long = relationOids.synchronized {
    relationOids.getOrElseUpdate(name, 16384L + relationOids.size)
  }

  /** Declared primary keys: table → (constraint name, columns).
    * Metadata only — reflected via pg_index/pg_constraint so JDBC
    * getPrimaryKeys reports them; dropped when the table is rebound. */
  private val primaryKeys =
    scala.collection.mutable.LinkedHashMap.empty[String, (String, Seq[String])]
  def declarePrimaryKey(table: String, conname: String,
      cols: Seq[String]): Unit =
    primaryKeys.synchronized { primaryKeys(table) = (conname, cols) }
  def dropPrimaryKey(table: String): Unit =
    primaryKeys.synchronized { primaryKeys.remove(table) }
  def primaryKeyOf(table: String): Option[(String, Seq[String])] =
    primaryKeys.synchronized { primaryKeys.get(table) }

  /** Declared foreign keys: table → (constraint name, local column,
    * referenced table, referenced column), single-column. Metadata only,
    * like primary keys; dropped with either side's rebind. */
  private val foreignKeys = scala.collection.mutable.LinkedHashMap
    .empty[String, Seq[(String, String, String, String)]]
  def declareForeignKey(table: String, conname: String, col: String,
      refTable: String, refCol: String): Unit =
    foreignKeys.synchronized {
      foreignKeys(table) =
        foreignKeys.getOrElse(table, Nil).filterNot(_._1 == conname) :+
          ((conname, col, refTable, refCol))
    }
  /** Every declared FK touching any of `tables` on either side, as
    * (declaring table, constraint, column, referenced table, referenced
    * column) — what OPTIMIZE snapshots before its rebinds (which drop
    * keys) and re-declares after (content is preserved by contract, so
    * the declarations still describe the data). */
  def foreignKeysInvolving(tables: Set[String])
      : Seq[(String, String, String, String, String)] =
    foreignKeys.synchronized {
      foreignKeys.toSeq.flatMap { case (t, fks) =>
        fks.collect { case (cn, c, rt, rc) if tables(t) || tables(rt) =>
          (t, cn, c, rt, rc) }
      }
    }

  def dropForeignKeysOf(table: String): Unit = foreignKeys.synchronized {
    foreignKeys.remove(table)
    // FKs REFERENCING the rebound/dropped table are stale too
    foreignKeys.mapValuesInPlace { case (_, fks) =>
      fks.filterNot(_._3 == table)
    }
    foreignKeys.filterInPlace { case (_, fks) => fks.nonEmpty }
  }

  // Live definition printers over the declared keys: psql's `\d table`
  // renders its "Indexes:" section from pg_get_indexdef(indexrelid) and
  // the constraint line from pg_get_constraintdef(conoid). The closures
  // read the key map at COMPILE time of each query (a CASE chain over
  // the declared set), so mid-session ALTER TABLE is reflected without
  // re-registration; with no keys declared they collapse to the old
  // NULL stubs.
  registry.register("pg_get_indexdef", { args =>
    val defs = primaryKeys.synchronized { primaryKeys.toSeq }
    defs.foldLeft(lit(null).cast("string")) {
      case (acc, (t, (conname, cols))) =>
        when(args.head.cast("long") === oidOf(conname),
          lit(s"CREATE UNIQUE INDEX $conname ON public.$t " +
            s"USING btree (${cols.mkString(", ")})")).otherwise(acc)
    }
  })
  registry.register("pg_get_constraintdef", { args =>
    val pkDefs = primaryKeys.synchronized { primaryKeys.toSeq }
    val fkDefs = foreignKeys.synchronized { foreignKeys.toSeq }
    val withPk = pkDefs.foldLeft(lit(null).cast("string")) {
      case (acc, (_, (conname, cols))) =>
        when(args.head.cast("long") === oidOf(conname + "$con"),
          lit(s"PRIMARY KEY (${cols.mkString(", ")})")).otherwise(acc)
    }
    fkDefs.flatMap(_._2).foldLeft(withPk) {
      case (acc, (conname, c, rt, rc)) =>
        when(args.head.cast("long") === oidOf(conname + "$con"),
          lit(s"FOREIGN KEY ($c) REFERENCES $rt($rc)")).otherwise(acc)
    }
  })

  /** Built-in catalog tables (reference _pandas.py:103-116 ships only
    * pg_namespace; the full reflection surface — pg_class, pg_attribute,
    * pg_type, information_schema — is what `psql \dt`/`\d` and JDBC
    * metadata need, synthesized from the live scope in [[PgCatalog]]). */
  private def builtinTable(schema: Option[String], name: String,
      scope: Map[String, DataFrame]): Option[DataFrame] = {
    // deterministic OID assignment order regardless of Map iteration
    val sorted = scope.toSeq.sortBy(_._1)
    val pks = primaryKeys.synchronized { primaryKeys.toMap }
    val fks = foreignKeys.synchronized { foreignKeys.toMap }
    schema match {
      case Some("information_schema") =>
        PgCatalog.infoSchemaTable(spark, name, sorted, pks, fks)
      case _ => PgCatalog.catalogTable(spark, name, sorted, oidOf, pks, fks)
    }
  }

  // ------------------------------------------------------------ expressions
  private def containsAgg(e: Expr): Boolean = e match {
    case _: CallSet => true
    // a window call is NOT itself a group aggregate (sum(v) OVER (...) is
    // a window function) — but group aggregates may appear in its
    // partition/order operands (`rank() over (order by sum(v))`, legal in
    // PG and in Spark's Aggregate analyzer)
    case CallAnalytics(c, pb, ob, _) =>
      pb.exists(containsAgg) || ob.exists(si => containsAgg(si.e)) ||
        (c match {
          case CallSet(_, args, _, _) => args.exists(containsAgg)
          case other => containsAgg(other)
        })
    case BinaryOp(_, l, r) => containsAgg(l) || containsAgg(r)
    case UnaryOp(_, x) => containsAgg(x)
    case Call(_, args) => args.exists(containsAgg)
    case CastExpr(x, _) => containsAgg(x)
    case FieldAccess(x, _) => containsAgg(x)
    case CaseExpr(bs, o) =>
      bs.exists { case (c, v) => containsAgg(c) || containsAgg(v) } ||
        o.exists(containsAgg)
    case InList(x, vs, _) => containsAgg(x) || vs.exists(containsAgg)
    case RowCtor(items) => items.exists(containsAgg)
    case _ => false
  }

  private def quoted(parts: Seq[String]): String =
    parts.map(p => if (p == "*") p else s"`$p`").mkString(".")

  /** When true, column refs compile as lateral outer references (used for
    * the correlated arguments of LATERAL table functions). */
  private var markOuter = false
  private var existsCounter = 0

  /** Compile an expression whose column refs resolve against the LEFT side
    * of a lateral join (Spark 4 `Column.outer()`). */
  def compileExprOuter(e: Expr): Column = {
    markOuter = true
    try compileExpr(e) finally markOuter = false
  }

  def compileExpr(e: Expr): Column = e match {
    case ColRef(parts) =>
      // schema.table.col → table.col (schemas are a single flat namespace,
      // like the reference's normalize_col_ref, _util.py:84-117)
      val eff = if (parts.length > 2) parts.takeRight(2) else parts
      val c = col(quoted(eff))
      if (markOuter) c.outer() else c
    case ResolvedRef(c) => c.asInstanceOf[Column]
    // a marker that reaches expression compilation unprocessed (e.g. a
    // quantified comparison in a context without decorrelation) compiles
    // as its payload — outer binding is the enclosing scope's default
    case OuterTagged(x) => compileExpr(x)
    case _: QuantifiedCmp => throw CompileException(
      "quantified comparison (ANY/SOME/ALL) is only supported as a " +
        "top-level WHERE condition")
    case IntLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case StringLit(v) => lit(v)
    case BoolLit(v) => lit(v)
    case NullLit => lit(null)

    case BinaryOp(op, l, r) =>
      val (cl, cr) = (compileExpr(l), compileExpr(r))
      // PG array-literal strings ('{...}') against array columns compare
      // on the string rendering: the string side is unchanged (identity
      // cast), and an array operand — which would otherwise fail analysis
      // outright — renders and compares instead (psql probes
      // `polroles = '{0}'` against catalog arrays this way)
      def braceLit(e: Expr) = e match {
        case StringLit(s) => s.startsWith("{") && s.endsWith("}")
        case _ => false
      }
      op match {
        case "=" if braceLit(l) || braceLit(r) =>
          cl.cast("string") === cr.cast("string")
        case "!=" if braceLit(l) || braceLit(r) =>
          cl.cast("string") =!= cr.cast("string")
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        case "/" => cl / cr
        case "%" => cl % cr
        case "^" => pow(cl, cr) // POWER in this dialect, not XOR (§2.9)
        // raw Concat: TypeCoercion casts mixed scalars to string (PG text
        // ||) and keeps array||array as ARRAY concatenation (PG array ||).
        // NULL propagates — `||` is strict, unlike PG's concat() function
        case "||" => concat(cl, cr)
        case "&" => cl.bitwiseAND(cr)
        case "|" => cl.bitwiseOR(cr)
        case "#" => cl.bitwiseXOR(cr)
        case "<<" => call_function("shiftleft", cl, cr)
        case ">>" => call_function("shiftright", cl, cr)
        case "=" => cl === cr
        case "!=" => cl =!= cr
        case "<=>" => cl <=> cr
        case "<" => cl < cr
        case ">" => cl > cr
        case "<=" => cl <= cr
        case ">=" => cl >= cr
        case "and" => cl && cr
        case "or" => cl || cr
        case "like" => call_function("like", cl, cr)
        case "not like" => !call_function("like", cl, cr)
        case "ilike" => call_function("ilike", cl, cr)
        case "not ilike" => !call_function("ilike", cl, cr)
        // PG regex-match operators (find-anywhere semantics, same as
        // Spark's rlike); `*` variants are case-insensitive
        case "~" => call_function("rlike", cl, cr)
        case "!~" => !call_function("rlike", cl, cr)
        case "~*" => call_function("rlike", cl, concat(lit("(?i)"), cr))
        case "!~*" => !call_function("rlike", cl, concat(lit("(?i)"), cr))
        case other => throw CompileException(s"unsupported operator '$other'")
      }

    case UnaryOp(op, x) =>
      val cx = compileExpr(x)
      op match {
        case "-" => negate(cx)
        case "not" => !cx
        case "~" => bitwise_not(cx)
        case "is null" => cx.isNull
        case "is not null" => cx.isNotNull
        case other => throw CompileException(s"unsupported unary '$other'")
      }

    case CastExpr(x, ty) => compileCast(compileExpr(x), ty)

    case FieldAccess(x, f) => compileExpr(x).getField(f)

    case CaseExpr(branches, otherwise) =>
      val whens = branches.foldLeft(Option.empty[Column]) {
        case (None, (c, v)) => Some(when(compileExpr(c), compileExpr(v)))
        case (Some(acc), (c, v)) => Some(acc.when(compileExpr(c), compileExpr(v)))
      }.getOrElse(throw CompileException("CASE needs at least one WHEN"))
      otherwise match {
        case Some(o) => whens.otherwise(compileExpr(o))
        case None => whens
      }

    case RowCtor(items) => struct(items.map(compileExpr): _*)
    case InList(x, vs, negated) =>
      val cx = compileExpr(x)
      val in = vs.map(v => cx === compileExpr(v)).reduce(_ || _)
      if (negated) !in else in

    case Call("interval", Seq(StringLit(s))) => expr(s"INTERVAL '$s'")
    case Call(fn, args) => registry(fn, args.map(compileExpr))

    case cs: CallSet => compileAggCall(cs)

    case CallAnalytics(base0, partitionBy, orderBy, frame) =>
      val base = base0 match {
        case IgnoreNulls(inner) =>
          def arg(args: Seq[Expr], i: Int): Column = compileExpr(args(i))
          def litInt(e: Expr): Int = e match {
            case IntLit(n) => n.toInt
            case UnaryOp("-", IntLit(n)) => -n.toInt
            case _ => throw CompileException(
              "IGNORE NULLS lag/lead/nth_value need a literal offset")
          }
          val fn = inner match {
            case Call(f, _) => f
            case CallSet(f, _, _, _) => f
            case _ => throw CompileException(
              "IGNORE NULLS applies to a window function call")
          }
          val args = inner match {
            case Call(_, as) => as
            case CallSet(_, as, _, _) => as
            case _ => Nil
          }
          (fn, args.length) match {
            case ("first_value" | "last_value" | "any_value", 1) =>
              call_function(fn, arg(args, 0), lit(true))
            case ("nth_value", 2) =>
              nth_value(arg(args, 0), litInt(args(1)), ignoreNulls = true)
            case ("lag", n) if n >= 1 && n <= 3 =>
              lag(arg(args, 0), if (n >= 2) litInt(args(1)) else 1,
                if (n == 3) arg(args, 2) else null, ignoreNulls = true)
            case ("lead", n) if n >= 1 && n <= 3 =>
              lead(arg(args, 0), if (n >= 2) litInt(args(1)) else 1,
                if (n == 3) arg(args, 2) else null, ignoreNulls = true)
            case _ => throw CompileException(
              s"IGNORE NULLS is not supported for $fn/${args.length}")
          }
        case cs: CallSet => compileAggCall(cs)
        case Call(fn @ ("lag" | "lead" | "ntile"), args) =>
          // Spark's offset window functions require an IntegerType
          // offset/bucket count; the dialect's integer literals are
          // BIGINT, and a LongType offset makes Lead/Lag's implicit
          // frame fail resolution with the misleading "Cannot specify
          // window frame" error. Cast the offset argument down.
          val compiled = args.map(compileExpr)
          val fixed =
            if (fn == "ntile") compiled.map(_.cast("int"))
            else compiled.zipWithIndex.map {
              case (c, 1) => c.cast("int")
              case (c, _) => c
            }
          registry(fn, fixed)
        case Call(fn, args) => registry(fn, args.map(compileExpr))
        case other => compileExpr(other)
      }
      var w = Window.partitionBy(partitionBy.map(compileExpr): _*)
      if (orderBy.nonEmpty)
        w = w.orderBy(orderBy.map(si => sortCol(compileExpr(si.e), si)): _*)
      for (f <- frame) {
        def b(v: Option[Long], start: Boolean): Long = v match {
          case None => if (start) Window.unboundedPreceding else Window.unboundedFollowing
          case Some(x) => x
        }
        w = if (f.kind == "rows") w.rowsBetween(b(f.start, start = true), b(f.end, start = false))
        else w.rangeBetween(b(f.start, start = true), b(f.end, start = false))
      }
      base.over(w)

    case NamedWindowRef(_, name) =>
      throw CompileException(
        s"window '$name' is not defined in the WINDOW clause")
    case ScalarSubquery(_) =>
      throw CompileException("scalar subqueries in expressions are not supported")
    case InSubquery(_, _, _) | ExistsSubquery(_, _) =>
      throw CompileException(
        "IN/EXISTS subqueries are only supported as top-level WHERE conjuncts")
  }

  private def compileAggCall(cs: CallSet): Column = cs match {
    case CallSet("count", _, _, true) => count(lit(1))
    case CallSet(fn, _, _, true) =>
      throw CompileException(s"$fn(*) is not supported")
    case CallSet("count", args, true, _) =>
      count_distinct(compileExpr(args.head), args.tail.map(compileExpr): _*)
    case CallSet("sum", Seq(a), true, _) => sum_distinct(compileExpr(a))
    case CallSet("avg", Seq(a), true, _) =>
      sum_distinct(compileExpr(a)) / count_distinct(compileExpr(a))
    case CallSet(fn, _, true, _) =>
      throw CompileException(s"DISTINCT is not supported for $fn")
    case CallSet(fn, args, false, _) =>
      val mapped = fn match {
        case "every" => "bool_and"
        case "collect" => "collect_list"
        case "stddev" => "stddev_samp"
        case "variance" => "var_samp"
        // dialect alias: first_value as an AGGREGATE (the bare name is
        // reserved for the window function by the grammar)
        case "first_value_agg" => "first_value"
        case other => other
      }
      call_function(mapped, args.map(compileExpr): _*)
  }

  private def compileCast(c: Column, ty: String): Column = {
    val base = ty.takeWhile(_ != '(')
    base match {
      case "varchar" | "text" | "char" | "string" => c.cast("string")
      // PG object-identifier types: rendered as text / bigint — enough
      // for the catalog queries psql and JDBC issue (::regclass names
      // would need a reverse OID lookup; clients only display them)
      case "regtype" | "regclass" | "regnamespace" | "name" => c.cast("string")
      case "oid" => c.cast("long")
      case "json" => c.cast("string") // raw-text JSON representation (Json.scala)
      case "int" | "integer" | "int4" => c.cast("int")
      case "bigint" | "int8" => c.cast("long")
      case "smallint" | "int2" => c.cast("short")
      case "float" | "float8" | "double" => c.cast("double")
      case "real" | "float4" => c.cast("float")
      case "decimal" | "numeric" => c.cast(ty.replace("numeric", "decimal"))
      case "boolean" | "bool" => c.cast("boolean")
      case "date" => c.cast("date")
      case "timestamp" => c.cast("timestamp")
      case other => throw CompileException(s"unsupported cast target '$other'")
    }
  }
}
