package graft.ast

/** AST for the PostgreSQL-flavored dialect of the reference engine
  * (node inventory: reference src/framequery/parser/ast.py:8-162, surveyed
  * in SURVEY.md §2.0). Plain case classes — the compiler walks these and
  * emits DataFrame transformations; there is no interpreter.
  */
sealed trait SqlNode

// ---------------------------------------------------------------- expressions
sealed trait Expr extends SqlNode

/** Possibly-qualified column reference (`c1`, `t.c1`, `s.t.c1`). */
final case class ColRef(parts: Seq[String]) extends Expr {
  def sql: String = parts.mkString(".")
}
final case class IntLit(v: Long) extends Expr
final case class FloatLit(v: Double) extends Expr
final case class StringLit(v: String) extends Expr
final case class BoolLit(v: Boolean) extends Expr
case object NullLit extends Expr

/** Binary operator; `op` is the lower-cased SQL token (`+`, `||`, `and`,
  * `like`, `not like`, `in`, ...). */
final case class BinaryOp(op: String, left: Expr, right: Expr) extends Expr
final case class UnaryOp(op: String, operand: Expr) extends Expr

/** Scalar function call. */
final case class Call(func: String, args: Seq[Expr]) extends Expr

/** Aggregate ("set function") call; `star` for count(*). */
final case class CallSet(func: String, args: Seq[Expr], distinct: Boolean = false,
    star: Boolean = false) extends Expr

/** Window frame bound: None = unbounded, Some(0) = current row, Some(n) = n. */
final case class FrameSpec(kind: String, start: Option[Long], end: Option[Long])

/** A named window definition from the `WINDOW w AS (...)` clause. */
final case class WindowDef(partitionBy: Seq[Expr], orderBy: Seq[SortItem],
    frame: Option[FrameSpec])

/** `fn(...) OVER w` — reference to a named window; the compiler inlines
  * the definition before anything else sees the expression. */
final case class NamedWindowRef(base: Expr, name: String) extends Expr

/** `fn(...) IGNORE NULLS` (standard placement, before OVER) — valid on
  * first_value/last_value/nth_value/lag/lead/any_value. */
final case class IgnoreNulls(e: Expr) extends Expr

/** `f(...) OVER ([PARTITION BY ...] [ORDER BY ...] [frame])` — parsed but
  * dead in the reference (SURVEY §2.5); fully executable here. */
final case class CallAnalytics(call: Expr, partitionBy: Seq[Expr],
    orderBy: Seq[SortItem], frame: Option[FrameSpec] = None) extends Expr

final case class CastExpr(e: Expr, to: String) extends Expr

/** `(expr).field` composite field access (PG record syntax) — needed by
  * pgjdbc's getPrimaryKeys, which projects `(_pg_expandarray(k)).n`. */
final case class FieldAccess(e: Expr, field: String) extends Expr

/** Searched CASE; the parser desugars simple CASE into searched form with
  * `=` comparisons (reference parser/_parser.py:292-312 does the same). */
final case class CaseExpr(branches: Seq[(Expr, Expr)], otherwise: Option[Expr]) extends Expr

/** `e IN (a, b, c)` / `e NOT IN (...)` — value-list membership. */
final case class InList(e: Expr, values: Seq[Expr], negated: Boolean) extends Expr

/** Scalar subquery `(select ...)` in expression position — extension. */
final case class ScalarSubquery(select: Select) extends Expr
/** `(a, b, ...)` row constructor — valid in IN-subquery and equality
  * comparisons (compiles to a struct). */
final case class RowCtor(items: Seq[Expr]) extends Expr
/** `e IN (select ...)` / `EXISTS (select ...)` — extension. */
final case class InSubquery(e: Expr, select: Select, negated: Boolean) extends Expr
final case class ExistsSubquery(select: Select, negated: Boolean) extends Expr

/** `x op ANY/SOME/ALL (select ...)` — kept intact through parsing so the
  * compiler can lower it with knowledge of the enclosing negation
  * context (NOT ANY / NOT ALL need the SQL-standard three-valued
  * treatment, which a parse-time EXISTS desugar cannot express). */
final case class QuantifiedCmp(op: String, x: Expr, sub: Select,
    quant: String) extends Expr

/** Scope marker, produced only by the quantified-comparison desugar
  * (`x op ANY/ALL (sub)`): wraps an expression written in the OUTER query
  * that was textually injected into the subquery's WHERE. The compiler's
  * origin analysis must classify its column refs as outer-scope even when
  * their names collide with the subquery's own columns — without the
  * marker, `where price > any (select price from c)` would bind the outer
  * `price` to the inner relation and silently degenerate. */
final case class OuterTagged(e: Expr) extends Expr
/** Compiler-internal: a pre-resolved engine column injected during
  * decorrelation (an outer operand bound against the outer plan so the
  * join condition disambiguates same-named columns). Holds a Spark
  * `Column`, typed loosely so this module stays engine-agnostic; never
  * produced by the parser. */
final case class ResolvedRef(ref: AnyRef) extends Expr

// ---------------------------------------------------------------- select bits
sealed trait SelectItem extends SqlNode
final case class ExprItem(e: Expr, alias: Option[String]) extends SelectItem
/** `*` or `t.*` */
final case class Wildcard(table: Option[String]) extends SelectItem

final case class SortItem(e: Expr, asc: Boolean, nullsFirst: Option[Boolean] = None)

// ------------------------------------------------------------------ relations
sealed trait Relation extends SqlNode
final case class TableRef(schema: Option[String], name: String,
    alias: Option[String]) extends Relation
final case class SubqueryRel(select: Select, alias: Option[String]) extends Relation
/** `(VALUES (e, ...), ...) AS t(c1, ...)` — literal inline relation. */
final case class ValuesRel(rows: Seq[Seq[Expr]], alias: Option[String],
    columns: Seq[String]) extends Relation
/** `t TABLESAMPLE BERNOULLI(pct) [REPEATABLE(seed)]`. With REPEATABLE the
  * sample is a deterministic row-hash Bernoulli (reproducible across
  * runs/retries, like [[graft.operators.Sampling]]); without, Spark's
  * native sample. */
final case class SampleRel(child: Relation, method: String,
    percent: Double, seed: Option[Long]) extends Relation
/** `rel PIVOT (agg(e) FOR col IN (v1 [AS name], ...))` — Spark-SQL-style
  * pivot with an explicit value list (no extra distinct-values job at
  * scale). Grouping keys are, implicitly, every child column not
  * referenced by the aggregate or the FOR column. */
final case class PivotRel(child: Relation, agg: Expr, forCol: ColRef,
    values: Seq[(Expr, Option[String])]) extends Relation
/** `rel UNPIVOT [INCLUDE NULLS] (val FOR name IN (c1 [AS 'label'], ...))`
  * — melt columns to rows; SQL-standard EXCLUDE NULLS is the default. */
final case class UnpivotRel(child: Relation, valueCol: String,
    nameCol: String, cols: Seq[(ColRef, Option[String])],
    includeNulls: Boolean) extends Relation
final case class TableFunctionRel(func: String, args: Seq[Expr],
    alias: Option[String], lateral: Boolean,
    /** column names from an `alias(col, …)` alias list (PG FROM-clause
      * form, e.g. `unnest(keys) s(attnum)`) */
    aliasCols: Seq[String] = Nil) extends Relation
final case class JoinRel(how: String, left: Relation, right: Relation,
    on: Option[Expr]) extends Relation

// ----------------------------------------------------------------- statements
sealed trait Statement extends SqlNode

final case class Select(
    cte: Seq[(String, Select)] = Nil,
    /** `WITH RECURSIVE` — CTE entries whose bodies reference their own
      * name are evaluated as an iterative fixpoint (PG semantics: the
      * recursive term sees the rows added by the previous iteration
      * only). Extension; the reference has no recursive CTEs. */
    cteRecursive: Boolean = false,
    /** declared column alias lists: `WITH t(n, p) AS (...)` */
    cteCols: Map[String, Seq[String]] = Map.empty,
    distinct: Boolean = false,
    /** PG `DISTINCT ON (exprs)` — keep first row per key under ORDER BY
      * (unsupported xfail in the reference,
      * tests/test__postgres_conformance.py:259-267; implemented here). */
    distinctOn: Seq[Expr] = Nil,
    items: Seq[SelectItem] = Nil,
    from: Seq[Relation] = Nil,
    where: Option[Expr] = None,
    groupBy: Seq[Expr] = Nil,
    /** "simple" | "rollup" | "cube" | "sets" (multi-level aggregates —
      * absent in the reference, SURVEY §2.4; native in Spark). */
    groupType: String = "simple",
    /** for groupType = "sets": the explicit grouping sets, each a subset
      * of [[groupBy]] (which holds the union, in first-appearance order). */
    groupingSets: Seq[Seq[Expr]] = Nil,
    having: Option[Expr] = None,
    /** named windows from the `WINDOW w AS (...)` clause (PG §7.2.5) */
    windows: Map[String, WindowDef] = Map.empty,
    orderBy: Seq[SortItem] = Nil,
    limit: Option[Long] = None,
    offset: Option[Long] = None,
    setOps: Seq[(String, Select)] = Nil, // (union|union all|intersect|except, rhs)
    /** `QUALIFY p` — filter over window-function results (post-projection;
      * Snowflake/DuckDB extension). */
    qualify: Option[Expr] = None
) extends Statement

final case class CopyFrom(table: String, path: String,
    options: Map[String, String]) extends Statement
final case class CopyTo(table: String, path: String,
    options: Map[String, String]) extends Statement
/** `CREATE TABLE t [WITH (persist 'parquet'[, path '...'])] AS select`.
  * Without options the table is a lazy scope view (reference parity);
  * with `persist` the result is written through the COPY TO machinery
  * and the scope entry re-opened from storage. */
final case class CreateTableAs(name: String, select: Select,
    options: Map[String, String] = Map.empty) extends Statement
final case class DropTable(names: Seq[String]) extends Statement
/** `ALTER TABLE t ADD [CONSTRAINT name] PRIMARY KEY (col)` — metadata
  * only (no enforcement on write, like most warehouses): declares the
  * key that pg_index/pg_constraint reflection and JDBC getPrimaryKeys
  * report. Single-column for now (see _pg_expandarray). */
final case class AlterAddPrimaryKey(table: String, constraint: Option[String],
    cols: Seq[String]) extends Statement
/** `ALTER TABLE t ADD [CONSTRAINT name] FOREIGN KEY (col) REFERENCES
  * other (ocol)` — metadata-only referential declaration; the referenced
  * column must carry a declared primary key (PG requires a unique index
  * there too). Reflected via pg_constraint contype 'f' for JDBC
  * getImportedKeys. */
final case class AlterAddForeignKey(table: String, constraint: Option[String],
    cols: Seq[String], refTable: String, refCols: Seq[String])
    extends Statement
final case class ShowStmt(what: String) extends Statement

/** One `WHEN [NOT] MATCHED [AND cond] THEN action` arm of a MERGE.
  * action ∈ update (with `sets`), delete, insert (with cols/vals). */
final case class MergeClause(matched: Boolean, cond: Option[Expr],
    action: String, sets: Seq[(String, Expr)] = Nil,
    insertCols: Seq[String] = Nil, insertVals: Seq[Expr] = Nil)
/** `MERGE INTO t [AS a] USING src [AS b] ON cond WHEN ... THEN ...` —
  * SQL:2003 upsert over the immutable scope (join + conditional
  * projection + union, then rebind). First applicable clause wins; a
  * target row matching multiple source rows is an error (standard). */
final case class MergeStmt(table: String, targetAlias: Option[String],
    source: Relation, on: Expr,
    clauses: Seq[MergeClause]) extends Statement
/** `EXPLAIN [ANALYZE] select ...` — the formatted physical plan as rows;
  * with ANALYZE the query executes first (output discarded, PG
  * semantics) and per-node runtime metrics follow the plan. */
final case class ExplainStmt(query: Select,
    analyze: Boolean = false) extends Statement
/** `INSERT INTO t [(cols)] select ... | VALUES ...` — appends to the
  * scope entry via union (frames are immutable; the scope binding moves). */
final case class InsertInto(table: String, columns: Seq[String],
    query: Select) extends Statement
/** `DELETE FROM t [USING f] [WHERE p]` — rebinds the scope entry
  * filtered; `USING` (PG) deletes the target rows with ≥1 match in the
  * joined relation under `p`. */
final case class DeleteFrom(table: String, where: Option[Expr],
    using: Option[Relation] = None) extends Statement
/** `UPDATE t SET c = e, ... [FROM f] [WHERE p]` — rebinds with
  * conditional column replacement (rows failing p keep their values).
  * `FROM` (PG) joins another relation: SET expressions and `p` may
  * reference its columns; a target row with several matches takes ONE
  * (deterministically, smallest projected tuple — PG says arbitrary). */
final case class UpdateStmt(table: String, sets: Seq[(String, Expr)],
    where: Option[Expr], from: Option[Relation] = None) extends Statement
/** `TRUNCATE [TABLE] t` — rebinds to the empty frame (schema kept). */
final case class TruncateStmt(table: String) extends Statement
/** `ANALYZE [TABLE] [t [, t ...]]` — collect measured table statistics
  * (row count + estimated in-memory bytes) into the session; no tables
  * named means every table in scope. The statistics feed the compiler's
  * broadcast-join decision (see Compiler TableRef) and are visible via
  * the `table_stats()` table function. Returns no result set, like PG. */
final case class AnalyzeStmt(tables: Seq[String]) extends Statement
/** `OPTIMIZE [TABLE] t [ZORDER BY (c, ...)] [WITH (files 'n', bits 'b')]`
  * — in-place storage-layout rewrite of a path-backed table (the
  * Delta-style maintenance verb): bare OPTIMIZE bin-packs small files;
  * ZORDER BY rewrites Z-clustered on the named columns and rebuilds the
  * min/max skipping manifest over them. Content-preserving by contract;
  * refuses paths this session did not itself write. */
final case class OptimizeStmt(table: String, zorderBy: Seq[String],
    options: Map[String, String] = Map.empty) extends Statement
