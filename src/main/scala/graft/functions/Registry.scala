package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function registry: name → Seq[Column] => Column.
  *
  * Anything not registered here falls through to
  * `functions.call_function(name, args)`, which resolves the whole Spark
  * built-in library (codegen'd, no UDFs) — so the registry only carries
  * PG-compat overrides (reference registry:
  * src/framequery/executor/_pandas.py:48-56, impls util/_funcs.py:66-107).
  */
final class Registry {
  private var fns: Map[String, Seq[Column] => Column] = Registry.builtins

  def register(name: String, f: Seq[Column] => Column): Unit =
    fns += (name.toLowerCase -> f)

  def contains(name: String): Boolean = fns.contains(name.toLowerCase)

  def apply(name: String, args: Seq[Column]): Column =
    fns.get(name.toLowerCase) match {
      case Some(f) => f(args)
      case None => call_function(name, args: _*)
    }
}

object Registry {
  /** PG `concat` coalesces NULL → '' (reference util/_funcs.py:93-96);
    * Spark's propagates NULL. */
  private def pgConcat(args: Seq[Column]): Column =
    concat(args.map(a => coalesce(a.cast("string"), lit(""))): _*)

  private val builtins: Map[String, Seq[Column] => Column] = Map(
    "concat" -> pgConcat,
    // trim special forms (parser desugars trim(BOTH c FROM s) → trim_both(c, s))
    "trim_both" -> { case Seq(chars, src) => btrim(src, chars) },
    "trim_leading" -> { case Seq(chars, src) =>
      call_function("ltrim", chars, src) },
    "trim_trailing" -> { case Seq(chars, src) =>
      call_function("rtrim", chars, src) },
    // position(needle IN hay) → 1-based, 0 when absent (PG semantics ==
    // Spark locate semantics)
    "position" -> { case Seq(needle, hay) => call_function("locate", needle, hay) },
    // PG compat stubs (reference _pandas.py:50-51)
    "version" -> (_ => lit("PostgreSQL 9.6.0 (graft spark engine)")),
    "current_schema" -> (_ => lit("public")),
    // catalog-reflection functions psql/JDBC call against pg_catalog
    // (graft.compiler.PgCatalog): visibility checks are always true (one
    // flat namespace), owners resolve to the engine user, definition
    // printers return NULL (no stored defaults/constraints/indexes)
    "current_database" -> (_ => lit("graft")),
    "current_schemas" -> (_ => array(lit("pg_catalog"), lit("public"))),
    "pg_get_userbyid" -> (_ => lit("graft")),
    "pg_table_is_visible" -> (_ => lit(true)),
    "pg_type_is_visible" -> (_ => lit(true)),
    "pg_function_is_visible" -> (_ => lit(true)),
    "pg_get_expr" -> (_ => lit(null).cast("string")),
    // information_schema._pg_expandarray(arr): PG expands an index key
    // vector to SETOF (x, n) rows. This engine synthesizes only
    // single-column index rows (pg_index), for which the expansion is
    // exactly one (x = arr[1], n = 1) record — returned as a struct so
    // pgjdbc's `(...).n` / `(...).x` composite access works. A wider
    // key would need true set-returning semantics: fail loudly rather
    // than return one row of a k-row expansion.
    "_pg_expandarray" -> { case Seq(arr) =>
      when(size(arr) <= 1,
        struct(try_element_at(arr, lit(1)).as("x"), lit(1).as("n")))
        .otherwise(raise_error(lit(
          "_pg_expandarray: multi-column index keys are not supported"))) },
    "pg_get_constraintdef" -> (_ => lit(null).cast("string")),
    "pg_get_indexdef" -> (_ => lit(null).cast("string")),
    "pg_get_viewdef" -> (_ => lit(null).cast("string")),
    "pg_get_partkeydef" -> (_ => lit(null).cast("string")),
    "pg_get_statisticsobjdef_columns" -> (_ => lit(null).cast("string")),
    "obj_description" -> (_ => lit(null).cast("string")),
    "col_description" -> (_ => lit(null).cast("string")),
    "shobj_description" -> (_ => lit(null).cast("string")),
    "format_type" -> { case Seq(oid, mod) =>
      graft.compiler.PgCatalog.formatType(oid, mod) },
    "pg_total_relation_size" -> (_ => lit(0L)),
    "pg_relation_size" -> (_ => lit(0L)),
    "pg_table_size" -> (_ => lit(0L)),
    "pg_indexes_size" -> (_ => lit(0L)),
    "pg_size_pretty" -> { case Seq(n) =>
      concat(n.cast("string"), lit(" bytes")) },
    "pg_encoding_to_char" -> (_ => lit("UTF8")),
    // nothing is publishable/subscribed — psql's publication listing
    // filters to zero rows
    "pg_relation_is_publishable" -> (_ => lit(false)),
    "pg_backend_pid" -> (_ => lit(0)),
    "has_table_privilege" -> (_ => lit(true)),
    "has_schema_privilege" -> (_ => lit(true)),
    "has_database_privilege" -> (_ => lit(true)),
    // PG array_to_string ≅ Spark array_join (both skip NULL elements)
    "array_to_string" -> { case Seq(a, sep) =>
      call_function("array_join", a, sep) },
    // `x = ANY(array-expr)` membership (parser desugar): compared on the
    // string renderings so one compiled form analyzes for every element
    // type pairing (the catalog queries mix oid/bigint probes with
    // text[] columns). Caveat: cross-type numeric pairs compare by
    // rendering ('5' vs '5.0' — PG would coerce); same-type arrays are
    // exact.
    "__any_eq" -> { case Seq(arr, x) =>
      array_contains(arr.cast("array<string>"), x.cast("string")) },
    // PG quote_ident, always-quoting form (PG skips quotes for safe
    // lowercase names; always quoting is valid SQL either way)
    "quote_ident" -> { case Seq(s) =>
      concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")) },
    // scalar JSON field access (extension; see Json.jsonGet for the
    // render/NULL contract) — native from_json probe, no Jackson
    "json_get" -> { case Seq(j, f) => Json.jsonGet(j, f) },
    // distributed row id (reference add_rowid / dask strided ids,
    // util/_dask.py:105-120 — one partition-local counter here, no rounds)
    "rowid" -> (_ => monotonically_increasing_id()),
    // extract(field FROM ts) — parser passes field as first (string) arg
    "extract" -> { case Seq(field, src) => call_function("date_part", field, src) },
    // SQL-standard SIMILAR TO: translated to an anchored Java regex at
    // runtime — `.` `^` `$` `\` are LITERAL in the SQL flavor (escaped
    // here), `%`→`.*`, `_`→`.`; `| * + ? ( ) [ ] { }` keep their regex
    // meaning per the standard. No ESCAPE clause; `_`/`%` inside
    // character classes are translated too (documented simplification).
    "similar_to" -> { case Seq(s, p) =>
      val escaped = regexp_replace(p, "([.^$\\\\])", "\\\\$1")
      val translated = regexp_replace(regexp_replace(escaped, "%", ".*"), "_", ".")
      // non-capturing group: a bare top-level `|` must not escape the
      // full-string anchors (`^a|b$` would match substrings)
      call_function("rlike", s,
        concat(lit("^(?s)(?:"), translated, lit(")$"))) },
    "if" -> { case Seq(c, a, b) => when(c, a).otherwise(b) },
    "nullif" -> { case Seq(a, b) => when(a === b, lit(null)).otherwise(a) },
    // native codegen'd vector expressions (beyond the reference):
    // embedding similarity straight from dialect SQL
    "float_dot" -> { case Seq(a, b) => NativeVector.floatDot(a, b) },
    "float_double_dist2" -> { case Seq(a, b) =>
      NativeVector.floatDoubleDist2(a, b) },
    "cosine_sim" -> { case Seq(a, b) => NativeVector.cosine(a, b) },
    // training-data pipeline scalars from dialect SQL (beyond the
    // reference): the fixed-weight quality model and the shipped
    // BPE merge table, first-class in the engine's own SQL surface
    "quality_score" -> { case Seq(t) =>
      graft.operators.TextAnalysis.qualityScore(t) },
    "bpe_segment" -> { case Seq(w) =>
      graft.operators.TextAnalysis.bpeSegment(w) }
  )
}
