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
