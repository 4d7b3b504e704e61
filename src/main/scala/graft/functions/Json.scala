package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON support for `:: json` values and the json_each /
  * json_array_elements table functions (reference util/_funcs.py:134-158).
  *
  * Representation decision (SURVEY §7.4): JSON values travel as their raw
  * JSON text in StringType columns — schema-free like the reference's
  * dtype=object Python values — except that top-level strings are
  * unquoted, matching the reference where `json.loads` yields a bare
  * Python str. Jackson ships inside /opt/spark/jars (Spark's own
  * dependency), so no extra library is introduced.
  */
/** One (key, value) pair of a JSON object — named fields so `inline()`
  * yields `key`/`value` columns directly (PG json_each row shape). */
final case class JsonKV(key: String, value: String)

object Json {
  @transient private lazy val mapper = new ObjectMapper()

  private def render(n: JsonNode): String =
    if (n.isTextual) n.asText() else mapper.writeValueAsString(n)

  /** object text → ordered (key, value-text) pairs */
  def parseObject(s: String): Seq[(String, String)] = {
    if (s == null) return Seq.empty
    val node = mapper.readTree(s)
    node.properties().asScala.toSeq.map(e => (e.getKey, render(e.getValue)))
  }

  /** array text → element-text list */
  def parseArray(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    val node = mapper.readTree(s)
    node.elements().asScala.toSeq.map(render)
  }

  /** scalar `json_get(obj, field)` (extension, dialect-registered):
    * the field's value as render-contract text ([[render]] — top-level
    * strings unquoted, everything else compact JSON, JSON null as the
    * text "null"), SQL NULL when the field is absent or the input is
    * not a JSON object. Fully native (`from_json` to map + key probe —
    * no Jackson per row); the field argument may be any expression,
    * not just a literal. Malformed input yields SQL NULL (PERMISSIVE),
    * the same contract as [[jsonEachEntries]]' default mode. Variant-
    * mode callers wanting jsonb-style access compose Spark's own
    * `parse_json`/`variant_get` through the call_function fallback. */
  def jsonGet(j: Column, field: Column): Column = {
    val m = from_json(j, MapType(StringType, StringType))
    when(map_contains_key(m, field),
      coalesce(element_at(m, field), lit("null")))
  }

  /** json_each as a NATIVE generator: `from_json` to `map<string,string>`
    * stays inside whole-stage codegen and its StringType value conversion
    * matches [[render]] exactly — textual values unquoted, every other
    * value (numbers, booleans, nested objects/arrays) re-emitted as its
    * compact JSON text, and JSON `null` as the text "null" (from_json
    * yields SQL NULL there; the coalesce restores Jackson parity) — so
    * nested values round-trip through a second
    * `json_each`/`json_array_elements` identically to the Jackson path.
    * The UDFs above remain for driver-side constant evaluation
    * (FROM-position table functions over literal JSON).
    *
    * Malformed input: the default (PERMISSIVE) silently yields no rows
    * where the Jackson path raised; pass `failFast = true` for
    * raise-on-malformed parity where errors matter. */
  def jsonEachEntries(c: Column, failFast: Boolean = false): Column =
    transform_values(from_json(c, MapType(StringType, StringType), parseOpts(failFast)),
      (_, v) => coalesce(v, lit("null")))
  /** json_array_elements, native: `from_json` to `array<string>`; same
    * null-text and malformed-input contract as [[jsonEachEntries]]. */
  def jsonArrayEntries(c: Column, failFast: Boolean = false): Column =
    transform(from_json(c, ArrayType(StringType), parseOpts(failFast)),
      v => coalesce(v, lit("null")))

  private def parseOpts(failFast: Boolean): Map[String, String] =
    if (failFast) Map("mode" -> "FAILFAST") else Map.empty

  def jsonEach(c: Column): Column = explode(jsonEachEntries(c))
  def jsonArrayElements(c: Column): Column = explode(jsonArrayEntries(c))

  /** Session switch `graft.json.variant=true`: route json_each /
    * json_array_elements through Spark 4 VariantType (`try_parse_json`
    * + the VariantExplode generator, both CODEGEN'd — `from_json` is
    * CodegenFallback/interpreted, measured as the only non-codegen
    * stage left in the lateral-JSON hot path). Value rendering matches
    * [[render]] exactly (`cast(variant as string)` unquotes top-level
    * strings, re-emits everything else as compact JSON, and JSON null
    * coalesces to the text "null").
    *
    * DOCUMENTED DIVERGENCE: Variant stores object fields SORTED BY
    * KEY, so json_each emits (key, value) pairs in key order, not
    * document order — PG jsonb semantics instead of PG json. This
    * reaches VALUE TEXT too, not just pair order: a NESTED multi-key
    * object value re-renders key-sorted ({"a":{"z":1,"b":2}} →
    * value text {"b":2,"z":1}), where the from_json path re-emits it
    * in document order ({"z":1,"b":2}) — again exactly PG's jsonb-vs-
    * json rendering split (ConformanceSpec pins both). Arrays
    * keep element order. The default therefore stays the document-
    * order-preserving from_json path; opt in where per-row JSON volume
    * dominates and pair order is immaterial (the driver gate hashes
    * sorted rows, so fq_json_lateral is green in both modes —
    * spec-pinned). Malformed input: no rows (try_parse_json → null),
    * the same contract as the default mode's PERMISSIVE parse. */
  def variantMode(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("graft.json.variant").contains("true")

  /** (pos, key, value) generator over a JSON text column, variant
    * mode. Project `key` and [[variantValueText]] after the select. */
  def variantEntries(c: Column): Column =
    org.apache.spark.sql.graft.VariantColumns
      .variantExplode(try_parse_json(c))

  /** The variant value as render-contract text (see [[render]]). */
  def variantValueText(v: Column): Column =
    coalesce(v.cast(StringType), lit("null"))
}
