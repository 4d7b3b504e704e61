package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) already splits oversized shuffle partitions at runtime;
  * these helpers cover the cases AQE can't: a broadcast-ineligible dim
  * side with a handful of pathological keys, and high-cardinality
  * aggregations where one key dominates a partition.
  */
object Skew {

  /** Salted equi-join: replicate the right side `salts` ways and spread
    * left rows across the replicas, turning one hot shuffle key into
    * `salts` keys. Use when the right side is too big to broadcast and a
    * few left keys dominate. Cost: right side × salts — pick the smaller
    * side as `right`. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, how: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), how).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (key, salt), then combine per key. Works for any algebraic
    * aggregate expressed as (partial, combine) column pairs.
    *
    * Example — count + sum per key:
    * {{{
    * saltedAgg(df, "k", 16,
    *   partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   combine = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    *
    * Note: Spark's HashAggregate already does map-side partial
    * aggregation, which removes most skew for algebraic aggregates; this
    * helper matters for collect_list/percentile-style aggregates whose
    * partial state is itself large. */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      partial: Seq[Column], combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val pre = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
    pre.groupBy(col(key)).agg(combine.head, combine.tail: _*)
  }
}
