package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Backward as-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key (trades/quotes,
  * event-attribution). Spark has no native as-of join; the scalable
  * composition is the union + running-window trick:
  *
  *   union both sides tagged → one shuffle on (key) ordered by (time,
  *   side) → `last(right_payload, ignoreNulls)` over the running frame →
  *   keep left rows.
  *
  * One shuffle total, no range-join explosion, no per-key loops: at any
  * scale this is a sort-merge pass, the same cost class as a groupBy.
  * (Preference order per the build rules: this is option (a) "compose
  * existing ops" — no custom SparkPlan needed.)
  */
object AsofJoin {

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` — the same union+running-window pass with
    * the time axis descending (right-before-left at equal times keeps
    * the match inclusive). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPrefix: String = "r_",
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPrefix,
      tolerance, forward = true)

  /** Nearest as-of: whichever of the backward/forward match is closer in
    * time (ties prefer the preceding row). Two window passes — still
    * shuffle-bound, no pair explosion. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPrefix: String = "r_",
      tolerance: Option[Long] = None): DataFrame = {
    val back = asof(left, right, keys, leftTime, rightTime, "__b_", tolerance)
    val fwd = asofForward(back, right, keys, leftTime, rightTime, "__f_",
      tolerance)
    val rCols = right.columns.filterNot(keys.contains)
    val t = col(leftTime).cast("long")
    val bT = col(s"__b_$rightTime").cast("long")
    val fT = col(s"__f_$rightTime").cast("long")
    // backward wins when forward is absent or strictly farther
    val useBack = col(s"__f_$rightTime").isNull ||
      (col(s"__b_$rightTime").isNotNull && (t - bT) <= (fT - t))
    val out = left.columns.map(col) ++ rCols.map(c =>
      when(useBack, col(s"__b_$c")).otherwise(col(s"__f_$c"))
        .as(s"$rightPrefix$c"))
    fwd.select(out: _*)
  }

  /** @param keys        equi keys present in both frames
    * @param leftTime    ordering column in `left` (numeric or timestamp)
    * @param rightTime   ordering column in `right` (same type)
    * @param rightPrefix prefix for right payload columns in the output
    * @param tolerance   max allowed `leftTime - rightTime` (same units);
    *                    matches further back are nulled out */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPrefix: String = "r_",
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPrefix,
      tolerance, forward = false)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPrefix: String,
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    val rStructType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val keyCols = keys.map(col)

    val lPart = left.select(
      keyCols :+ col(leftTime).cast("long").as("__t") :+
        lit(1).as("__side") :+
        struct(left.columns.map(col): _*).as("__l") :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rPart = right.select(
      keyCols :+ col(rightTime).cast("long").as("__t") :+
        lit(0).as("__side") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("__l") :+
        struct(right.columns.map(col): _*).as("__r"): _*)

    // right rows sort before left rows at equal time → inclusive match;
    // forward direction = the same scan over a descending time axis
    val ord = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lPart.union(rPart)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withTol = tolerance match {
      case Some(t) =>
        val gap =
          if (forward) col(s"__match.$rightTime").cast("long") - col("__t")
          else col("__t") - col(s"__match.$rightTime").cast("long")
        matched.withColumn("__match",
          when(col("__match").isNotNull && gap <= t, col("__match")))
      case None => matched
    }
    val leftOut = left.columns.map(c => col(s"__l.$c").as(c))
    val rightOut = right.columns.filterNot(keys.contains)
      .map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    withTol.select(leftOut ++ rightOut: _*)
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // attribution: for each purchase event, the user's latest preceding
    // click — oracle: DuckDB's native ASOF JOIN on the exact nanosecond
    // axis (ts_nanos keeps ns ties identical in both engines)
    "aj_purchase_click" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_nanos"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_nanos"))
      asof(purchases, clicks, keys = Seq("user_id"),
          leftTime = "ts_nanos", rightTime = "ts_nanos")
        .select(col("event_id"), col("user_id"), col("r_click_id").as("click_id"))
        .orderBy(col("event_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "aj_purchase_click" ->
      """SELECT p.event_id, p.user_id, c.click_id
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, event_id AS click_id, ts FROM events
        |                WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin
  )
}
