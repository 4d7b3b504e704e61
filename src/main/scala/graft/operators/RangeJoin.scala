package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Bucketed range (interval) join.
  *
  * A time-range join `l ⋈ r ON l.key = r.key AND r.t ∈ [l.t, l.t + W]`
  * written directly is a theta join: Catalyst can only plan the equi part
  * as the join key and evaluates the range predicate as a post-join
  * filter — fine — but when the key is absent or low-cardinality it
  * degenerates to a broadcast-nested-loop. The classic scale-out shape
  * (DeWitt et al. band joins; Spark/Databricks "range join optimization")
  * buckets the time axis: each left row covers at most
  * `ceil(W / bucket) + 1` buckets, each right row lands in exactly one,
  * and `(key, bucket)` becomes a high-cardinality equi key the engine can
  * hash-partition. Pair work shrinks from |l|×|r| per key to the rows
  * sharing a W-sized time neighborhood — the same locality a sorted
  * single-node band join exploits, but shuffle-parallel.
  *
  * The expansion factor is explicit: `explode(sequence(b_lo, b_hi))` on
  * the left, so cost scales linearly with W / bucketWidth (chosen = W so
  * the factor is 2). The exact predicate still runs post-join — bucketing
  * only prunes candidates, it never changes semantics. */
object RangeJoin {

  /** `left ⋈ right ON left.key = right.key AND right.t - left.t ∈
    * [0, window]`, as a bucketed equi join. `lt`/`rt` are long-typed
    * event times (any unit, as long as `window` matches). */
  def bandJoin(left: DataFrame, right: DataFrame,
      key: String, lt: String, rt: String, window: Long): DataFrame = {
    require(window > 0,
      s"bandJoin window must be positive, got $window — window=0 would " +
        "divide by zero into null buckets (silently dropping every left " +
        "row) and a negative window has no matching rows by definition")
    require(!left.columns.contains("__gr_bk") && !right.columns.contains("__gr_bk"),
      "bandJoin reserves the internal column name __gr_bk")
    val width = window // 1 bucket of slack each side → expansion factor 2
    // `div` (integer division) — `/` is double division in Spark and
    // loses sub-µs precision at epoch-nanosecond magnitudes
    val l = left.withColumn("__gr_bk",
      explode(sequence(expr(s"$lt div $width"),
        expr(s"($lt + $window) div $width"))))
    val r = right.withColumn("__gr_bk", expr(s"$rt div $width"))
    l.join(r, Seq(key, "__gr_bk"))
      .filter(col(rt) >= col(lt) && col(rt) - col(lt) <= window)
      .drop("__gr_bk")
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // click→purchase attribution within 15 minutes as a bucketed band
    // join — the batch face of st_join_attribution's stream-stream join,
    // but planned as a hash join on (user_id, time_bucket) instead of a
    // theta join. Exact nanosecond predicate post-join; hourly rollup
    // with decimal-exact sums.
    "rj_click_purchase" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_nanos").as("c_ns"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_nanos").as("p_ns"),
          col("ts").as("p_ts"), col("value").as("p_value"))
      bandJoin(clicks, purchases, key = "user_id",
          lt = "c_ns", rt = "p_ns", window = 15L * 60 * 1000000000L)
        .groupBy(date_format(
          timestamp_seconds(floor(unix_timestamp(col("p_ts")) / 3600) * 3600),
          "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("user_id")).as("n_users"),
          sum(col("p_value").cast(DecimalType(18, 6))).cast("double")
            .as("total_value"))
        .orderBy(col("hour"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // plain (unbucketed) predicate join — semantics-equal by construction
    "rj_click_purchase" ->
      """SELECT strftime(to_timestamp(floor(epoch(p.ts) / 3600) * 3600),
        |         '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(*) AS n_pairs, count(DISTINCT p.user_id) AS n_users,
        |  CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND c.user_id = p.user_id
        | AND epoch_ns(p.ts) >= epoch_ns(c.ts)
        | AND epoch_ns(p.ts) - epoch_ns(c.ts) <= 900000000000
        |GROUP BY 1 ORDER BY hour""".stripMargin
  )
}
