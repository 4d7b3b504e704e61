package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.sources.Tables

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed aggregation equals batch aggregation") {
    val streamed = Streams.runToCompletion(spark,
      Streams.windowedCounts(Streams.readEvents(spark, dir)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
  }

  test("stream-stream interval join equals the batch join") {
    val streamed = Streams.runToCompletion(spark,
      Streams.clickPurchaseJoin(spark, dir), mode = "append")
      .select(col("c_user"), col("c_ns"), col("p_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = Tables.load(spark, dir, "events")
    val batch = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts_nanos").as("c_ns"))
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts_nanos").as("p_ns")),
        col("u") === col("pu") && col("p_ns") >= col("c_ns") &&
          col("p_ns") - col("c_ns") <= lit(30L * 60 * 1000000000L))
      .select(col("u"), col("c_ns"), col("p_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stateful running counts via flatMapGroupsWithState over a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)] // (user_id, event_id)
    val counts = ms.toDS().groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[Int]) =>
          val n = state.getOption.getOrElse(0) + it.size
          state.update(n)
          Iterator((uid, n))
      }
    val q = counts.toDF("user_id", "n").writeStream
      .outputMode("update").format("memory").queryName("state_test").start()
    try {
      ms.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      ms.addData((1L, 12L), (2L, 21L), (3L, 30L))
      q.processAllAvailable()
      // latest update per user carries the running count
      val last = spark.table("state_test")
        .groupBy(col("user_id")).agg(max(col("n")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(last == Map(1L -> 3, 2L -> 2, 3L -> 1))
    } finally q.stop()
  }
}
