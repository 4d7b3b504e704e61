package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark Connect round-trip — the modern remote-access path to a Spark
  * cluster (SURVEY §7.4: the reference's SQLAlchemy/DBAPI role is
  * covered by the JSON-lines + PG wire servers; Connect is the
  * Spark-native equivalent). Rounds 1–11 documented this as an
  * environment blocker (no client jar in the sandbox); the round-12
  * re-probe found the 4.1.2 client jars under
  * /opt/spark/jars/connect-repl/, so the round-trip is now TESTED:
  * an in-process gRPC SparkConnectService serves the session that
  * holds a graft-produced result, and the official Spark Connect JDBC
  * client — loaded in a child classloader so the client jars never
  * pollute the library classpath — reads it back over the wire.
  *
  * At scale this is exactly how a remote analyst reaches a graft
  * deployment: the library runs in the cluster-side session; results
  * publish as (global temp) views; any Connect client — JDBC here,
  * pyspark-connect, spark-connect-repl — queries them without a
  * cluster-side classpath. */
class ConnectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val clientJars = Seq(
    "/opt/spark/jars/connect-repl/spark-connect-client-jdbc_2.13-4.1.2.jar",
    "/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar")
    .map(new java.io.File(_))

  test("Spark Connect JDBC client round-trips a graft query over gRPC") {
    assume(clientJars.forall(_.exists()),
      "Spark Connect client jars not shipped in this image")
    // in-process gRPC service on an ephemeral port (0 → bind any free)
    val bridge = org.apache.spark.sql.connect.service.GraftConnectBridge
    val port = bridge.start(spark.sparkContext, 0)
    try {
      // a graft-produced frame, published where every session created
      // by the Connect service can see it (Connect gives each client
      // its own session; global temp views span them)
      val q1 = SparkEntry.queries("q1_pricing_summary")(
        spark, "/root/testdata/sf0.001")
      q1.createOrReplaceGlobalTempView("graft_connect_q1")
      val expectRows = q1.count()
      // child classloader: the client jars resolve their own classes,
      // everything shared (sql-api, shaded grpc bytes of the same
      // release) delegates to the test classpath — and nothing of the
      // client leaks onto the library's compile or runtime classpath
      val loader = new java.net.URLClassLoader(
        clientJars.map(_.toURI.toURL).toArray,
        Thread.currentThread.getContextClassLoader)
      val drv = Class.forName(
        "org.apache.spark.sql.connect.client.jdbc.SparkConnectDriver",
        true, loader).getDeclaredConstructor().newInstance()
        .asInstanceOf[java.sql.Driver]
      val conn = drv.connect(s"jdbc:sc://localhost:$port",
        new java.util.Properties)
      try {
        val st = conn.createStatement()
        // plain expression round-trip (ResultSets closed before the
        // connection: the client's arrow allocator audits open buffers)
        val r1 = st.executeQuery("SELECT 1 + 1 AS two")
        assert(r1.next() && r1.getInt("two") == 2)
        r1.close()
        // the graft result, read back remotely
        val r2 = st.executeQuery(
          "SELECT count(*) AS n, sum(sum_qty) AS q " +
            "FROM global_temp.graft_connect_q1")
        assert(r2.next())
        assert(r2.getLong("n") == expectRows,
          s"remote row count ${r2.getLong(1)} != local $expectRows")
        assert(r2.getDouble("q") > 0.0)
        r2.close()
        st.close()
      } finally conn.close()
    } finally bridge.stop()
  }
}
