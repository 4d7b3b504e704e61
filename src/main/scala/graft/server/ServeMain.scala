package graft.server

import org.apache.spark.sql.SparkSession

/** Standalone server entry point:
  * `runMain graft.server.ServeMain [scopeSpec.json] [port] [bindAddr]`
  * — starts a [[SqlServer]] (port 0 = ephemeral, printed on stdout) and
  * blocks until the process is killed. The production analog of the
  * reference's `create_engine('framequery:///scope.json')` deployment:
  * one long-lived Spark application, many client connections, each
  * bootstrapped from the scope spec.
  *
  * Binds 127.0.0.1 unless `bindAddr` is given explicitly: the protocol
  * is unauthenticated (see [[SqlServer]]), so exposing it beyond the
  * host must be a deliberate operator decision. */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val spec = args.headOption.filter(_.nonEmpty)
    val port = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val bind = args.drop(2).headOption.filter(_.nonEmpty)
      .map(java.net.InetAddress.getByName)
      .getOrElse(java.net.InetAddress.getLoopbackAddress)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-sql-server")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new SqlServer(spark, port = port, scopeSpecPath = spec,
      bindAddress = bind)
    println(s"""{"listening": ${server.boundPort}}""")
    // serve until killed
    Thread.currentThread.join()
  }
}
