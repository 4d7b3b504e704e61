package graft.server

import org.apache.spark.sql.SparkSession

/** Process-wide backstop for the standalone server entry points: the
  * per-connection handlers catch NonFatal only, so a fatal JVM error
  * (OutOfMemoryError, LinkageError, …) propagates out of its daemon
  * thread — which by default kills just that thread and leaves the rest
  * of the JVM serving connections in potentially corrupted state. The
  * servers are long-lived multi-connection processes, so the correct
  * policy is fail-fast: halt the whole process. Installed by
  * [[ServeMain]] / [[PgServeMain]] only — embedded/test usage keeps the
  * default (a fatal error in a test surfaces as a test failure, not a
  * JVM halt). */
object FatalErrorHalt {
  def install(): Unit =
    Thread.setDefaultUncaughtExceptionHandler { (t: Thread, e: Throwable) =>
      if (!scala.util.control.NonFatal(e)) {
        System.err.println(
          s"FATAL error in thread ${t.getName}: $e — halting process")
        e.printStackTrace(System.err)
        // halt, not exit: shutdown hooks could deadlock in a broken JVM
        Runtime.getRuntime.halt(1)
      } else {
        System.err.println(s"uncaught exception in thread ${t.getName}: $e")
        e.printStackTrace(System.err)
      }
    }
}

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
    FatalErrorHalt.install()
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
