package org.apache.spark.sql.connect.service

/** Test-only bridge: SparkConnectService.localPort and SparkContext.conf
  * are package-private in Spark's Scala signatures (the bytecode is
  * public, scalac enforces the ScalaSig), so ConnectSpec reaches them
  * from inside the owning package. */
object GraftConnectBridge {
  /** Start the in-process gRPC Connect service on `port` (0 = ephemeral)
    * and return the actually-bound port. */
  def start(sc: org.apache.spark.SparkContext, port: Int): Int = {
    sc.conf.set("spark.connect.grpc.binding.port", port.toString)
    SparkConnectService.start(sc)
    SparkConnectService.localPort
  }

  def stop(): Unit = SparkConnectService.stop(None, None)
}
