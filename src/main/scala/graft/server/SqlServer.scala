package graft.server

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

import graft.exec.Executor

/** Network client surface for the [[graft.exec.Executor]] — the analog of
  * the reference's DBAPI + SQLAlchemy dialect (reference
  * src/framequery/alchemy/dbapi.py:5-161, dialect.py:13-62), which make
  * the engine reachable from any client process rather than only
  * in-process callers.
  *
  * Protocol: newline-delimited JSON over TCP — one request line, one
  * response line, sessionful per connection (each connection owns ONE
  * executor session, so CREATE TABLE AS / COPY statements persist across
  * requests on the same connection, like a DBAPI cursor's connection).
  *
  * Request  `{"sql": "...", "params": [..] | {..}?, "maxRows": n?}`
  * Response `{"columns": [..], "rows": [[..]..], "rowCount": n,
  *            "truncated": bool}`  for result sets,
  *          `{"ok": true}`         for statements (DDL/COPY/DML),
  *          `{"error": "..."}`     on any failure (the connection stays
  *                                 usable — error parity with DBAPI,
  *                                 where an errored cursor can re-execute).
  *
  * Results are materialized driver-side and shipped to the client — the
  * DBAPI fetch contract. `maxRows` (default 10,000) bounds that
  * materialization: at 100 TB a SELECT's result must be an aggregate or
  * LIMIT-ed slice; full-table exports belong to `COPY TO` (which writes
  * distributed part-files and returns only `ok`). This server is the
  * API-parity surface; a production deployment would put the same
  * Executor behind Spark Connect (the server plugin ships in
  * /opt/spark/jars, but no JVM client jar is available in this sandbox to
  * round-trip it — see NOTES.md).
  *
  * Threading: one daemon accept-thread, one daemon thread per
  * connection. Spark's SparkSession is thread-safe for concurrent
  * queries; each connection's Executor scope is confined to its thread.
  *
  * SECURITY: the protocol is UNAUTHENTICATED — any connected peer runs
  * arbitrary SQL, including COPY FROM/TO filesystem paths. The server
  * therefore binds loopback by default; see `bindAddress`.
  */
final class SqlServer(spark: org.apache.spark.sql.SparkSession,
    scope: Map[String, org.apache.spark.sql.DataFrame] = Map.empty,
    port: Int = 0, defaultMaxRows: Int = 10000,
    /** optional scope-spec JSON (see [[graft.exec.ScopeSpec]]) executed
      * per CONNECTION — the reference dialect's connect-time `setup`
      * statements and table bindings (dialect.py:18-48). */
    scopeSpecPath: Option[String] = None,
    /** The protocol carries NO authentication and SQL reaches COPY
      * FROM/TO (arbitrary filesystem paths), so by default the socket
      * binds the loopback interface only — same-host clients. Opting
      * into an external bind address is an explicit statement that the
      * network perimeter provides the auth (and a production deployment
      * should front this with Spark Connect or a TLS proxy instead). */
    bindAddress: java.net.InetAddress = java.net.InetAddress.getLoopbackAddress) {

  private val mapper = new ObjectMapper()
  private val serverSocket = new ServerSocket(port, 50, bindAddress)
  private val running = new AtomicBoolean(true)

  /** The bound port (useful with port=0 — ephemeral). */
  def boundPort: Int = serverSocket.getLocalPort

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val sock = serverSocket.accept()
        val t = new Thread(() => serve(sock), s"graft-sql-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.net.SocketException => // closed during accept — shutdown
        case scala.util.control.NonFatal(e) if running.get() =>
          // transient accept failure: log and keep accepting — dying
          // here leaves a listener that can never take a connection
          System.err.println(s"[graft-sql] accept failed: $e")
          Thread.sleep(100)
      }
    }
  }, "graft-sql-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  def close(): Unit = {
    running.set(false)
    serverSocket.close()
  }

  private def serve(sock: Socket): Unit = {
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(
        new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
      // one executor session per connection: statement effects persist
      // across requests, sessions never see each other's scope mutations.
      // A bootstrap failure must still ANSWER the client (one error line,
      // then close) — leaving the socket open would hang every client
      // blocked on its first response.
      val exec = try {
        graft.exec.ScopeSpec.bootstrap(spark, scope, scopeSpecPath)
      } catch {
        case scala.util.control.NonFatal(e) =>
          val err = mapper.createObjectNode()
          err.put("error", s"connection bootstrap failed: ${
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
          out.println(mapper.writeValueAsString(err))
          out.flush()
          return
      }
      var line = in.readLine()
      while (line != null) {
        out.println(handle(exec, line))
        out.flush()
        line = in.readLine()
      }
    } catch {
      case _: java.io.IOException => // client went away
    } finally sock.close()
  }

  private def handle(exec: Executor, line: String): String =
    try {
      val req = mapper.readTree(line)
      val sql = Option(req.get("sql")).map(_.asText()).getOrElse(
        throw new IllegalArgumentException("request is missing 'sql'"))
      val maxRows = Option(req.get("maxRows")).map(_.asInt())
        .getOrElse(defaultMaxRows)
      val bound = Option(req.get("params")) match {
        case Some(p) if p.isArray =>
          Executor.substitute(sql, p.elements().asScala.map(jsonScalar).toSeq)
        case Some(p) if p.isObject =>
          Executor.substituteNamed(sql,
            p.properties().asScala.map(e => e.getKey -> jsonScalar(e.getValue)).toMap)
        case Some(p) if p.isNull => sql
        case Some(_) => throw new IllegalArgumentException(
          "'params' must be an array or object")
        case None => sql
      }
      exec.execute(bound) match {
        case None =>
          val ok = mapper.createObjectNode()
          ok.put("ok", true)
          mapper.writeValueAsString(ok)
        case Some(df) => renderResult(df, maxRows)
      }
    } catch {
      // NonFatal only: an OutOfMemoryError / LinkageError must not be
      // serialized into an {"error": ...} line — it propagates out of
      // this per-connection daemon thread (killing the connection), and
      // the standalone entry points install [[FatalErrorHalt]] so the
      // whole process halts instead of serving on in a corrupted JVM
      case scala.util.control.NonFatal(e) =>
        val err = mapper.createObjectNode()
        err.put("error",
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        mapper.writeValueAsString(err)
    }

  /** A result set as one JSON line. Row values ride through Spark's own
    * JSON encoding (`toJSON` — exact Spark semantics for decimals,
    * dates, arrays, structs), re-assembled into positional arrays so the
    * client gets `columns` + `rows` like a DBAPI `description` +
    * `fetchall`. Fetch `maxRows + 1` to learn whether the set was cut. */
  private def renderResult(df: org.apache.spark.sql.DataFrame,
      maxRows: Int): String = {
    val cols = df.columns
    // duplicate output names are routine on a join surface and toJSON
    // keys rows by NAME (later duplicates clobber earlier ones) — so
    // rename to positional keys first and report the real names alongside
    val keyed = df.toDF(cols.indices.map(i => s"__c$i"): _*)
    val n = math.min(maxRows, Int.MaxValue - 1).max(0)
    val fetched = keyed.limit(n + 1).toJSON.collect()
    val truncated = fetched.length > n
    val resp = mapper.createObjectNode()
    val colArr = resp.putArray("columns")
    cols.foreach(colArr.add)
    val rows = resp.putArray("rows")
    fetched.take(n).foreach { rowJson =>
      val obj = mapper.readTree(rowJson)
      val arr = rows.addArray()
      // toJSON omits null fields — restore them positionally
      cols.indices.foreach { i =>
        val v = obj.get(s"__c$i")
        if (v == null) arr.addNull() else arr.add(v)
      }
    }
    resp.put("rowCount", math.min(fetched.length, n))
    resp.put("truncated", truncated)
    mapper.writeValueAsString(resp)
  }

  private def jsonScalar(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isNull) null
    else if (n.isTextual) n.asText()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else throw new IllegalArgumentException(
      s"unsupported parameter value: $n")
}

/** Minimal client for [[SqlServer]] — the DBAPI-connection analog used by
  * tests and external callers: one socket, sequential request/response. */
final class SqlClient(host: String, port: Int) extends AutoCloseable {
  private val mapper = new ObjectMapper()
  private val sock = new Socket(host, port)
  private val in = new BufferedReader(
    new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
  private val out = new PrintWriter(
    new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))

  /** Raw JSON response for one request line. */
  def request(json: String): com.fasterxml.jackson.databind.JsonNode = {
    out.println(json.replace("\n", " "))
    out.flush()
    val line = in.readLine()
    if (line == null) throw new java.io.IOException("server closed connection")
    mapper.readTree(line)
  }

  /** Execute a statement or query; queries return Some(columns, rows). */
  def execute(sql: String, params: Seq[Any] = Nil,
      maxRows: Int = 10000): Option[(Seq[String], Seq[Seq[Any]])] = {
    val req = mapper.createObjectNode()
    req.put("sql", sql)
    req.put("maxRows", maxRows)
    if (params.nonEmpty) {
      val arr = req.putArray("params")
      params.foreach {
        case null => arr.addNull()
        case s: String => arr.add(s)
        case b: Boolean => arr.add(b)
        case i: Int => arr.add(i)
        case l: Long => arr.add(l)
        case d: Double => arr.add(d)
        case other => arr.add(other.toString)
      }
    }
    val resp = request(mapper.writeValueAsString(req))
    if (resp.has("error"))
      throw new RuntimeException(resp.get("error").asText())
    if (resp.has("ok")) None
    else {
      val cols = resp.get("columns").elements().asScala.map(_.asText()).toSeq
      val rows = resp.get("rows").elements().asScala.map { r =>
        r.elements().asScala.map(jsonValue).toSeq
      }.toSeq
      Some((cols, rows))
    }
  }

  private def jsonValue(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isNull) null
    else if (n.isTextual) n.asText()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else n.toString // arrays/structs stay JSON text

  override def close(): Unit = sock.close()
}
