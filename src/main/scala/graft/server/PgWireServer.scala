package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exec.Executor

/** PostgreSQL wire protocol (v3) front end for the engine — the surface
  * that makes it reachable from OFF-THE-SHELF Postgres clients (psql,
  * psycopg2, JDBC), closing the reference's deployment story: the
  * reference exposes itself through a SQLAlchemy dialect + DBAPI
  * (reference src/framequery/alchemy/dialect.py:13-62, dbapi.py:5-161)
  * so "any Postgres-speaking tool" is the bar, not a bespoke protocol.
  *
  * Implemented: SSL/GSS negotiation refusal (clients fall back to
  * plaintext), StartupMessage, AuthenticationOk (trust), ParameterStatus,
  * BackendKeyData, the SIMPLE QUERY flow (Q → RowDescription → DataRow*
  * → CommandComplete → ReadyForQuery), EmptyQueryResponse, ErrorResponse
  * with connection recovery, NoticeResponse for result truncation, and
  * Terminate. psql splits multi-statement input client-side and ships
  * one statement per Q, so the simple flow covers scripts and -c usage.
  * The extended (Parse/Bind/Execute) flow is not implemented: psycopg2
  * interpolates parameters client-side and uses the simple flow, which
  * is the reference DBAPI's own paramstyle model (pyformat, dbapi.py).
  *
  * Results ship in text format with PG-style rendering (t/f booleans,
  * `{…}` array literals, NULL as the -1 length sentinel) and honest type
  * OIDs for the scalar types, so clients parse values correctly.
  *
  * Sessionful like [[SqlServer]]: one Executor per connection (CREATE
  * TABLE AS persists across statements on the connection, connections
  * are isolated). Driver-side materialization is capped at
  * `defaultMaxRows` with a NOTICE on truncation — at 100 TB a client
  * fetch must be an aggregate or LIMIT-ed slice; bulk export is COPY TO
  * (distributed part-files, returns only a tag).
  *
  * SECURITY: auth is TRUST (AuthenticationOk unconditionally), so the
  * socket binds loopback by default, same policy as [[SqlServer]].
  */
final class PgWireServer(spark: SparkSession,
    scope: Map[String, DataFrame] = Map.empty,
    port: Int = 0, defaultMaxRows: Int = 10000,
    scopeSpecPath: Option[String] = None,
    bindAddress: InetAddress = InetAddress.getLoopbackAddress) {

  private val serverSocket = new ServerSocket(port, 50, bindAddress)
  private val running = new AtomicBoolean(true)

  def boundPort: Int = serverSocket.getLocalPort

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val sock = serverSocket.accept()
        val t = new Thread(() => serve(sock), s"graft-pg-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: java.net.SocketException => // closed during accept
      }
    }
  }, "graft-pg-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  def close(): Unit = {
    running.set(false)
    serverSocket.close()
  }

  // ------------------------------------------------------------ wire codec

  private def cstring(out: DataOutputStream, s: String): Unit = {
    out.write(s.getBytes(StandardCharsets.UTF_8))
    out.writeByte(0)
  }

  /** One typed backend message: tag byte + int32 length (inclusive of
    * itself) + body. */
  private def send(out: DataOutputStream, tag: Char)(
      body: DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    body(new DataOutputStream(buf))
    out.writeByte(tag)
    out.writeInt(4 + buf.size)
    buf.writeTo(out)
  }

  private def sendError(out: DataOutputStream, msg: String,
      code: String = "XX000"): Unit =
    send(out, 'E') { b =>
      b.writeByte('S'); cstring(b, "ERROR")
      b.writeByte('C'); cstring(b, code)
      b.writeByte('M'); cstring(b, msg)
      b.writeByte(0)
    }

  private def sendNotice(out: DataOutputStream, msg: String): Unit =
    send(out, 'N') { b =>
      b.writeByte('S'); cstring(b, "NOTICE")
      b.writeByte('C'); cstring(b, "01000")
      b.writeByte('M'); cstring(b, msg)
      b.writeByte(0)
    }

  private def readyForQuery(out: DataOutputStream): Unit = {
    send(out, 'Z')(_.writeByte('I'))
    out.flush()
  }

  /** PG type OIDs (pg_type.dat) for the scalar types; everything else
    * ships as text (25) — including arrays/structs, rendered as
    * PG-style literals, which psql displays and generic clients treat
    * as strings. */
  private def pgTypeOid(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ByteType | ShortType => 21
    case IntegerType => 23
    case LongType => 20
    case FloatType => 700
    case DoubleType => 701
    case _: DecimalType => 1700
    case DateType => 1082
    case TimestampType | TimestampNTZType => 1114
    case _ => 25
  }

  /** Text-format rendering with PG conventions. */
  private def render(v: Any): String = v match {
    case b: Boolean => if (b) "t" else "f"
    case d: java.math.BigDecimal => d.toPlainString
    case bd: scala.math.BigDecimal => bd.bigDecimal.toPlainString
    case ts: java.sql.Timestamp => renderTimestamp(ts)
    case ldt: java.time.LocalDateTime => renderLocalDateTime(ldt)
    case bytes: Array[Byte] => // bytea hex form; must precede Array[_]
      "\\x" + bytes.map(b => f"$b%02x").mkString
    case s: collection.Seq[_] =>
      s.map(arrayElem).mkString("{", ",", "}")
    case a: Array[_] =>
      a.map(arrayElem).mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => r.toString
    case other => other.toString
  }

  /** The engine session runs UTC and the advertised OID is 1114 (tz-less
    * timestamp), so the wire text must be the UTC wall-clock of the
    * instant. `Timestamp.toString` renders in the JVM DEFAULT timezone —
    * on a non-UTC host every value would ship shifted by the host offset
    * relative to the engine's own results. Convert through Instant at
    * UTC instead; fractional seconds are trimmed PG-style (absent when
    * zero, no trailing zeros otherwise). */
  private val tsSecondsFmt =
    java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss")

  private def renderTimestamp(ts: java.sql.Timestamp): String =
    renderLocalDateTime(
      ts.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime)

  private def renderLocalDateTime(ldt: java.time.LocalDateTime): String = {
    val base = tsSecondsFmt.format(ldt)
    val micros = ldt.getNano / 1000
    if (micros == 0) base
    else base + "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse
  }

  /** One element of a PG array literal: unquoted NULL for SQL NULL;
    * elements containing structural characters (comma, braces, quote,
    * backslash, whitespace), empty strings, and the literal word "null"
    * are double-quoted with backslash escaping — otherwise `{a,b}` vs
    * `array('a,b')` would be indistinguishable to a parsing client. */
  private def arrayElem(e: Any): String = {
    if (e == null) return "NULL"
    val s = render(e)
    val needsQuote = s.isEmpty || s.equalsIgnoreCase("null") ||
      s.exists(c => c == ',' || c == '{' || c == '}' || c == '"' ||
        c == '\\' || c.isWhitespace)
    if (needsQuote)
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    else s
  }

  // ------------------------------------------------------------ connection

  /** Frames above this are protocol garbage, not queries — reject before
    * allocating (a bogus int32 length would otherwise attempt a
    * multi-GB array). */
  private val MaxFrameBytes = 1 << 26 // 64 MiB

  private def serve(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(
        new BufferedOutputStream(sock.getOutputStream))

      // --- negotiation: refuse SSL/GSS until a real StartupMessage lands
      var startupLen = in.readInt()
      var code = in.readInt()
      var guard = 0
      while ((code == 80877103 || code == 80877104) && guard < 4) {
        out.writeByte('N') // no SSL / no GSS — client retries plaintext
        out.flush()
        startupLen = in.readInt()
        code = in.readInt()
        guard += 1
      }
      if (code == 80877102) return // CancelRequest: nothing cancellable
      if (code != 196608) { // protocol 3.0
        sendError(out, s"unsupported protocol code $code", "08P01")
        out.flush()
        return
      }
      if (startupLen < 8 || startupLen > MaxFrameBytes) {
        sendError(out, s"invalid startup length $startupLen", "08P01")
        out.flush()
        return
      }
      // startup parameters (user/database/options) — read and ignore
      val paramBytes = new Array[Byte](startupLen - 8)
      in.readFully(paramBytes)

      // --- trust auth + session banner
      send(out, 'R')(_.writeInt(0)) // AuthenticationOk
      Seq(
        "server_version" -> "13.0 (graft)",
        "server_encoding" -> "UTF8",
        "client_encoding" -> "UTF8",
        "DateStyle" -> "ISO, MDY",
        "integer_datetimes" -> "on",
        "standard_conforming_strings" -> "on").foreach { case (k, v) =>
        send(out, 'S') { b => cstring(b, k); cstring(b, v) }
      }
      send(out, 'K') { b => b.writeInt(sock.getPort); b.writeInt(0) }

      // one executor session per connection (shared bootstrap with
      // SqlServer; a failure answers the client, then closes)
      val exec = try {
        graft.exec.ScopeSpec.bootstrap(spark, scope, scopeSpecPath)
      } catch {
        case scala.util.control.NonFatal(e) =>
          sendError(out, s"connection bootstrap failed: ${e.getMessage}")
          out.flush()
          return
      }
      readyForQuery(out)

      // --- message loop
      var done = false
      while (!done) {
        val tag = in.readByte().toChar
        val len = in.readInt()
        if (len < 4 || len > MaxFrameBytes) {
          // unrecoverable: the stream is desynchronized — answer, close
          sendError(out, s"invalid message length $len", "08P01")
          out.flush()
          done = true
        } else {
          val body = new Array[Byte](len - 4)
          in.readFully(body)
          tag match {
            case 'Q' =>
              val sql = new String(body, 0, math.max(0, body.length - 1),
                StandardCharsets.UTF_8) // strip trailing NUL
              handleQuery(out, exec, sql)
              readyForQuery(out)
            case 'X' => done = true
            case 'S' => readyForQuery(out) // Sync (extended-flow stray)
            case other =>
              sendError(out,
                s"unsupported frontend message '$other' " +
                  "(simple query protocol only)", "0A000")
              readyForQuery(out)
          }
        }
      }
    } catch {
      case _: EOFException => // client went away mid-message
      case _: java.io.IOException =>
    } finally sock.close()
  }

  private def handleQuery(out: DataOutputStream, exec: Executor,
      sql: String): Unit =
    try {
      if (sql.trim.isEmpty || sql.trim == ";") {
        send(out, 'I')(_ => ()) // EmptyQueryResponse
        return
      }
      exec.execute(sql) match {
        case None =>
          // statement tag: first keyword(s), the way psql displays them
          val words = sql.trim.split("\\s+").take(2).map(_.toUpperCase)
          val tag0 = words.headOption.getOrElse("OK")
          val cmdTag =
            if (tag0 == "CREATE" || tag0 == "DROP") words.mkString(" ")
            else tag0
          send(out, 'C')(cstring(_, cmdTag))
        case Some(df) =>
          val schema = df.schema
          send(out, 'T') { b =>
            b.writeShort(schema.length)
            schema.foreach { f =>
              cstring(b, f.name)
              b.writeInt(0)    // table OID
              b.writeShort(0)  // column attribute number
              b.writeInt(pgTypeOid(f.dataType))
              b.writeShort(-1) // type size (variable)
              b.writeInt(-1)   // type modifier
              b.writeShort(0)  // text format
            }
          }
          val fetched = df.limit(defaultMaxRows + 1).collect()
          val rows = fetched.take(defaultMaxRows)
          rows.foreach { row =>
            send(out, 'D') { b =>
              b.writeShort(schema.length)
              (0 until schema.length).foreach { i =>
                if (row.isNullAt(i)) b.writeInt(-1)
                else {
                  val bytes =
                    render(row.get(i)).getBytes(StandardCharsets.UTF_8)
                  b.writeInt(bytes.length)
                  b.write(bytes)
                }
              }
            }
          }
          if (fetched.length > defaultMaxRows)
            sendNotice(out,
              s"result truncated at $defaultMaxRows rows " +
                "(use LIMIT, an aggregate, or COPY TO for bulk export)")
          send(out, 'C')(cstring(_, s"SELECT ${rows.length}"))
      }
    } catch {
      // NonFatal only (SqlServer policy): a fatal JVM error propagates
      // out of this per-connection daemon thread instead of masquerading
      // as a SQL error. By itself that only kills the thread — the
      // standalone entry points install [[FatalErrorHalt]] so it halts
      // the whole process rather than leaving a corrupted JVM serving
      // other connections.
      case scala.util.control.NonFatal(e) =>
        sendError(out,
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    }
}

/** Standalone entry point:
  * `runMain graft.server.PgServeMain [scopeSpec.json] [port] [bindAddr]`
  * — e.g. `psql -h 127.0.0.1 -p <port> -c 'select 1 + 1'` connects
  * directly. Binds loopback unless bindAddr is given (trust auth). */
object PgServeMain {
  def main(args: Array[String]): Unit = {
    FatalErrorHalt.install()
    val spec = args.headOption.filter(s => s.nonEmpty && s != "''")
    val port = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val bind = args.drop(2).headOption.filter(_.nonEmpty)
      .map(InetAddress.getByName)
      .getOrElse(InetAddress.getLoopbackAddress)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-pg-server")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new PgWireServer(spark, port = port, scopeSpecPath = spec,
      bindAddress = bind)
    println(s"""{"listening": ${server.boundPort}}""")
    Thread.currentThread.join()
  }
}
