#!/usr/bin/env python3
"""Stdlib-only PostgreSQL EXTENDED-protocol client for the graft PgWireServer.

The container has no psycopg2/JDBC, so this speaks the v3 extended flow
(Parse/Bind/Describe/Execute/Close/Sync) byte-for-byte the way those
clients do, and prints a transcript of every backend message. Run:

    sbt -batch "runMain graft.server.PgServeMain '' 5433" &
    python3 tools/pg_extended_client.py 5433
"""
import socket
import struct
import sys


class Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port))
        self.buf = b""

    # ---- frontend frames
    def _send(self, tag, body):
        self.sock.sendall(tag + struct.pack("!i", 4 + len(body)) + body)

    def startup(self):
        params = b"user\x00ext\x00database\x00graft\x00\x00"
        self.sock.sendall(struct.pack("!ii", 8 + len(params), 196608) + params)
        return self.read_until_ready()

    def parse(self, name, sql, oids=()):
        body = name.encode() + b"\x00" + sql.encode() + b"\x00"
        body += struct.pack("!h", len(oids))
        for o in oids:
            body += struct.pack("!i", o)
        self._send(b"P", body)

    def bind(self, portal, stmt, params=()):
        body = portal.encode() + b"\x00" + stmt.encode() + b"\x00"
        body += struct.pack("!h", 0)  # all-text parameter formats
        body += struct.pack("!h", len(params))
        for p in params:
            if p is None:
                body += struct.pack("!i", -1)
            else:
                v = str(p).encode()
                body += struct.pack("!i", len(v)) + v
        body += struct.pack("!h", 0)  # all-text result formats
        self._send(b"B", body)

    def describe(self, kind, name):
        self._send(b"D", kind.encode() + name.encode() + b"\x00")

    def execute(self, portal, max_rows=0):
        self._send(b"E", portal.encode() + b"\x00" + struct.pack("!i", max_rows))

    def close_msg(self, kind, name):
        self._send(b"C", kind.encode() + name.encode() + b"\x00")

    def bind_bin(self, portal, stmt, params, fmts, result_fmts):
        """Bind with raw byte parameters + explicit format codes."""
        body = portal.encode() + b"\x00" + stmt.encode() + b"\x00"
        body += struct.pack("!h", len(fmts))
        for f in fmts:
            body += struct.pack("!h", f)
        body += struct.pack("!h", len(params))
        for p in params:
            if p is None:
                body += struct.pack("!i", -1)
            else:
                body += struct.pack("!i", len(p)) + p
        body += struct.pack("!h", len(result_fmts))
        for f in result_fmts:
            body += struct.pack("!h", f)
        self._send(b"B", body)

    def sync(self):
        self._send(b"S", b"")
        return self.read_until_ready()

    # ---- backend frames
    def _recv(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise EOFError("server closed connection")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def read_until_ready(self):
        msgs = []
        while True:
            tag = self._recv(1)
            (length,) = struct.unpack("!i", self._recv(4))
            body = self._recv(length - 4)
            msgs.append((tag.decode(), body))
            if tag == b"Z":
                return msgs


def describe_msg(tag, body):
    if tag == "T":
        n = struct.unpack("!h", body[:2])[0]
        cols, off = [], 2
        for _ in range(n):
            end = body.index(b"\x00", off)
            name = body[off:end].decode()
            oid = struct.unpack("!i", body[end + 7:end + 11])[0]
            cols.append(f"{name}:oid={oid}")
            off = end + 19
        return f"RowDescription({', '.join(cols)})"
    if tag == "D":
        n = struct.unpack("!h", body[:2])[0]
        vals, off = [], 2
        for _ in range(n):
            (ln,) = struct.unpack("!i", body[off:off + 4])
            off += 4
            if ln == -1:
                vals.append("NULL")
            else:
                vals.append(body[off:off + ln].decode())
                off += ln
        return f"DataRow({', '.join(vals)})"
    if tag == "t":
        n = struct.unpack("!h", body[:2])[0]
        oids = struct.unpack(f"!{n}i", body[2:2 + 4 * n])
        return f"ParameterDescription{tuple(oids)}"
    names = {"1": "ParseComplete", "2": "BindComplete", "3": "CloseComplete",
             "n": "NoData", "s": "PortalSuspended", "C": "CommandComplete",
             "Z": "ReadyForQuery", "E": "ErrorResponse", "N": "Notice",
             "R": "Authentication", "S": "ParameterStatus", "K": "BackendKeyData",
             "I": "EmptyQueryResponse"}
    label = names.get(tag, tag)
    if tag in ("C", "E", "N"):
        text = body.rstrip(b"\x00").replace(b"\x00", b" ").decode(errors="replace")
        return f"{label}({text})"
    return label


def show(title, msgs, hide_startup=False):
    print(f"--- {title}")
    for tag, body in msgs:
        if hide_startup and tag in ("R", "S", "K"):
            continue
        print(f"  <= {describe_msg(tag, body)}")


def main():
    port = int(sys.argv[1])
    c = Client(port)
    show("startup", c.startup(), hide_startup=True)

    print("=> Parse s1: 'select l_returnflag, count(*) as n, sum(l_quantity) "
          "as qty from lineitem where l_quantity > $1 group by l_returnflag "
          "order by l_returnflag' [oid 23]")
    c.parse("s1", "select l_returnflag, count(*) as n, sum(l_quantity) as qty "
            "from lineitem where l_quantity > $1 "
            "group by l_returnflag order by l_returnflag", oids=(23,))
    print("=> Describe statement s1")
    c.describe("S", "s1")
    show("prepare + describe", c.sync())

    print("=> Bind p1 = s1($1 := 45), Describe portal, Execute maxRows=2")
    c.bind("p1", "s1", params=(45,))
    c.describe("P", "p1")
    c.execute("p1", max_rows=2)
    show("first fetch (expect PortalSuspended)", c.sync())

    print("=> Execute p1 again (drain), Close portal + statement")
    c.execute("p1")
    c.close_msg("P", "p1")
    c.close_msg("S", "s1")
    show("drain + close", c.sync())

    print("=> unnamed stmt: string param with a quote (injection guard)")
    c.parse("", "select $1 as who from region where r_regionkey = 0")
    c.bind("", "", params=("O'Brien; drop table region; --",))
    c.execute("")
    show("string param", c.sync())

    print("=> psycopg2-style chatter: BEGIN / SET / COMMIT via extended flow")
    for chatter in ("BEGIN", "SET statement_timeout = 0", "COMMIT"):
        c.parse("", chatter)
        c.bind("", "")
        c.execute("")
        show(chatter, c.sync())

    print("=> error recovery: bind to missing statement, then reuse connection")
    c.bind("", "nope")
    c.execute("")
    show("expected error", c.sync())
    c.parse("", "select 40 + 2 as answer")
    c.bind("", "")
    c.execute("")
    show("recovered", c.sync())

    print("=> BINARY formats: Bind int8 params (40, 2) fmt=binary, "
          "all-binary results")
    c.parse("", "select $1 + $2 as total, 2.5 :: double as d", oids=(20, 20))
    c.bind_bin("", "", [struct.pack("!q", 40), struct.pack("!q", 2)],
               [1, 1], [1])
    c.execute("")
    for tag, body in c.sync():
        if tag == "D":
            off = 2
            (ln,) = struct.unpack("!i", body[off:off + 4]); off += 4
            total = struct.unpack("!q", body[off:off + ln])[0]; off += ln
            (ln,) = struct.unpack("!i", body[off:off + 4]); off += 4
            d = struct.unpack("!d", body[off:off + ln])[0]
            print(f"  <= DataRow(binary int8 total={total}, "
                  f"binary float8 d={d})")
            assert (total, d) == (42, 2.5), (total, d)
        else:
            print(f"  <= {describe_msg(tag, body)}")
    print("  binary round-trip OK")


if __name__ == "__main__":
    main()
