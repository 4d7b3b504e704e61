#!/usr/bin/env python3
"""Non-JVM client for graft.server.SqlServer — proof that the JSON-lines
wire protocol is client-neutral (the reference's DBAPI analog,
/root/reference/src/framequery/alchemy/dbapi.py:85-123: connect, execute
with parameters, fetch, error recovery). Dev tool only; stdlib only.

Usage:
  python3 tools/sql_client.py <port> "<sql>" [param ...]   # one query
  python3 tools/sql_client.py <port> --selftest            # protocol checks

Start a server first, e.g.:
  sbt -batch "runMain graft.server.ServeMain '' 7777"
"""
import json
import socket
import sys


class GraftConnection:
    """DBAPI-shaped connection: one socket, sequential request/response."""

    def __init__(self, host, port):
        self.sock = socket.create_connection((host, port))
        self.rfile = self.sock.makefile("r", encoding="utf-8")

    def execute(self, sql, params=None, max_rows=10000):
        req = {"sql": sql, "maxRows": max_rows}
        if params is not None:
            req["params"] = params
        self.sock.sendall((json.dumps(req) + "\n").encode("utf-8"))
        resp = json.loads(self.rfile.readline())
        if "error" in resp:
            raise RuntimeError(resp["error"])
        return resp  # {"ok":true} or {"columns","rows","rowCount","truncated"}

    def close(self):
        self.sock.close()


def selftest(port):
    c = GraftConnection("127.0.0.1", port)
    # 1. FROM-less select with positional parameters
    r = c.execute("select %s + 1 as a, upper(%s) as b", [41, "ok"])
    assert r["columns"] == ["a", "b"], r
    assert r["rows"] == [[42, "OK"]], r
    # 2. statement (DDL) → {"ok": true}; effects persist on the connection
    assert c.execute("create table t as select 3 as x").get("ok") is True
    assert c.execute("select x from t")["rows"] == [[3]]
    # 3. named parameters
    r = c.execute("select x from t where x = %(v)s", {"v": 3})
    assert r["rowCount"] == 1, r
    # 4. maxRows truncation is flagged
    c.execute("create table big as select * from generate_series(0, 99)")
    r = c.execute("select * from big", max_rows=10)
    assert r["rowCount"] == 10 and r["truncated"] is True, r
    # 5. error recovery: a failed statement leaves the connection usable
    try:
        c.execute("select definitely_not_a_column from t")
        raise AssertionError("expected an error response")
    except RuntimeError:
        pass
    assert c.execute("select x from t")["rows"] == [[3]]
    # 6. NULLs survive the positional re-assembly
    r = c.execute("select null as n, 1 as one")
    assert r["rows"] == [[None, 1]], r
    c.close()
    print("selftest: 6/6 protocol checks passed")


if __name__ == "__main__":
    port = int(sys.argv[1])
    if sys.argv[2] == "--selftest":
        selftest(port)
    else:
        conn = GraftConnection("127.0.0.1", port)
        out = conn.execute(sys.argv[2], [json.loads(p) if p.lstrip("-").isdigit()
                                         else p for p in sys.argv[3:]] or None)
        print(json.dumps(out, indent=2))
        conn.close()
