#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: check_oracle.py <verify_out_dir> <sf_dir>
Reads each <out>/<name> parquet (Spark result) and compares row/schema/hash
against DuckDB running oracle_sql.json on views over the sf parquet tables.
Dev tool only — not part of the library.
"""
import sys, json, glob, os
from decimal import Decimal
import duckdb

INT64_MIN, INT64_MAX = -2**63, 2**63 - 1

def int64_violation(rows):
    """Driver hash contract: every numeric value must fit in int64.

    The driver's hasher fails HUGEINT-range values even when both engines
    agree on them (r5: ta_chunks/ta_scrub/ta_prepare went red at the
    driver while this local sweep was green). Returns the first offending
    value, or None.
    """
    for r in rows:
        for v in r:
            if isinstance(v, bool):
                continue
            if isinstance(v, (int, Decimal)) and (
                    v < INT64_MIN or v > INT64_MAX):
                return v
    return None

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    # sort columns by name (driver contract), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            gotrel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got, gotcols = gotrel.fetchall(), list(gotrel.columns)
            gottypes = dict(zip(gotrel.columns, map(str, gotrel.types)))
            exprel = con.sql(sql)
            exp, expcols = exprel.fetchall(), list(exprel.columns)
            exptypes = dict(zip(exprel.columns, map(str, exprel.types)))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        huge = int64_violation(got)
        if huge is None:
            huge = int64_violation(exp)
        if huge is not None:
            print(f"FAIL {name}: value outside int64 (driver hash "
                  f"contract): {huge}")
            n_fail += 1; continue
        if sorted(gotcols) != sorted(expcols):
            print(f"FAIL {name}: cols {sorted(gotcols)} != {sorted(expcols)}")
            n_fail += 1; continue
        # typed comparison: the driver hashes typed values, so a DuckDB
        # HUGEINT sum vs a Spark BIGINT sum fails there even when the
        # Python values are equal — catch that locally. Int widths up to
        # 64 bits collapse (round-1 evidence: INTEGER-vs-BIGINT rows all
        # hash-matched; only HUGEINT rows failed), so normalize those.
        def normtype(t):
            return "INT64" if t in ("TINYINT", "SMALLINT", "INTEGER",
                                    "BIGINT", "UTINYINT", "USMALLINT",
                                    "UINTEGER") else t
        tdiff = {c: (gottypes[c], exptypes[c]) for c in gotcols
                 if normtype(gottypes[c]) != normtype(exptypes[c])}
        if tdiff:
            print(f"FAIL {name}: type mismatch {tdiff}")
            n_fail += 1; continue
        g, e = norm(got, gotcols), norm(exp, expcols)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            for a, b in list(zip(g, e))[:3]:
                if a != b:
                    print(f"  got {a}\n  exp {b}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
