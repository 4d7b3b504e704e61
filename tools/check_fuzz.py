#!/usr/bin/env python3
"""DuckDB leg of the grammar fuzz differential (FuzzSpec covers the
Spark-SQL leg in-process). Reads each fuzz result parquet dumped by
graft.tools.FuzzDump, runs the same corpus SQL in DuckDB over views of
the sf parquet tables, and compares sorted rows (floats rounded to 6dp,
the driver's compare precision). Dev tool only — not part of the
library.

Usage: check_fuzz.py <fuzz_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "orders", "part"]


def norm(rows, cols):
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
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    corpus = json.load(open(f"{outdir}/fuzz_sql.json"))
    n_pass = n_fail = 0
    fails = []
    for name, sql in sorted(corpus.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            fails.append(f"FAIL {name}: no spark output ({sql})")
            n_fail += 1
            continue
        try:
            gotrel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got, gotcols = gotrel.fetchall(), list(gotrel.columns)
            exprel = con.sql(sql)
            exp, expcols = exprel.fetchall(), list(exprel.columns)
        except Exception as e:
            fails.append(f"FAIL {name}: {e} ({sql})")
            n_fail += 1
            continue
        if sorted(c.lower() for c in gotcols) != sorted(
                c.lower() for c in expcols):
            fails.append(f"FAIL {name}: cols {sorted(gotcols)} != "
                         f"{sorted(expcols)} ({sql})")
            n_fail += 1
            continue
        g, e = norm(got, gotcols), norm(exp, expcols)
        if g == e:
            n_pass += 1
        else:
            diff = next((p for p in zip(g, e) if p[0] != p[1]), None)
            fails.append(f"FAIL {name}: {len(g)} vs {len(e)} rows, "
                         f"first diff {diff} ({sql})")
            n_fail += 1
    for f in fails[:20]:
        print(f)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
