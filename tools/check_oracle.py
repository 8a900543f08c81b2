#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sf_dir
tables, and compares row counts + sorted-row hashes (columns sorted by
name, rows sorted, values stringified with float rounding).
"""
import sys, os, json, glob, hashlib

import duckdb


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest()


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: cols {gcols} vs {wcols}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        # dtype-kind parity: DuckDB HUGEINT (e.g. sum over INTEGER) lands in
        # pandas as float64/object while Spark writes int64 — the driver's
        # compare is dtype-sensitive even when stringified values agree.
        kind_mismatch = [
            c for c in gcols
            if got[c].dtype.kind != want[c].dtype.kind
            and not {got[c].dtype.kind, want[c].dtype.kind} <= {"i", "u"}]
        if kind_mismatch:
            print(f"FAIL {name}: dtype kind mismatch on {kind_mismatch}: "
                  + ", ".join(f"{c}: {got[c].dtype} vs {want[c].dtype}" for c in kind_mismatch))
            n_fail += 1
            continue
        gh = canon(got.to_dict("records"), gcols)
        wh = canon(want.to_dict("records"), wcols)
        if gh != wh:
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
