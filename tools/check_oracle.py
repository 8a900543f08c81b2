#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sf_dir
tables, and compares row counts + sorted-row hashes (columns sorted by
name, rows sorted, values stringified with float rounding).

Crash/timeout-proof (round-11, VERDICT r10 item 1): every query's
verdict is written INCREMENTALLY — appended to <outdir>/
oracle_check.jsonl and the summary <outdir>/oracle_check.json is
rewritten after every query — so a kill at 50% still leaves 50% of
the rows on disk instead of an empty artifact. Each row carries the
DuckDB wall time so slow oracles are attributable, and a per-query
watchdog (ORACLE_TIMEOUT_SEC, default 300) interrupts any single
DuckDB statement that hangs, failing THAT query and moving on — one
pathological oracle can no longer stall the whole gate.
"""
import sys, os, json, glob, hashlib, time, threading

import duckdb


class LateInterrupt(Exception):
    """The watchdog fired AFTER the statement completed (finish-at-the-
    budget race): the result is good, but a pending interrupt may be
    parked on the shared connection and would spuriously fail the NEXT
    statement. Carries the result; the caller must rotate connections."""
    def __init__(self, df):
        super().__init__("late interrupt")
        self.df = df


def run_with_budget(con, sql, budget_sec):
    """Run one statement under a watchdog: con.interrupt() fires if it
    exceeds the budget, turning a hang into a per-query failure. A
    `fired` flag distinguishes the three outcomes (round-12 ADVICE):
    clean finish; true timeout (fired + exception -> report 'timeout'
    explicitly, not a bare InterruptException); and the fired-but-
    completed race -> LateInterrupt so the caller discards the tainted
    connection instead of letting the stray interrupt hit query N+1."""
    fired = threading.Event()

    def kick():
        fired.set()
        con.interrupt()

    timer = threading.Timer(budget_sec, kick)
    t0 = time.time()
    timer.start()
    try:
        df = con.sql(sql).df()
    except Exception as e:
        if fired.is_set():
            raise TimeoutError(f"oracle timeout after {budget_sec}s") from e
        raise
    finally:
        timer.cancel()
        # cancel() does not stop an already-running callback: join the
        # timer thread so `fired` is final before we decide taintedness
        # (round-13 ADVICE — the residual TOCTOU let a scheduled-but-
        # not-yet-fired kick() interrupt query N+1 on the shared
        # connection after we returned "clean").
        timer.join()
    if fired.is_set() or time.time() - t0 >= budget_sec:
        raise LateInterrupt(df)
    return df


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


def check_one(con, outdir, name, sql, budget_sec):
    """Returns (passed: bool, reason: str, n_rows: int, tainted: bool);
    tainted means the shared connection may hold a stray interrupt and
    the caller must rotate to a fresh one before the next query."""
    res_dir = f"{outdir}/{name}"
    if not glob.glob(f"{res_dir}/*.parquet"):
        return False, "no spark result", 0, False
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        try:
            want = run_with_budget(con, sql, budget_sec)
            tainted = False
        except LateInterrupt as li:
            want = li.df
            tainted = True
    except TimeoutError as e:
        return False, str(e), 0, True
    except Exception as e:
        return False, str(e), 0, False
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        return False, f"cols {gcols} vs {wcols}", len(got), tainted
    if len(got) != len(want):
        return False, f"rows {len(got)} vs {len(want)}", len(got), tainted
    # dtype-kind parity: DuckDB HUGEINT (e.g. sum over INTEGER) lands in
    # pandas as float64/object while Spark writes int64 — the driver's
    # compare is dtype-sensitive even when stringified values agree.
    kind_mismatch = [
        c for c in gcols
        if got[c].dtype.kind != want[c].dtype.kind
        and not {got[c].dtype.kind, want[c].dtype.kind} <= {"i", "u"}]
    if kind_mismatch:
        return False, ("dtype kind mismatch on " + ", ".join(
            f"{c}: {got[c].dtype} vs {want[c].dtype}" for c in kind_mismatch)), \
            len(got), tainted
    gh = canon(got.to_dict("records"), gcols)
    wh = canon(want.to_dict("records"), wcols)
    if gh != wh:
        return False, f"hash mismatch ({len(got)} rows)", len(got), tainted
    return True, "", len(got), tainted


def main(outdir, sfdir):
    def fresh_con():
        c = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            p = f"{sfdir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    con = fresh_con()
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    budget_sec = float(os.environ.get("ORACLE_TIMEOUT_SEC", "300"))
    n_pass = n_fail = 0
    results = {}
    jsonl_path = f"{outdir}/oracle_check.jsonl"
    json_path = f"{outdir}/oracle_check.json"
    open(jsonl_path, "w").close()  # fresh run, fresh log
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        passed, reason, n_rows, tainted = check_one(
            con, outdir, name, sql, budget_sec)
        dt = round(time.time() - t0, 3)
        if tainted:
            # the watchdog's interrupt touched this connection (true
            # timeout or the finish-at-the-budget race) — a stray
            # pending interrupt must not fail the NEXT query
            con.close()
            con = fresh_con()
        if passed:
            print(f"PASS {name} ({n_rows} rows, {dt}s)", flush=True)
            n_pass += 1
        else:
            print(f"FAIL {name}: {reason}", flush=True)
            n_fail += 1
        row = {"name": name, "pass": passed, "rows": n_rows, "sec": dt}
        if reason:
            row["reason"] = reason
        results[name] = row
        # Incremental truth: a kill/timeout mid-run leaves every
        # completed query's verdict on disk, never an empty artifact.
        with open(jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        with open(json_path, "w") as f:
            json.dump({"pass": n_pass, "fail": n_fail,
                       "queries": results}, f, indent=0)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
