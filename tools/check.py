#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Scale-sweep knobs (both off by default; the default path stays a faithful
driver mirror):
- ORACLE_TIMEOUT_S=<n>: per-oracle wall cap (timer thread + con.interrupt,
  same mechanism as time_oracle.py). A 10x/100x sweep must not hang on one
  intentionally-naive oracle formulation; the timeout is reported as
  ORACLE_TIMEOUT, counted as neither pass nor fail in the summary.
- CHECK_SQL_ROWS=<n>: outputs larger than n rows are compared inside
  DuckDB (count + two order-insensitive folds of a per-row hash over the
  name-sorted columns) instead of rendered-pandas — the sf10 ANN outputs
  run 120-210M rows, far past what a python row-render can hold. Reported
  as OK_SQLHASH; type equality is still checked strictly first, so the
  driver's type-tagged render semantics are preserved by the type gate.

Faithfully reproduces the driver's compare pipeline (this matters — r3
shipped believing 51/52 green while the driver saw 42/52):
- the Spark result parquet is read through pandas/pyarrow, which keeps
  DECIMAL columns as Python Decimal objects;
- the oracle SQL runs in DuckDB and comes back via .df(), which converts
  DECIMAL to float64;
- cells are compared RENDERED (type-tagged str), not with Python ==,
  because Decimal('252685.00') == 252685.0 is True in Python but hashes
  differently in the driver (the exact bug that masked 8 failures in r3).

Developer tooling only (driver-side python libs); ships no code into the
Spark library.
"""
import sys, os, json, glob, threading
import duckdb
import pandas as pd


def timed_execute(con, sql, timeout_s):
    """Run sql on con; interrupt after timeout_s seconds (0 = no cap).
    Returns (cursor, timed_out)."""
    if not timeout_s:
        return con.execute(sql), False
    fired = []
    t = threading.Timer(timeout_s, lambda: (fired.append(1), con.interrupt()))
    t.start()
    try:
        cur = con.execute(sql)
        return cur, False
    except duckdb.InterruptException:
        return None, True
    except Exception:
        if fired:
            return None, True
        raise
    finally:
        t.cancel()


def render(x):
    # type-tagged rendered form: Decimal-vs-float and int-width divergences
    # must show as FAIL locally, matching the driver's type- and
    # render-sensitive hash
    if x is None or x != x:  # None or NaN
        return "\x00NULL"
    return f"{type(x).__name__}:{x}"


def canon(df):
    """Sort columns by name (driver semantics), render cells, sort rows."""
    df = df[sorted(df.columns)]
    rows = [tuple(render(x) for x in r)
            for r in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # CHECK_MEM_LIMIT (e.g. "48GB"): cap DuckDB so a 10x-scale oracle
    # spills to disk instead of drawing the OOM killer — an unbounded
    # sf10 containment oracle was SIGKILLed at 125 GB in r16.
    mem = os.environ.get("CHECK_MEM_LIMIT")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver testdata ships single files; Spark-written tables
        # (tools/ScaleUp output) are part-file directories
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "0"))
    sql_rows = int(os.environ.get("CHECK_SQL_ROWS", "0"))
    results = {}
    spark_dirs = [d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d))]
    # incremental stderr progress (flushed per query) so a killed sweep
    # still leaves every completed verdict on disk
    _last = [None]

    def _flush_last():
        if _last[0] is not None and _last[0] in results:
            print(f"CHECKQ {_last[0]}: {results[_last[0]]}",
                  file=sys.stderr, flush=True)

    for name in sorted(set(spark_dirs) | set(oracle)):
        _flush_last()
        _last[0] = name
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        parts = sorted(glob.glob(os.path.join(spath, "*.parquet")))
        if not parts:
            results[name] = "EMPTY_SPARK_OUTPUT_DIR"
            continue
        s_cnt = con.execute(
            f"SELECT count(*) FROM '{spath}/*.parquet'").fetchone()[0]
        if name not in oracle:
            results[name] = f"NO_ORACLE rows={s_cnt}"
            continue
        if sql_rows and s_cnt > sql_rows:
            # SQL-side compare for outputs too big for a python row-render:
            # strict type gate first (driver semantics), then count + two
            # order-insensitive folds of a per-row hash over name-sorted
            # columns, computed by the SAME DuckDB on both sides.
            s_t = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE (SELECT * FROM '{spath}/*.parquet')").fetchall()}
            try:
                d_t = {r[0]: r[1] for r in con.execute(
                    f"DESCRIBE ({oracle[name]})").fetchall()}
            except Exception as e:
                results[name] = f"ORACLE_SQL_ERROR: {str(e).splitlines()[0][:160]}"
                continue
            if sorted(s_t) != sorted(d_t):
                results[name] = (f"SCHEMA_MISMATCH spark={sorted(s_t)} "
                                 f"duck={sorted(d_t)}")
                continue
            t_diff = {c: (s_t[c], d_t[c]) for c in s_t if s_t[c] != d_t[c]}
            if t_diff:
                results[name] = f"TYPE_MISMATCH {t_diff}"
                continue
            cols = ", ".join(f'"{c}"' for c in sorted(s_t))
            fold = (f"count(*) AS n, bit_xor(hash({cols})) AS hx, "
                    f"sum(hash({cols}) >> 33) AS hs")
            s_res = con.execute(
                f"SELECT {fold} FROM '{spath}/*.parquet'").fetchone()
            try:
                cur, timed_out = timed_execute(
                    con, f"SELECT {fold} FROM ({oracle[name]})", timeout_s)
            except Exception as e:
                results[name] = f"ORACLE_SQL_ERROR: {str(e).splitlines()[0][:160]}"
                continue
            if timed_out:
                results[name] = f"ORACLE_TIMEOUT >{timeout_s}s (spark rows={s_cnt})"
                continue
            d_res = cur.fetchone()
            if s_res == d_res:
                results[name] = f"OK_SQLHASH rows={s_cnt}"
            else:
                results[name] = (f"SQLHASH_MISMATCH spark={s_res} duck={d_res}")
            continue
        # pandas/pyarrow read — the driver's path (keeps Decimal objects)
        s_df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        try:
            # .df() — the driver's path (DECIMAL -> float64)
            cur, timed_out = timed_execute(con, oracle[name], timeout_s)
            if timed_out:
                results[name] = f"ORACLE_TIMEOUT >{timeout_s}s (spark rows={s_cnt})"
                continue
            d_df = cur.df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e).splitlines()[0][:160]}"
            continue
        if sorted(s_df.columns) != sorted(d_df.columns):
            results[name] = (f"SCHEMA_MISMATCH spark={sorted(s_df.columns)} "
                             f"duck={sorted(d_df.columns)}")
            continue
        # binary cells crash the driver's pandas sort ("unhashable type:
        # bytearray", r3 q_multimodal_frames) — flag before comparing
        bin_cols = [c for c in s_df.columns
                    if s_df[c].map(lambda v: isinstance(v, (bytes, bytearray))).any()]
        if bin_cols:
            results[name] = (f"BINARY_OUTPUT_UNHASHABLE cols={bin_cols} "
                             "(driver pandas compare crashes on bytes — emit hex VARCHAR)")
            continue
        # strict TYPE compare (duckdb-rendered) as an early, readable signal
        s_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE (SELECT * FROM '{spath}/*.parquet')").fetchall()}
        d_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE ({oracle[name]})").fetchall()}
        t_diff = {c: (s_t.get(c), d_t.get(c)) for c in s_t if s_t.get(c) != d_t.get(c)}
        if t_diff:
            results[name] = f"TYPE_MISMATCH {t_diff}"
            continue
        s_n, d_n = canon(s_df), canon(d_df)
        if len(s_n) != len(d_n):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s_n)} duck={len(d_n)}"
            continue
        diff = None
        for i, (a, b) in enumerate(zip(s_n, d_n)):
            if a != b:
                diff = (i, a, b)
                break
        if diff:
            results[name] = (f"RENDER_MISMATCH at sorted-row {diff[0]}:\n"
                             f"  spark={diff[1]}\n  duck ={diff[2]}\n"
                             f"  cols ={sorted(s_df.columns)}")
        else:
            results[name] = f"OK rows={len(s_n)}"

    _flush_last()
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_weak = sum(1 for v in results.values()
                 if v.startswith("NO_ORACLE") or v.startswith("ORACLE_TIMEOUT"))
    for k in sorted(results):
        v = results[k]
        status = ('PASS' if v.startswith('OK')
                  else ('WEAK' if v.startswith('NO_ORACLE')
                        or v.startswith('ORACLE_TIMEOUT') else 'FAIL'))
        print(f"{status:4} {k}: {results[k]}")
    print(f"\n{n_ok} ok / {n_weak} rows-only-or-timeout / "
          f"{len(results) - n_ok - n_weak} failing / {len(results)} total")
    sys.exit(0 if n_ok + n_weak == len(results) else 1)


if __name__ == "__main__":
    main()
