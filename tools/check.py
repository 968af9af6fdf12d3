#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each parquet table in sfDir as a DuckDB view, runs every entry of
<verifyOutDir>/oracle_sql.json, loads the corresponding Spark result
parquet, sorts columns by name and rows by all columns, and compares
values exactly. This is developer tooling only (driver-side python libs);
it ships no code into the Spark library.
"""
import sys, os, json, glob
import duckdb

def normalize(rows, ncols):
    # canonical tuple form; floats kept exact (we design queries so both
    # engines produce bit-identical values)
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    results = {}
    spark_dirs = [d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d))]
    for name in sorted(set(spark_dirs) | set(oracle)):
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        sq = con.execute(
            f"SELECT * FROM '{spath}/*.parquet'")
        s_rows, s_cols = sq.fetchall(), [d[0] for d in sq.description]
        if name not in oracle:
            results[name] = f"NO_ORACLE rows={len(s_rows)}"
            continue
        try:
            dq = con.execute(oracle[name])
            d_rows, d_cols = dq.fetchall(), [d[0] for d in dq.description]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e).splitlines()[0][:160]}"
            continue
        # sort columns by name (driver semantics)
        s_ix = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        d_ix = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        if sorted(s_cols) != sorted(d_cols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}"
            continue
        # strict TYPE compare (duckdb-rendered), since the driver's hash is
        # type-sensitive (r2: 5 value-equal queries failed on decimal
        # precision / int width alone)
        s_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE (SELECT * FROM '{spath}/*.parquet')").fetchall()}
        d_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE ({oracle[name]})").fetchall()}
        t_diff = {c: (s_t.get(c), d_t.get(c)) for c in s_t if s_t.get(c) != d_t.get(c)}
        if t_diff:
            results[name] = f"TYPE_MISMATCH {t_diff}"
            continue
        s_n = normalize([tuple(r[i] for i in s_ix) for r in s_rows], len(s_cols))
        d_n = normalize([tuple(r[i] for i in d_ix) for r in d_rows], len(d_cols))
        if len(s_n) != len(d_n):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s_n)} duck={len(d_n)}"
            continue
        diff = None
        for i, (a, b) in enumerate(zip(s_n, d_n)):
            if a != b:
                diff = (i, a, b)
                break
        if diff:
            results[name] = f"VALUE_MISMATCH at sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}\n  cols ={sorted(s_cols)}"
        else:
            results[name] = f"OK rows={len(s_n)}"

    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_weak = sum(1 for v in results.values() if v.startswith("NO_ORACLE"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith('OK') else ('WEAK' if results[k].startswith('NO_ORACLE') else 'FAIL'):4} {k}: {results[k]}")
    print(f"\n{n_ok} ok / {n_weak} rows-only / {len(results) - n_ok - n_weak} failing / {len(results)} total")
    sys.exit(0 if n_ok + n_weak == len(results) else 1)

if __name__ == "__main__":
    main()
