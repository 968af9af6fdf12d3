#!/usr/bin/env python3
"""Time every DuckDB oracle query at a given SF — the same-scale,
same-action baseline the engine's bench is compared against.

Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json> [exclude ...]

ORACLE_TIMEOUT_S=<n> caps each query's wall time (off by default): a
timer thread calls con.interrupt(), and the query is reported as
"TIMEOUT >Ns" instead of a float. Needed for 10x-scale runs where the
intentionally-naive oracle formulations (all-pairs simhash, recursive-CTE
components, deletion-neighborhood edit join) grow superlinearly — a DNF
within the cap is itself the measurement there.

Developer tooling only (driver-side python libs); ships no code into the
Spark library. Materializes each oracle result fully (fetchall), mirroring
the engine bench's materialize-every-column action.
"""
import sys, os, glob, json, time, threading
import duckdb


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    exclude = set(sys.argv[3:])
    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "0"))
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        # Spark writes a table as a DIRECTORY of part files (the ScaleUp
        # sf1 layout); plain files are the driver-testdata layout
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    # oracle_sql.json produced by the most recent graft.Verify run
    with open(oracle_path) as f:
        oracle = json.load(f)
    times = {}
    for name in sorted(oracle):
        if name in exclude:
            continue
        timer = None
        if timeout_s > 0:
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.start()
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except duckdb.InterruptException:
            times[name] = f"TIMEOUT >{int(timeout_s)}s"
        except Exception as e:
            # an interrupt can also surface as a generic Error mid-pipeline
            if timeout_s > 0 and time.time() - t0 >= timeout_s - 0.5:
                times[name] = f"TIMEOUT >{int(timeout_s)}s"
            else:
                times[name] = f"ERR {type(e).__name__}"
        finally:
            if timer is not None:
                timer.cancel()
        print(f"  {name}: {times[name]}", file=sys.stderr)
    ok = {k: v for k, v in times.items() if isinstance(v, float)}
    print(json.dumps({"total": round(sum(ok.values()), 1), "n": len(ok),
                      "queries": times}))


if __name__ == "__main__":
    main()
