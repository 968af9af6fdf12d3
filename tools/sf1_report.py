#!/usr/bin/env python3
"""Scale-up report: compare a full-surface sfN bench_detail dump against the
sf0.1 idle-box run and flag superlinear queries.

Usage:
  python3 tools/sf1_report.py <sf01_detail.json[,rep2,rep3]> \
      <sfN_detail.json[,rep2,rep3]> [factor]

Each side accepts a COMMA-SEPARATED list of bench_detail dumps from
back-to-back reps; per-query wall times are the per-query MEDIAN across
the reps. This is the committed-ratio protocol (r14 verdict item 6): the
box shows ±20% run-to-run variance, so any ratio that gets committed or
quoted in BASELINE.md/PLANS.md must be a 3-rep median — either via
SPARK_GRAFT_BENCH_REPS=3 (Bench medians in-process, preferred) or via
three dumps medianed here. Single-dump invocations still work for quick
looks but the summary labels the run "1-rep (NOT committable)".

`factor` is the input-size ratio between the two runs (default 10; pass
100 when comparing an sf10 dump against sf0.1).

For each query prints nothing unless it is an outlier; the summary block
reports the wall-ratio distribution and the flag list. Flag rule (r13
verdict item 1): wall_ratio > factor (superlinear in the input) AND
wall_ratio > output_row_ratio (so output-bound growth — a join that
legitimately emits 40x the pairs — is distinguished from a broken plan).
Developer tooling only.
"""
import json, sys


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def load_side(arg):
    """Load 1+ comma-separated detail dumps; median per-query walls."""
    dumps = [json.load(open(p)) for p in arg.split(",")]
    queries = {}
    for q in set().union(*(d["queries"] for d in dumps)):
        ts = [d["queries"][q] for d in dumps
              if q in d["queries"] and d["queries"][q] is not None]
        if ts:
            queries[q] = median(ts)
    rows = dumps[0].get("rows", {})
    errors = {}
    for d in dumps:
        errors.update(d.get("errors", {}))
    # effective reps: N separate dumps medianed here, OR one dump whose
    # Bench run already medianed in-process (SPARK_GRAFT_BENCH_REPS=3
    # stamps "reps" into bench_detail.json)
    reps = (len(dumps) if len(dumps) > 1
            else dumps[0].get("reps", 1))
    return {"queries": queries, "rows": rows, "errors": errors,
            "reps": reps}


def main():
    a = load_side(sys.argv[1])  # sf0.1
    b = load_side(sys.argv[2])  # sfN
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    ra, rb = a.get("rows", {}), b.get("rows", {})
    common = sorted(set(qa) & set(qb))
    ratios = []
    flags = []
    for q in common:
        t0, t1 = qa[q], qb[q]
        if t0 is None or t1 is None or t0 <= 0:
            continue
        wr = t1 / t0
        ratios.append((wr, q))
        out0, out1 = ra.get(q, 0), rb.get(q, 0)
        orat = (out1 / out0) if out0 else float("inf") if out1 else 1.0
        if wr > factor and wr > orat:
            flags.append((q, round(wr, 1), round(orat, 1), t0, t1, out0, out1))
    ratios.sort()
    n = len(ratios)
    med = ratios[n // 2][0]
    sub = sum(1 for r, _ in ratios if r < factor)
    reps = min(a["reps"], b["reps"])
    tag = (f"{reps}-rep medians" if reps >= 3
           else f"{reps}-rep (NOT committable; protocol = 3-rep medians)")
    print(f"common queries: {n} [{tag}]")
    print(f"median wall ratio: {med:.2f}x at {factor:g}x rows")
    print(f"sub-linear (<{factor:g}x wall at {factor:g}x data): {sub}/{n}")
    print("slowest 10 by ratio:")
    for r, q in ratios[-10:][::-1]:
        print(f"  {q}: {r:.1f}x ({qa[q]:.2f}s -> {qb[q]:.2f}s, rows {ra.get(q)} -> {rb.get(q)})")
    print(f"\nFLAGGED (wall>{factor:g}x AND wall>output ratio): {len(flags)}")
    for q, wr, orat, t0, t1, o0, o1 in flags:
        print(f"  {q}: wall {wr}x vs output {orat}x ({t0:.2f}s->{t1:.2f}s, rows {o0}->{o1})")
    errs = {k: v for k, v in b.get("errors", {}).items()}
    print(f"\nsfN errors: {errs if errs else 'none'}")


if __name__ == "__main__":
    main()
