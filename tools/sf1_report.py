#!/usr/bin/env python3
"""Scale-up report: compare a full-surface sf1 bench_detail dump against the
sf0.1 idle-box run and flag superlinear queries.

Usage: python3 tools/sf1_report.py <sf01_detail.json> <sfN_detail.json> [factor]

`factor` is the input-size ratio between the two runs (default 10; pass 100
when comparing an sf10 dump against sf0.1).

For each query prints nothing unless it is an outlier; the summary block
reports the wall-ratio distribution and the flag list. Flag rule (r13
verdict item 1): wall_ratio > factor (superlinear in the input) AND
wall_ratio > output_row_ratio (so output-bound growth — a join that
legitimately emits 40x the pairs — is distinguished from a broken plan).
Developer tooling only.
"""
import json, sys


def main():
    a = json.load(open(sys.argv[1]))  # sf0.1
    b = json.load(open(sys.argv[2]))  # sfN
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
    print(f"common queries: {n}")
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
