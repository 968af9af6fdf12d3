#!/usr/bin/env python3
"""Scale-up report: compare a full-surface sf1 bench_detail dump against the
sf0.1 idle-box run and flag superlinear queries.

Usage: python3 tools/sf1_report.py <sf01_detail.json> <sf1_detail.json>

For each query prints nothing unless it is an outlier; the summary block
reports the wall-ratio distribution and the flag list. Flag rule (r13
verdict item 1): wall_ratio > 10 (superlinear in the 10x input) AND
wall_ratio > output_row_ratio (so output-bound growth — a join that
legitimately emits 40x the pairs — is distinguished from a broken plan).
Developer tooling only.
"""
import json, sys


def main():
    a = json.load(open(sys.argv[1]))  # sf0.1
    b = json.load(open(sys.argv[2]))  # sf1
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
        if wr > 10 and wr > orat:
            flags.append((q, round(wr, 1), round(orat, 1), t0, t1, out0, out1))
    ratios.sort()
    n = len(ratios)
    med = ratios[n // 2][0]
    sub = sum(1 for r, _ in ratios if r < 10)
    print(f"common queries: {n}")
    print(f"median wall ratio (sf1/sf0.1): {med:.2f}x at 10x rows")
    print(f"sub-linear (<10x wall at 10x data): {sub}/{n}")
    print("slowest 10 by ratio:")
    for r, q in ratios[-10:][::-1]:
        print(f"  {q}: {r:.1f}x ({qa[q]:.2f}s -> {qb[q]:.2f}s, rows {ra.get(q)} -> {rb.get(q)})")
    print(f"\nFLAGGED (wall>10x AND wall>output ratio): {len(flags)}")
    for q, wr, orat, t0, t1, o0, o1 in flags:
        print(f"  {q}: wall {wr}x vs output {orat}x ({t0:.2f}s->{t1:.2f}s, rows {o0}->{o1})")
    errs = {k: v for k, v in b.get("errors", {}).items()}
    print(f"\nsf1 errors: {errs if errs else 'none'}")


if __name__ == "__main__":
    main()
