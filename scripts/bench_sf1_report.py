#!/usr/bin/env python3
"""Compare per-query bench minima between sf0.1 and the derived sf1.0
set (10x row-replicated sf0.1, per-replica key offsets; dims fixed).

Usage: bench_sf1_report.py <bench_queries.jsonl> [out_md]

Picks the LATEST line whose sf path mentions sf1.0 and the latest for
sf0.1, calibration-normalizes each side by its recorded `calib`, and
reports the per-query scaling ratio (sf1 / sf0.1 in calib units).
A perfectly linear operator on 10x data shows ratio ~10; sub-linear
(broadcast/domain-bounded work) shows less; anything >2x ABOVE the
battery's median ratio is flagged as a potential super-linear
scale-up and listed first.
"""
import json, sys, statistics

def latest(lines, tag):
    rows = [l for l in lines if tag in l.get("sf", "")]
    return rows[-1] if rows else None

def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_queries.jsonl"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    lines = [json.loads(l) for l in open(path) if l.strip()]
    a = latest(lines, "sf0.1")
    b = latest(lines, "sf1.0")
    if not a or not b:
        sys.exit("need both sf0.1 and sf1.0 lines in " + path)
    ca, cb = a.get("calib", 1.0), b.get("calib", 1.0)
    rows = []
    for q, t1 in sorted(b["queries"].items()):
        t0 = a["queries"].get(q)
        if t0 is None:
            continue
        ratio = (t1 / cb) / (t0 / ca)
        rows.append((q, t0, t1, ratio))
    med = statistics.median(r[3] for r in rows)
    flagged = [r for r in rows if r[3] > 2 * max(med, 1.0)]
    rep = []
    rep.append(f"sf0.1 calib={ca:.3f}  sf1.0 calib={cb:.3f}")
    rep.append(f"queries compared: {len(rows)}")
    rep.append(f"total sf0.1={sum(r[1] for r in rows):.1f}s  "
               f"total sf1.0={sum(r[2] for r in rows):.1f}s")
    rep.append(f"median calib-normalized scaling ratio (10x data): "
               f"{med:.2f}")
    rep.append(f"flagged (> 2x the max(median,1)): {len(flagged)}")
    rep.append("")
    rep.append("| query | sf0.1 s | sf1.0 s | ratio |")
    rep.append("|---|---|---|---|")
    for q, t0, t1, r in sorted(rows, key=lambda x: -x[3]):
        mark = " **FLAG**" if r > 2 * max(med, 1.0) else ""
        rep.append(f"| {q}{mark} | {t0:.2f} | {t1:.2f} | {r:.2f} |")
    text = "\n".join(rep)
    if out:
        open(out, "w").write(text + "\n")
    print("\n".join(rep[:8]))
    for q, t0, t1, r in sorted(rows, key=lambda x: -x[3])[:15]:
        print(f"  {q:32s} {t0:7.2f} -> {t1:7.2f}  x{r:5.2f}")

if __name__ == "__main__":
    main()
