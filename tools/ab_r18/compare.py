#!/usr/bin/env python3
"""Paired analysis of the round-18 interleaved two-HEAD bench A/B.

Reads tools/ab_r18/ab_{r16,r18}_{1,2,3}.jsonl (full-surface Bench
windows alternating r16 HEAD 974c5f3 / r18 HEAD in one session) and
reports, over the query set COMMON to both heads:
  - per-window common-set totals,
  - per-pair deltas (r18 - r16) in seconds and percent,
  - the cross-head comparison the drift question needs: does the
    within-pair delta collapse inside pair-to-pair noise (host epoch)
    or persist with one sign (code-real)?
  - the top per-query movers in the tightest pair, to name any
    code-real suspect.
"""
import json
import sys
from pathlib import Path

D = Path(__file__).parent
PAIRS = [1, 2, 3]


def load(side, pair):
    f = D / f"ab_{side}_{pair}.jsonl"
    if not f.exists():
        return None
    out = {}
    for line in f.read_text().splitlines():
        try:
            j = json.loads(line)
        except json.JSONDecodeError:
            continue
        if j.get("metric") == "query":
            out[j["name"]] = j["value"]
    return out


def main():
    wins = {(s, p): load(s, p) for p in PAIRS for s in ("r16", "r18")}
    done = {k: v for k, v in wins.items() if v}
    if not done:
        sys.exit("no windows found")
    common = set.intersection(*(set(v) for v in done.values()))
    print(f"common query set across {len(done)} windows: {len(common)} queries")
    tot = {k: sum(v[q] for q in common) for k, v in done.items()}
    for (s, p), t in sorted(tot.items(), key=lambda kv: (kv[0][1], kv[0][0])):
        print(f"  window {s} pair {p}: common total {t:8.1f} s")
    deltas = []
    for p in PAIRS:
        a, b = tot.get(("r16", p)), tot.get(("r18", p))
        if a and b:
            deltas.append((p, b - a, 100.0 * (b - a) / a))
            print(f"pair {p}: r18 - r16 = {b - a:+7.1f} s ({100.0 * (b - a) / a:+5.1f}%)")
    if len(deltas) >= 2:
        ds = [d[1] for d in deltas]
        spread = max(ds) - min(ds)
        mean = sum(ds) / len(ds)
        print(f"mean within-pair delta {mean:+.1f} s, pair-to-pair spread {spread:.1f} s")
        verdict = ("HOST-EPOCH: the within-pair delta is inside pair noise"
                   if abs(mean) <= spread or abs(mean) / (tot[('r16', deltas[0][0])] or 1) < 0.03
                   else "CODE-REAL SUSPECT: a persistent one-signed delta survives pairing")
        print(f"verdict: {verdict}")
    # movers in the tightest pair
    best = min(deltas, key=lambda d: abs(d[1]))[0] if deltas else PAIRS[0]
    a, b = wins.get(("r16", best)), wins.get(("r18", best))
    if a and b:
        movers = sorted(((q, b[q] - a[q], a[q]) for q in common),
                        key=lambda m: -abs(m[1]))[:12]
        print(f"top movers in tightest pair {best} (r18-r16, r16 base):")
        for q, d, base in movers:
            print(f"  {q:28s} {d:+6.2f} s  (r16 {base:5.2f} s)")


if __name__ == "__main__":
    main()
