#!/usr/bin/env python3
"""Sentinel-normalized comparison of two graft.Bench full artifacts.

Bench totals from different boxes (or box states) are only comparable
through the sentinel ratio: the two fixed sentinel queries run
unchanged plans, so best-sentinel(B)/best-sentinel(A) measures the
HOST-CLASS speed difference, and dividing the raw total ratio by it
yields the like-for-like engine change (r10 COVERAGE computed this by
hand: 1.54x raw / 1.51x sentinel = 1.02x like-for-like; this script
makes the claim mechanical — r10 verdict task 6).

Usage: bench_compare.py <bench_A.json> <bench_B.json> [topN]
  A = the reference run (e.g. last round), B = the run under test.
Prints a summary plus the topN normalized per-query regressions and
improvements over the common registry. Validation tooling only.
"""
import json
import math
import statistics
import sys

a_path, b_path = sys.argv[1], sys.argv[2]
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8

A = json.load(open(a_path))
B = json.load(open(b_path))


def q_secs(art):
    """queries map normalized to {name: sec} (full artifacts store
    {name: {sec: x, ...}}; pre-r10 artifacts store bare floats)."""
    out = {}
    for k, v in art.get("queries", {}).items():
        out[k] = v["sec"] if isinstance(v, dict) else float(v)
    return out


def best_sentinels(art):
    """min over ADJUDICATED passes (pass 0 excluded: JIT warm-up) per
    sentinel key. Pre-sentinel artifacts (r9 and earlier) fall back to
    the sentinel QUERIES' own warmed min-of-3 entries — the same fixed
    plans, one pass instead of several."""
    passes = art.get("sentinel", {}).get("passes", [])
    adj = passes[1:] if len(passes) > 1 else passes
    best = {}
    for p in adj:
        for k, v in p.items():
            if v > 0:
                best[k] = min(best.get(k, v), v)
    if not best:
        qs = q_secs(art)
        for name in ("q01_pricing_summary", "tx02_token_counts"):
            if qs.get(name, -1) > 0:
                best[name[:4]] = qs[name]
    return best


sa, sb = best_sentinels(A), best_sentinels(B)
common_s = sorted(set(sa) & set(sb))
if not common_s:
    sys.exit("no common sentinel keys — cannot normalize")
ratios = {k: sb[k] / sa[k] for k in common_s}
# geometric mean: the sentinels are two independent probes of one
# host-class factor
sent_ratio = math.exp(sum(math.log(r) for r in ratios.values())
                      / len(ratios))

qa = {k: v for k, v in q_secs(A).items() if v >= 0}
qb = {k: v for k, v in q_secs(B).items() if v >= 0}
common = sorted(set(qa) & set(qb))
tot_a = sum(qa[q] for q in common)
tot_b = sum(qb[q] for q in common)
raw_ratio = tot_b / tot_a
norm_ratio = raw_ratio / sent_ratio
per_q = {q: qb[q] / qa[q] for q in common}
per_q_norm = {q: r / sent_ratio for q, r in per_q.items()}
med_norm = statistics.median(per_q_norm.values())


def dirty_tag(art):
    s = art.get("sentinel", {})
    tags = []
    if s.get("dirty"):
        tags.append("DIRTY")
    if s.get("underpowered"):
        tags.append("underpowered")
    if s.get("retried_sections", 0) > 0:
        tags.append(f"recovered({s['retried_sections']} retries)")
    return ",".join(tags) or "clean"


print(f"A: {a_path}  n={len(qa)}  sentinel={dirty_tag(A)}")
print(f"B: {b_path}  n={len(qb)}  sentinel={dirty_tag(B)}")
print(f"sentinel best A={sa}  B={sb}")
print(f"sentinel ratio B/A: " +
      " ".join(f"{k}={r:.3f}" for k, r in sorted(ratios.items())) +
      f"  geomean={sent_ratio:.3f}")
print(f"common queries: {len(common)}  "
      f"total A={tot_a:.1f}s  B={tot_b:.1f}s  raw ratio={raw_ratio:.3f}")
print(f"LIKE-FOR-LIKE (sentinel-normalized): total {norm_ratio:.3f}x, "
      f"per-query median {med_norm:.3f}x")
only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
if only_b:
    t = sum(qb[q] for q in only_b)
    print(f"new in B ({len(only_b)}, {t:.1f}s): " + ", ".join(
        f"{q}={qb[q]:.2f}" for q in sorted(only_b, key=qb.get,
                                           reverse=True)[:top_n]))
if only_a:
    print(f"dropped from B ({len(only_a)}): {', '.join(only_a[:top_n])}")

worst = sorted(common, key=lambda q: per_q_norm[q], reverse=True)[:top_n]
best = sorted(common, key=lambda q: per_q_norm[q])[:top_n]
print(f"top normalized regressions (B/A/sentinel):")
for q in worst:
    print(f"  {q:28s} {qa[q]:7.2f}s -> {qb[q]:7.2f}s  "
          f"norm {per_q_norm[q]:.2f}x")
print(f"top normalized improvements:")
for q in best:
    print(f"  {q:28s} {qa[q]:7.2f}s -> {qb[q]:7.2f}s  "
          f"norm {per_q_norm[q]:.2f}x")
