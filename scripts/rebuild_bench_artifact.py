#!/usr/bin/env python3
"""Rebuild a graft.Bench full artifact from a run's saved stderr+stdout
logs. Needed when a later bench run overwrote an earlier (cleaner)
run's SPARK_GRAFT_BENCH_OUT file: every per-query min, run list, phase
split and sentinel pass is in the [bench] stderr lines, and the
sentinel verdict is recomputed HERE with the same rule Bench ships
(max pass / median pass > 1.3, or floor breach > 1.3 — pass 0
excluded), so the reconstructed artifact carries the same trust bit
the live run would have stamped. Provenance is recorded in the JSON.
Validation tooling only — not part of the library.

Usage: rebuild_bench_artifact.py <stderr_log> <stdout_log> <out.json>
"""
import json
import re
import statistics
import sys

err, out, dst = sys.argv[1], sys.argv[2], sys.argv[3]

passes = []
queries = {}
for line in open(err):
    m = re.match(r"\[bench\] sentinel (.*)", line)
    if m:
        p = {}
        for kv in m.group(1).split():
            k, v = kv.rsplit("=", 1)
            p[k[:4]] = float(v)
        passes.append(p)
        continue
    m = re.match(
        r"\[bench\] (\S+)\s+w=([\d.]+) (.*?)(?: phases\{(.*)\})?$",
        line.strip())
    if m:
        name, _, runs_s, ph = m.group(1), m.group(2), m.group(3), m.group(4)
        runs = [float(x.split("=")[1]) for x in runs_s.split()]
        entry = {"sec": round(min(runs), 3)}
        if ph:
            entry["phases"] = {k: float(v) for k, v in
                               (kv.split("=") for kv in ph.split(","))}
        queries[name] = entry  # later duplicate (sentinel re-times) wins

# meta from the stdout JSON line
meta = json.loads([l for l in open(out) if l.startswith('{"metric"')][-1])

adj = passes[1:]
names = sorted({k for p in passes for k in p})
drift = 1.0
floor = {"q01_": 0.26, "tx02": 0.19}
floor_ratio = 0.0
for n in names:
    vs = sorted(p[n] for p in adj if p.get(n, 0) > 0)
    if len(vs) >= 2:
        drift = max(drift, vs[-1] / statistics.median(vs))
    if vs:
        floor_ratio = max(floor_ratio, vs[0] / floor[n])
dirty = drift > 1.3 or floor_ratio > 1.3

art = {
    "metric": "total", "value": meta["value"], "unit": "sec",
    "sf": meta["sf"], "runs_per_query": meta["runs_per_query"],
    "warmup_runs": 1, "agg": "min", "n_queries": meta["n_queries"],
    "provenance": f"rebuilt from run logs {err} + {out}; sentinel "
                  "verdict recomputed with the shipped max/median rule",
    "sentinel": {"passes": passes, "drift": round(drift, 3),
                 "floor_ratio": round(floor_ratio, 3), "dirty": dirty},
    "queries": queries,
}
json.dump(art, open(dst, "w"))
print(f"wrote {dst}: total={meta['value']} n={len(queries)} "
      f"drift={drift:.3f} floor={floor_ratio:.3f} dirty={dirty}")
