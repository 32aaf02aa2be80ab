#!/usr/bin/env python3
"""Merge two clean bench_full.json runs into tools/bench_baseline.json.

Per VERDICT r10 item 1: the committed per-query baseline is the MEDIAN OF
TWO clean runs separated by a cache drop (median of two = their mean), so
one unusually warm recording run can't set optimistic baselines that read
as drift later. __probe__ = mean of the two runs' MINIMUM probe samples
(the quietest observed cost of the fixed workload).

Effective-times policy (VERDICT r13 item 9 / the BenchAudit rule): a query
a run stamped `suspect` (rep spread >3x) or `haze_suspect` (elevated band)
contributes that run's MIN-of-reps instead of its median — a
load-inflated median must never become a committed baseline.

    python3 tools/merge_baseline.py runA.json runB.json [extra.json ...]

Extra runs contribute only queries absent from the first two (e.g. a
targeted mini-bench of queries added after the full runs).
"""
import json, sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
if len(runs) < 2:
    sys.exit("need at least two bench_full.json runs")


def effective(run, q):
    """Median, unless this run stamped q as load-affected -> min-of-reps."""
    v = run["queries"].get(q)
    if v is None:
        return None
    stamped = set(run.get("suspect") or []) | set(run.get("haze_suspect") or [])
    if q in stamped and run.get("mins", {}).get(q) is not None:
        return run["mins"][q]
    return v


a, b = runs[0], runs[1]
merged = {}
for q in sorted(set(a["queries"]) | set(b["queries"])):
    vals = [v for v in (effective(a, q), effective(b, q)) if v is not None]
    merged[q] = round(sum(vals) / len(vals), 3)
for extra in runs[2:]:
    for q, v in extra["queries"].items():
        if q not in merged:
            merged[q] = round(effective(extra, q), 3)

def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

# __probe__ = mean of the two runs' per-run sample MEDIANS: the verdict
# compares a run's sample median against this, so the baseline must be
# the same statistic (min-of-samples would false-alarm every run — quiet
# samples jitter 0.07-0.27s on this box).
probes, io_probes = [], []
for r in (a, b):
    samples = r.get("probe", {}).get("samples") or [
        r["probe"]["start"], r["probe"]["end"]]
    probes.append(_median(samples))
    io = r.get("probe", {}).get("io_samples")
    if io:
        io_probes.append(_median(io))
merged["__probe__"] = round(sum(probes) / len(probes), 3)
if io_probes:
    merged["__probe_io__"] = round(sum(io_probes) / len(io_probes), 3)

out = "tools/bench_baseline.json"
body = "{\n" + ",\n".join(
    f'  "{k}": {v}' for k, v in sorted(merged.items())) + "\n}\n"
open(out, "w").write(body)
print(f"wrote {len(merged)-1} query baselines + __probe__="
      f"{merged['__probe__']} -> {out}")
