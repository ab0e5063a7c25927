#!/usr/bin/env python3
"""Per-query bench drift report — mechanizes the floor-history
adjudication the round-11/12 verdicts ran by hand.

For every query in the NEWEST bench artifact, compute its FLOOR across
the historical artifacts (each of which is itself a floor-of-N run) and
flag queries whose newest time exceeds both a ratio and an absolute
margin over that floor. Host-steal noise moves many queries by a
uniform factor; a real regression moves specific queries regardless of
what the rest of the suite does — the report separates the two by also
printing the common-set median ratio (a median near the suspects'
ratios = drift; suspects far above a ~1.0 median = real).

Usage:
    python3 tools/bench_drift.py [newest.json [history.json ...]]

Defaults: newest = BENCH_LOCAL.json, history = BENCH_r*.json (sorted).
Exit code 1 if any suspect clears BOTH bars after the median
normalization (candidate real regressions), else 0.
"""
import glob
import json
import re
import statistics
import subprocess
import sys

RATIO_BAR = 1.7      # newest / floor must exceed this ...
ABS_BAR = 0.5        # ... AND newest - floor must exceed this (seconds)

NON_QUERY_KEYS = {"metric", "value", "unit", "runs", "sf", "n", "rc",
                  "cpus", "total"}


def load(path):
    """Bench queries from either graft.Bench's own artifact
    ({"queries": {...}}) or the driver's BENCH_r* wrapper, whose `tail`
    holds the (possibly front-truncated) JSON line — scrape name:float
    pairs and drop the malformed truncation edge."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"]
    tail = d.get("tail") or ""
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
    return {q: float(t) for q, t in pairs if q not in NON_QUERY_KEYS}


def git_history(path, max_revs=8):
    """Committed revisions of `path` — the per-round full-suite
    artifacts, which are complete where the BENCH_r* wrapper tails are
    front-truncated. Yields (label, queries)."""
    try:
        revs = subprocess.run(
            ["git", "rev-list", f"--max-count={max_revs}", "HEAD",
             "--", path],
            capture_output=True, text=True, check=True
        ).stdout.split()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return
    for rev in revs:
        try:
            blob = subprocess.run(
                ["git", "show", f"{rev}:{path}"],
                capture_output=True, text=True, check=True).stdout
            d = json.loads(blob)
            if isinstance(d.get("queries"), dict) and d["queries"]:
                yield f"{path}@{rev[:7]}", d["queries"]
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            continue


def main():
    newest_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
    hist_paths = sys.argv[2:] if len(sys.argv) > 2 else sorted(
        glob.glob("BENCH_r*.json"))
    hist_paths = [p for p in hist_paths if p != newest_path]
    newest = load(newest_path)
    if not hist_paths:
        print("no history artifacts found", file=sys.stderr)
        return 2
    sources = [(p, load(p)) for p in hist_paths]
    # committed revisions of the newest artifact are complete where the
    # wrapper tails are truncated; skip any revision identical to the
    # newest (the just-committed case would pin every ratio to 1.0)
    sources += [(lbl, qd) for lbl, qd in git_history(newest_path)
                if qd != newest]
    floors = {}
    for _, qd in sources:
        for q, t in qd.items():
            if q in floors:
                floors[q] = min(floors[q], t)
            else:
                floors[q] = t

    common = {q: (newest[q], floors[q]) for q in newest if q in floors}
    new_queries = sorted(q for q in newest if q not in floors)
    ratios = sorted(n / f for n, f in common.values() if f > 0)
    med = statistics.median(ratios) if ratios else 1.0

    print(f"newest: {newest_path} ({len(newest)} queries, "
          f"{sum(newest.values()):.1f}s total)")
    print(f"history: {len(sources)} artifacts "
          f"({len(hist_paths)} files + git revisions), "
          f"{len(common)} common queries, median ratio {med:.3f}")
    if new_queries:
        added = sum(newest[q] for q in new_queries)
        print(f"new since history ({len(new_queries)}, {added:.1f}s): "
              + ", ".join(new_queries))

    suspects = []
    for q, (n, f) in sorted(common.items(), key=lambda kv: -kv[1][0]):
        if n > f * RATIO_BAR and n - f > ABS_BAR:
            # normalize by the suite-wide median: if everything drifted
            # 1.3x, a 1.8x query is only 1.4x above the suite
            norm = (n / f) / med if med > 0 else n / f
            suspects.append((q, n, f, n / f, norm))
    if not suspects:
        print("no per-query suspects (all within "
              f"{RATIO_BAR}x+{ABS_BAR}s of history floor)")
        return 0
    print(f"\nsuspects (> {RATIO_BAR}x AND > {ABS_BAR}s over floor):")
    print(f"{'query':36s} {'now':>7s} {'floor':>7s} {'ratio':>6s} {'norm':>6s}")
    real = 0
    for q, n, f, r, norm in suspects:
        flag = " <-- clears bars after median normalization" \
            if norm > RATIO_BAR else ""
        if norm > RATIO_BAR:
            real += 1
        print(f"{q:36s} {n:7.2f} {f:7.2f} {r:6.2f} {norm:6.2f}{flag}")
    print("\nadjudicate flagged queries with a quiet-machine floor-of-3:"
          "\n  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_FILTER=<names>"
          " SPARK_GRAFT_BENCH_OUT=/tmp/refloor.json sbt 'runMain graft.Bench'")
    return 1 if real else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` is a normal way to read this
        sys.exit(0)
