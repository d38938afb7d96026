#!/usr/bin/env python3
"""Cross-run bench regression gate.

Diffs two bench readings' per-query times and exits non-zero when any
query regressed past the threshold — turning the manual regression
audit (ARCHITECTURE.md "Bench adjudication protocol") into a check.

Accepts either the driver's BENCH_r{N}.json wrapper (whose `tail`
carries the raw stdout line with the per-query map) or a raw `graft.
Bench` stdout capture. A flagged regression is a CANDIDATE, not a
verdict: the adjudication protocol's next step (re-run the query
isolated in a fresh JVM on the same box) is printed with each flag,
because on this hardware a single cold reading can be 2-5x off
(observed and documented; the isolated number is the plan's cost).

Usage:
  python3 tools/bench_diff.py BENCH_r11.json BENCH_r12.json
  python3 tools/bench_diff.py --threshold 1.5 old_bench.log new_bench.log
"""

import argparse
import json
import re
import sys


def load_queries(path):
    """Extract the per-query seconds map from a bench artifact."""
    text = open(path).read()
    # driver wrapper: {"n":..,"tail":"...","parsed":{...}}
    try:
        d = json.loads(text)
        if isinstance(d, dict):
            # BENCH_DETAIL.json: {"query": [t1, t2], ..., "_meta": {...}}
            # — the min-of-2 per-query form the round-over-round
            # adjudication compares (harness fields live under _meta)
            detail = {
                k: min(v) for k, v in d.items()
                if not k.startswith("_") and isinstance(v, list)
                and v and all(isinstance(x, (int, float)) for x in v)
            }
            if detail:
                return detail
            for key in ("tail",):
                if isinstance(d.get(key), str):
                    text = d[key]
                    break
            else:
                if isinstance(d.get("queries"), dict):
                    return d["queries"]
    except json.JSONDecodeError:
        pass
    # raw stdout: find the LAST line carrying a "queries" map
    best = None
    for m in re.finditer(r'\{"queries":\{.*?\}\}', text) or []:
        best = m.group(0)
    if best is None:
        # tail may be a truncated suffix — recover the queries object by
        # bracket-matching from the first '"queries":{'
        i = text.find('"queries":{')
        if i < 0:
            # or the whole tail IS the inner map fragment (driver truncation):
            # fall back to scraping "name":float pairs
            pairs = re.findall(r'"([a-z0-9_]+)":([0-9.]+)', text)
            qs = {k: float(v) for k, v in pairs if not k.startswith(("value", "n", "sf", "rc", "cpus"))}
            if qs:
                return qs
            raise SystemExit(f"{path}: no per-query map found")
        j = i + len('"queries":')
        depth = 0
        for k in range(j, len(text)):
            if text[k] == "{":
                depth += 1
            elif text[k] == "}":
                depth -= 1
                if depth == 0:
                    return json.loads(text[j : k + 1])
        raise SystemExit(f"{path}: unterminated queries map")
    return json.loads(best)["queries"]


def load_adjudicated(path):
    """The _meta.adjudicated map (isolated fresh-JVM re-runs graft.Bench
    recorded for its own flags), when the artifact is a BENCH_DETAIL
    file that carries one. Empty dict otherwise."""
    try:
        d = json.loads(open(path).read())
        meta = d.get("_meta", {}) if isinstance(d, dict) else {}
        adj = meta.get("adjudicated", {})
        return {k: float(v) for k, v in adj.items()} if isinstance(adj, dict) else {}
    except (json.JSONDecodeError, OSError, ValueError):
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag queries slower than old*threshold (default 1.5)")
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="ignore queries faster than this in BOTH runs (noise floor)")
    args = ap.parse_args()

    old = load_queries(args.old)
    new = load_queries(args.new)
    adjudicated = load_adjudicated(args.new)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    flags, improved = [], []
    for q in sorted(set(old) & set(new)):
        a, b = old[q], new[q]
        if max(a, b) < args.min_sec:
            continue
        r = b / a if a > 0 else float("inf")
        if r >= args.threshold:
            flags.append((r, q, a, b))
        elif r <= 1 / args.threshold:
            improved.append((r, q, a, b))

    tot_old = sum(old.values())
    tot_new = sum(new.values())
    print(f"old: {len(old)} queries, {tot_old:.1f}s total   "
          f"new: {len(new)} queries, {tot_new:.1f}s total")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for r, q, a, b in sorted(improved):
        print(f"IMPROVED {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    real = []
    for r, q, a, b in sorted(flags, reverse=True):
        if q in adjudicated:
            # the artifact already carries the isolated fresh-JVM number
            iso = adjudicated[q]
            if a > 0 and iso / a < args.threshold:
                print(f"ADJUDICATED {q}: {a:.2f}s -> {b:.2f}s in-suite, "
                      f"{iso:.2f}s isolated ({iso / a:.2f}x) — window noise, not plan cost")
                continue
            print(f"REGRESSED {q}: {a:.2f}s -> {b:.2f}s "
                  f"({r:.2f}x; isolated {iso:.2f}s CONFIRMS)")
            real.append(q)
            continue
        print(f"REGRESSED {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
        print(f"  adjudicate: SPARK_GRAFT_BENCH_FILTER={q} sbt 'runMain graft.Bench'"
              f"  # isolated fresh-JVM reading = the plan's cost")
        real.append(q)
    if not flags:
        print(f"OK: no query regressed >= {args.threshold}x "
              f"(noise floor {args.min_sec}s)")
    elif not real:
        print(f"OK: all {len(flags)} flag(s) adjudicated as window noise "
              f"(isolated numbers inside the {args.threshold}x threshold)")
    sys.exit(1 if real else 0)


if __name__ == "__main__":
    main()
