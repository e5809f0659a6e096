#!/usr/bin/env python3
"""Assemble the anchor's stream section from N graft.StreamBench runs.

Usage:
  python3 tools/merge_stream.py out.json run1.json run2.json [run3.json ...]

Per tier the merged section records the BEST (max rate) across ALL given
runs — the round-14 protocol: per-tier best of N gate-passing runs, every
run's host_before checked against the quietness gate (min(1-min, 5-min)
loadavg < 1.0; refuse otherwise unless --force — and under --force the
note names the failing runs instead of claiming they passed). Per-run
durations (*_sec) and host telemetry are NOT merged to the top level —
a max-rate next to another run's duration would be internally
inconsistent — they live in raw_runs. Driver-side tooling only.
"""
import json, sys

# The three legacy tiers whose rate keys don't follow the *_per_sec
# naming convention. Every other rate key is discovered dynamically from
# the runs themselves (round-15 advice: a hardcoded list silently carried
# run1's value for any new StreamBench tier instead of the best-of-N).
NAMED_RATE_KEYS = {"data_driven", "calendar_append", "windowed_update"}


def rate_keys(runs):
    keys = set()
    for r in runs:
        for k, v in r.items():
            if (k in NAMED_RATE_KEYS or k.endswith("_per_sec")) \
                    and isinstance(v, (int, float)):
                keys.add(k)
    return sorted(keys)


def main(argv):
    force = "--force" in argv
    argv = [a for a in argv if a != "--force"]
    if len(argv) < 3:
        sys.exit("usage: merge_stream.py out.json run1.json run2.json "
                 "[runN.json ...] [--force]")
    out_path, run_paths = argv[0], argv[1:]
    runs = [json.load(open(p)) for p in run_paths]
    gates, failed = [], []
    for p, r in zip(run_paths, runs):
        g = min(r["host_before"]["loadavg"][0], r["host_before"]["loadavg"][1])
        gates.append(g)
        if g >= 1.0:
            failed.append(p)
            if not force:
                sys.exit(f"REFUSING: {p} host_before min(1m,5m) loadavg {g} "
                         ">= 1.0 (quietness gate); re-run on a quiet host or "
                         "pass --force")
    best = {k: v for k, v in runs[0].items()
            if not (k.endswith("_sec") and not k.endswith("_per_sec"))
            and k not in ("host_before", "host_after")}
    for k in rate_keys(runs):
        vals = [r.get(k) for r in runs if r.get(k) is not None]
        if vals:
            best[k] = max(vals)
    gate_str = " / ".join(f"{g:.2f}" for g in gates)
    best["note"] = (
        f"per-tier best of {len(runs)} runs; per-run durations and host "
        f"telemetry in raw_runs; host_before quietness gates (min(1m,5m) "
        f"loadavg) {gate_str}" +
        ("" if not failed else
         f" — GATE FAILED for {', '.join(failed)} (merged under --force)"))
    best["raw_runs"] = runs
    json.dump(best, open(out_path, "w"))
    print(f"wrote {out_path} from {len(runs)} runs")


if __name__ == "__main__":
    main(sys.argv[1:])
