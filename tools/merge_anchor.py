#!/usr/bin/env python3
"""Assemble the committed quiet-host bench anchor (BENCH_local.json).

Usage:
  python3 tools/merge_anchor.py sweep1.json sweep2.json stream.json [out.json]

Inputs are two full-sweep graft.Bench output files (SPARK_GRAFT_BENCH_RUNS=9,
written via SPARK_GRAFT_BENCH_OUT) and the one-line JSON printed by
graft.StreamBench. Per query the anchor records the MIN of the two sweeps'
medians (the documented min-of-medians protocol, VERDICT r7 #1); both
sweeps' raw samples and host telemetry ride along so a contended sweep is
visible in the artifact itself.

Quietness gate (VERDICT r9 #6): keyed on min(1-min, 5-min) loadavg — a
single window can be polluted by the protocol itself without the host
being contended: the bench launcher (sbt/JVM spin-up immediately before
host_before is sampled) inflates the 1-minute figure (r9 sweep-2: 1-min
1.93 from the launcher, 5-min 0.51, which forced --force), while a
just-finished PRIOR sweep inflates the 5-minute figure (r9 sweep-1:
1-min 0.92, 5-min 1.30, 15-min 5.01 — the tail of sweep work already
drained). Genuine contention during the sweep raises both windows, so
min() refuses exactly that case. Refuses to write if either sweep's
min(1-min, 5-min) >= 1.0 unless --force.
Driver-side tooling only (not a dependency of the Scala library).
"""
import json, sys


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 == 1 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def fixture_min_median(q, s1, s2):
    """Min of the sweeps' fixture-row medians; sweeps where every run of the
    row failed (all-null samples) are skipped rather than crashing median([]),
    and a row with no data in EITHER sweep records null."""
    meds = []
    for s in (s1, s2):
        samples = s.get("dedup_fixture", {}).get("samples", {})
        good = [x for x in samples.get(q, []) if x is not None]
        if good:
            meds.append(median(good))
    return round(min(meds), 3) if meds else None


def main(argv):
    force = "--force" in argv
    argv = [a for a in argv if a != "--force"]
    s1_path, s2_path, stream_path = argv[0], argv[1], argv[2]
    out_path = argv[3] if len(argv) > 3 else "BENCH_local.json"
    s1, s2 = json.load(open(s1_path)), json.load(open(s2_path))
    stream = json.load(open(stream_path))

    for name, s in ((s1_path, s1), (s2_path, s2)):
        load1, load5 = s["host_before"]["loadavg"][0], s["host_before"]["loadavg"][1]
        if min(load1, load5) >= 1.0 and not force:
            sys.exit(f"REFUSING: {name} host_before loadavg 1-min {load1} / "
                     f"5-min {load5}, min >= 1.0 (quietness gate); "
                     "pass --force to override")
        if s["runs"] != 9 and not force:
            sys.exit(f"REFUSING: {name} runs={s['runs']} != 9; pass --force")

    # the two sweeps must describe the same experiment or min-of-medians
    # compares apples to oranges
    if s1["sf"] != s2["sf"]:
        sys.exit(f"REFUSING: sweep sf disagree ({s1['sf']} vs {s2['sf']})")
    if s1["runs"] != s2["runs"]:
        sys.exit(f"REFUSING: sweep runs disagree ({s1['runs']} vs {s2['runs']})")

    names = sorted(set(s1["queries"]) | set(s2["queries"]))
    queries = {}
    for q in names:
        meds = []
        for s_path, s in ((s1_path, s1), (s2_path, s2)):
            if q not in s["samples"]:
                continue
            good = [x for x in s["samples"][q] if x is not None]
            if not good:
                # a query that failed EVERY run of a sweep: surface it by
                # name instead of crashing on median([]) deep in the loop
                sys.exit(f"REFUSING: {s_path} has no successful sample for {q} "
                         "(all runs failed); fix or exclude the query first")
            meds.append(median(good))
        queries[q] = round(min(meds), 3)

    anchor = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": s1["sf"],
        "runs": s1["runs"],
        "protocol": ("quiet-host anchor (VERDICT r7 #1): two full 9-run sweeps, "
                     "per-query median within each sweep, min of the two medians; "
                     "both sweeps' samples + host telemetry retained below; "
                     "quietness gate keys on min(1-min, 5-min) loadavg (r9 #6)"),
        "queries": queries,
        "sweeps": [
            {"total": round(sum(median([x for x in v if x is not None])
                                for v in s["samples"].values() if any(
                                    x is not None for x in v)), 3),
             "samples": s["samples"],
             "host_before": s["host_before"],
             "host_after": s["host_after"]}
            for s in (s1, s2)
        ],
        "stream": stream,
        # pinned-fixture dedup comparables (r11 #5): min of the two sweeps'
        # medians per fixture query, both sweeps' samples retained
        "dedup_fixture": (
            {
                "dir": s1["dedup_fixture"]["dir"],
                "queries": {
                    q: fixture_min_median(q, s1, s2)
                    for q in sorted(s1["dedup_fixture"]["samples"])
                },
                "samples": [s["dedup_fixture"]["samples"] for s in (s1, s2)],
            }
            if "dedup_fixture" in s1 and "dedup_fixture" in s2 else None),
        "stream_protocol": ("StreamBench tiers run on the same quiet host as the "
                            "batch sweeps, same host-telemetry fields (host_before "
                            "is the quietness gate; host_after reflects the bench's "
                            "own 32-thread load)"),
    }
    # fixture-first regression alarm (r11 verdict #5): the fixture corpus is
    # COMMITTED, so a fixture row moving >1.5x round-over-round is code (or
    # host), never a driver testdata regen — print it loudly before the old
    # anchor's datum is overwritten.
    import os
    if anchor["dedup_fixture"] and os.path.exists(out_path):
        try:
            prev = json.load(open(out_path)).get("dedup_fixture") or {}
        except Exception:
            prev = {}
        for q, old in (prev.get("queries") or {}).items():
            new = anchor["dedup_fixture"]["queries"].get(q)
            if old and new and (new / old > 1.5 or old / new > 1.5):
                print(f"!!! FIXTURE DRIFT: {q} {old}s -> {new}s "
                      f"({new / old:.2f}x) on the COMMITTED fixture corpus — "
                      "this is code or host contention, NOT a data regen; "
                      "investigate before committing this anchor")
    with open(out_path, "w") as f:
        json.dump(anchor, f)
        f.write("\n")
    print(f"wrote {out_path}: total={anchor['value']}s over {len(queries)} queries")


if __name__ == "__main__":
    main(sys.argv[1:])
