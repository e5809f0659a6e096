#!/usr/bin/env python3
"""Assemble the committed quiet-host bench anchor (BENCH_local.json).

Usage:
  python3 tools/merge_anchor.py sweep1.json sweep2.json stream.json [out.json]

Inputs are two full-sweep graft.Bench output files (SPARK_GRAFT_BENCH_RUNS=9,
written via SPARK_GRAFT_BENCH_OUT) and the one-line JSON printed by
graft.StreamBench. Per query the anchor records the MIN of the two sweeps'
medians (the documented min-of-medians protocol, VERDICT r7 #1); both
sweeps' raw samples and host telemetry ride along so a contended sweep is
visible in the artifact itself. Refuses to write if either sweep violates
the quietness gate (host_before 1-min loadavg >= 1.0) unless --force.
Driver-side tooling only (not a dependency of the Scala library).
"""
import json, sys


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 == 1 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main(argv):
    force = "--force" in argv
    argv = [a for a in argv if a != "--force"]
    s1_path, s2_path, stream_path = argv[0], argv[1], argv[2]
    out_path = argv[3] if len(argv) > 3 else "BENCH_local.json"
    s1, s2 = json.load(open(s1_path)), json.load(open(s2_path))
    stream = json.load(open(stream_path))

    for name, s in ((s1_path, s1), (s2_path, s2)):
        load1 = s["host_before"]["loadavg"][0]
        if load1 >= 1.0 and not force:
            sys.exit(f"REFUSING: {name} host_before loadavg {load1} >= 1.0 "
                     "(quietness gate); pass --force to override")
        if s["runs"] != 9 and not force:
            sys.exit(f"REFUSING: {name} runs={s['runs']} != 9; pass --force")

    names = sorted(set(s1["queries"]) | set(s2["queries"]))
    queries = {}
    for q in names:
        meds = [median([x for x in s["samples"][q] if x is not None])
                for s in (s1, s2) if q in s["samples"]]
        queries[q] = round(min(meds), 3)

    anchor = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": s1["sf"],
        "runs": s1["runs"],
        "protocol": ("quiet-host anchor (VERDICT r7 #1): two full 9-run sweeps, "
                     "per-query median within each sweep, min of the two medians; "
                     "both sweeps' samples + host telemetry retained below"),
        "queries": queries,
        "sweeps": [
            {"total": round(sum(median([x for x in v if x is not None])
                                for v in s["samples"].values()), 3),
             "samples": s["samples"],
             "host_before": s["host_before"],
             "host_after": s["host_after"]}
            for s in (s1, s2)
        ],
        "stream": stream,
        "stream_protocol": ("StreamBench tiers run on the same quiet host as the "
                            "batch sweeps, same host-telemetry fields (host_before "
                            "is the quietness gate; host_after reflects the bench's "
                            "own 32-thread load)"),
    }
    with open(out_path, "w") as f:
        json.dump(anchor, f)
        f.write("\n")
    print(f"wrote {out_path}: total={anchor['value']}s over {len(queries)} queries")


if __name__ == "__main__":
    main(sys.argv[1:])
