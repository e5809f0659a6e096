#!/usr/bin/env python3
"""Assemble the anchor's stream section from N graft.StreamBench runs.

Usage:
  python3 tools/merge_stream.py run1.json run2.json run3.json [out.json]

Per tier the anchor records the BEST (max rate) across the runs — the
round-14 protocol: per-tier best of N gate-passing runs, every run's
host_before checked against the quietness gate (min(1-min, 5-min)
loadavg < 1.0; refuse otherwise unless --force). Raw runs ride along so
a contended run is visible in the artifact. Driver-side tooling only.
"""
import json, sys

RATE_KEYS = [
    "data_driven", "calendar_append", "windowed_update",
    "doc_pipeline_docs_per_sec", "doc_pipeline_fixture_docs_per_sec",
    "doc_pipeline_neardup_docs_per_sec", "doc_pipeline_full_docs_per_sec",
    "span_ingest_docs_per_sec", "select_ingest_docs_per_sec",
    "embedding_ingest_vecs_per_sec", "semantic_ingest_vecs_per_sec",
]


def main(argv):
    force = "--force" in argv
    argv = [a for a in argv if a != "--force"]
    out_path = argv[3] if len(argv) > 3 else "/tmp/stream_merged.json"
    runs = [json.load(open(p)) for p in argv[:3]]
    for p, r in zip(argv[:3], runs):
        l1, l5 = r["host_before"]["loadavg"][0], r["host_before"]["loadavg"][1]
        if min(l1, l5) >= 1.0 and not force:
            sys.exit(f"REFUSING: {p} host_before loadavg {l1}/{l5} fails the "
                     "quietness gate; re-run on a quiet host or pass --force")
    best = dict(runs[0])
    for k in RATE_KEYS:
        vals = [r.get(k) for r in runs if r.get(k) is not None]
        if vals:
            best[k] = max(vals)
    gates = [f"{min(r['host_before']['loadavg'][0], r['host_before']['loadavg'][1]):.2f}"
             for r in runs]
    best["note"] = (f"per-tier best of {len(runs)} runs, EVERY run passing the "
                    f"host_before quietness gate (min(1-min,5-min) loadavg "
                    f"{' / '.join(gates)})")
    best["raw_runs"] = runs
    json.dump(best, open(out_path, "w"))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
