#!/usr/bin/env python3
"""Generate the pinned StreamBench corpus fixture (driver-side tooling only).

Writes fixtures/stream/documents.parquet — a COMMITTED, deterministic
stand-in for the driver-regenerated testdata corpus that StreamBench's
DocPipeline tier reads as its stream-static anti-join side. The driver
regenerates /root/testdata every round, so envelope tracking on it can
never distinguish data shift from a streaming regression (VERDICT r9 #1);
the fixture pins that input. The three message tiers (data-driven,
calendar-append, windowed-update) consume only StreamBench's internal
deterministic LCG workload and need no fixture.

Shape mirrors the sf0.1 documents table the anchor protocol runs against
(5 000 rows, ~50 tokens / ~300 chars per doc, a few exact duplicates):

Usage: python3 tools/make_stream_fixture.py
Then:  the fixture tier runs automatically in graft.StreamBench
       (doc_pipeline_fixture_* fields) whenever fixtures/stream exists.
"""
import os
import random
import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "stream")
N_DOCS = 5000
VOCAB = 5000

rng = random.Random(20260814)

rows = []
texts = []
for i in range(N_DOCS):
    if i > 0 and rng.random() < 0.002:
        text = texts[-1]  # a sprinkle of exact duplicates, like the testdata
    else:
        n_tok = rng.randint(30, 70)
        text = " ".join(f"w{rng.randrange(VOCAB)}" for _ in range(n_tok))
    texts.append(text)
    rows.append(
        {
            "doc_id": i,
            "text": text,
            "lang": "en",
            "source": f"src{i % 20}",
            "n_chars": len(text),
        }
    )

df = pd.DataFrame(rows)
df["doc_id"] = df["doc_id"].astype("int64")
df["n_chars"] = df["n_chars"].astype("int64")
os.makedirs(OUT, exist_ok=True)
df.to_parquet(os.path.join(OUT, "documents.parquet"), index=False)
print(f"wrote {os.path.join(OUT, 'documents.parquet')}: {len(df)} rows, "
      f"{df['n_chars'].mean():.0f} mean chars, "
      f"{len(df) - df['text'].nunique()} exact dups")
