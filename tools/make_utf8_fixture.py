#!/usr/bin/env python3
"""Generate the UTF-8 robustness fixture corpus (driver-side tooling only).

Writes fixtures/utf8/documents.parquet with the same schema as the
driver's documents table, but text that stresses every encoding edge the
ASCII synthetic corpus never exercises: Latin accents, German sharp-s,
CJK, mixed-script, RTL Arabic, combining marks (NFC vs NFD), and non-BMP
emoji (surrogate pairs in UTF-16, 4-byte sequences in UTF-8).

Usage: python3 tools/make_utf8_fixture.py
Then:  SPARK_GRAFT_VERIFY_ONLY=q_text_winnow,... \
         sbt "runMain graft.Verify fixtures/utf8 /tmp/verify_utf8"
       python3 tools/check_oracle.py fixtures/utf8 /tmp/verify_utf8

n_chars is CODE POINTS (len() of a Python str counts code points, like
SQL length()), matching the generator contract of the driver tables.
"""
import os
import pandas as pd

DOCS = [
    # (lang, source, text)
    ("en", "web", "the quick brown fox jumps over the lazy dog and then "
                  "the dog naps ... the fox naps too"),
    ("fr", "web", "le café est très bon — l'élève "
                  "étudie où la fenêtre s'ouvre à "
                  "côté du jardin ombragé"),
    ("de", "wiki", "die Straße ist groß und die Bäume sind "
                   "schön grün über dem Fluß im "
                   "Frühling"),
    ("zh", "wiki", "今天天气很好我们一"
                   "起去公园散步然后喝"
                   "茶聊天看书写字画画"
                   "唱歌跳舞"),
    ("ja", "web", "吾輩は猫である。名"
                  "前はまだ無い。どこ"
                  "で生れたかとんと見"
                  "当がつかぬ。"),
    ("ar", "news", "اللغة العر"
                   "بية جميلة "
                   "جدا والنص "
                   "يمتد من الي"
                   "مين الى الي"
                   "سار"),
    # non-BMP: emoji (U+1F600+), mathematical alphanumerics (U+1D54A+) —
    # surrogate pairs in UTF-16, the case a charAt-based hash gets wrong
    ("en", "social", "emoji party \U0001f600\U0001f603\U0001f604 non-BMP "
                     "stress \U0001f680 test \U0001d54a\U0001d561\U0001d552"
                     "\U0001d563\U0001d55c math \U0001d400\U0001d401"
                     "\U0001d402 and more \U0001f600 again"),
    ("en", "social", "mixed 中文 and English avec café und "
                     "Straße plus \U0001f600 emoji in one doc"),
    # NFC "café" vs NFD "cafe" + combining acute: same rendering, different
    # code-point streams — the oracles must hash what is stored, not a
    # normalized form
    ("en", "web", "combining marks: caf\u00e9 vs cafe\u0301 differ in code "
                  "points but look alike"),
    ("en", "web", "a"),                                  # shorter than any k-gram
    ("en", "web", ""),                                   # empty doc
    ("zh", "social", "重复 重复 重复 重复 "
                     "的 文本 测试 重复 "
                     "检测 重复 重复"),
    # English-bearing long docs (round 6): ≥50 words of natural prose so
    # the FULL Gopher battery — including the stop-word gate — has live,
    # passing documents on this fixture and q_pipeline_curation_full
    # produces survivors here, not only on the augmented synthetic corpus
    ("en", "wiki", "the river runs north from the old stone bridge and "
                   "past the mill where the miller worked for forty years "
                   "grinding wheat and rye for the villages nearby and "
                   "every spring the water rises over the low bank so that "
                   "the path to the market floods and the carts must take "
                   "the long road around the hill instead"),
    ("en", "web", "a good loaf of bread needs only four things which are "
                  "flour and water and salt and time and yet bakers argue "
                  "without end about the right way to combine them because "
                  "the flour differs from field to field and the water "
                  "differs from town to town and the patience of the baker "
                  "differs most of all from day to day"),
    ("en", "news", "the council voted on tuesday to repair the harbour "
                   "wall that storms have worn down over the past decade "
                   "and the work will begin in the autumn once the fishing "
                   "season ends with the cost shared between the town and "
                   "the province and the engineers say the new wall should "
                   "stand for fifty years or more if the sea is kind"),
    ("en", "wiki", "early maps of the coast show a chain of small islands "
                   "that have since joined the mainland as the channel "
                   "silted up and farmers now plough fields where fishing "
                   "boats once anchored and the only sign of the old shore "
                   "is a line of worn posts that marked the harbour mouth "
                   "two hundred years ago before the land closed in"),
]

def main():
    rows = [
        {"doc_id": i, "text": t, "lang": lang, "source": src,
         "n_chars": len(t)}
        for i, (lang, src, t) in enumerate(DOCS)
    ]
    out_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures", "utf8")
    os.makedirs(out_dir, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)
    print(f"wrote {len(df)} docs to {out_dir}/documents.parquet")

if __name__ == "__main__":
    main()
