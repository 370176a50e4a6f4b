"""Build the adversarial-values corpus at /tmp/cba_torture_sf (r12):
sf0.001 TPC-H tables as-is; documents with unicode-torture text
(casing edges, RTL, ZWJ emoji, CJK, whitespace-only, giant tokens);
embeddings with NaN/Inf/-0.0/denormal/huge floats; events with
pre-1970 / far-future timestamps, NULL event types, and extreme
doubles. Then run the full cross-engine gate over it:

    python tools/torture_corpus.py
    python tests/oracle_harness.py /tmp/cba_torture_sf

Expected at HEAD: the only non-OK rows are the two DOCUMENTED engine
seams (plans/__init__ docstring; characterized in
tests/test_engine_seams.py) — FAILs on plans hashing lowered text
containing U+0130/word-final Σ (JVM full vs DuckDB simple case
mapping), and ERRORs where a 1e308/Inf value exceeds the
decimal-exact domain (BOTH engines raise). Anything else is a new
silent divergence: root-cause it like the four the r12 audit found
(scrub verbatim, trigram NULL steps, argmax tie-break, oracle
array_to_string([]) NULL).
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comperhensive_bigdata_analysis__spark.session import get_spark

SRC = "/root/testdata/sf0.001"
OUT = "/tmp/cba_torture_sf"

spark = get_spark("torture-build", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

os.makedirs(OUT, exist_ok=True)
for t in "region nation customer supplier part orders lineitem".split():
    dst = f"{OUT}/{t}.parquet"
    if os.path.exists(dst):
        (shutil.rmtree if os.path.isdir(dst) else os.remove)(dst)
    src = f"{SRC}/{t}.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)

TORTURE_TEXTS = [
    "",  # empty
    " ",  # single space
    "a",
    "\t\n  \t",  # whitespace only
    "hello world " * 50,  # long repetitive
    "x" * 5000,  # one giant token
    "😀😃🧟‍♂️ family: 👨‍👩‍👧‍👦 end",  # ZWJ emoji
    "עברית ومرحبا بالعالم mixed עם english",  # RTL Hebrew+Arabic
    "中文没有空格的句子在这里继续下去",  # CJK no spaces
    "áéí combining acute marks",  # combining diacritics
    "İstanbul ı dotless TURKİSH casing straße GROSS",  # casing edges
    "zero​width​space and non breaking space",
    'quotes "double" \'single\' `back` \\backslash\\ end',
    "line\nbreak\ttab\rcarriage end",
    "ＦＵＬＬＷＩＤＴＨ １２３ digits",
    "Ωμέγα ω Σίγμα ς σ greek final sigma",
    "ß ẞ sharp s casing",
    "controlchars here",
    "repeated repeated repeated repeated repeated",
    "ngram ngram boundary ngram boundary test ngram",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "🦀" * 100,  # astral-plane run
    "mixed123numbers456and789words",
    "trailing spaces   ",
    "   leading spaces",
    "punct!!! ??? ;;; ,,, ... ---",
]

docs = []
langs = ["en", "fr", "zh", "ar", "tr", "el"]
sources = ["web", "books", "code"]
for i, txt in enumerate(TORTURE_TEXTS * 8):  # 208 docs
    docs.append((i, txt, langs[i % len(langs)], sources[i % len(sources)], len(txt)))
spark.createDataFrame(
    docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
).coalesce(1).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

import math

vecs = []
DIM = 64
for i in range(100):
    v = [float((i * 31 + j * 7) % 13) / 13.0 for j in range(DIM)]
    if i % 10 == 1:
        v[0] = float("nan")
    if i % 10 == 2:
        v[1] = float("inf")
    if i % 10 == 3:
        v[2] = float("-inf")
    if i % 10 == 4:
        v[3] = -0.0
    if i % 10 == 5:
        v[4] = 5e-39  # float32 denormal range
    if i % 10 == 6:
        v[5] = 3e38  # near float32 max
    if i % 10 == 7:
        v = [0.0] * DIM  # zero vector (norm 0)
    vecs.append((i, v, i % 5))
spark.createDataFrame(
    vecs, "vec_id bigint, embedding array<float>, label int"
).coalesce(1).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

from datetime import datetime

events = []
stamps = [
    datetime(1965, 7, 4, 23, 59, 59, 999999),
    datetime(1969, 12, 31, 23, 59, 59),
    datetime(1970, 1, 1, 0, 0, 0),
    datetime(2024, 2, 29, 12, 0, 0),  # leap day
    datetime(2024, 12, 31, 23, 59, 59, 1),
    datetime(2200, 1, 1, 0, 0, 0),
    datetime(2024, 3, 31, 2, 30, 0),  # EU DST gap wall-time (ntz: plain)
]
vals = [0.0, -0.0, 1e308, -1e308, 1e-308, 151.0, 149.999999, None]
types = ["view", "click", "purchase", None]
for i in range(200):
    events.append(
        (
            i,
            stamps[i % len(stamps)],
            i % 13,
            types[i % len(types)],
            vals[i % len(vals)],
            '{"k": %d}' % i if i % 3 else None,
        )
    )
spark.createDataFrame(
    events,
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string",
).coalesce(1).write.mode("overwrite").parquet(f"{OUT}/events.parquet")

# Flatten Spark's directory datasets to single files so DuckDB's
# "<table>.parquet" view pattern (the testdata layout) resolves.
import glob

for t in ("documents", "embeddings", "events"):
    d = f"{OUT}/{t}.parquet"
    if os.path.isdir(d):
        part = glob.glob(f"{d}/part-*.parquet")[0]
        tmp = f"{OUT}/{t}.parquet.file"
        shutil.move(part, tmp)
        shutil.rmtree(d)
        shutil.move(tmp, d)

print("torture corpus written to", OUT)
spark.stop()
