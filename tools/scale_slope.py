#!/usr/bin/env python3
"""Measure scale slopes: time the dedup/ANN family at sf0.1 and at the
10x corpus (tools/make_scale_corpus.py), then report the per-query
scaling exponent  log(t_10x / t_1x) / log(10).

Exponent ~1 = linear (the bucketed-family design claim); ~2 = all-pairs.
Timings are min(warm, warm2) from graft.Lab's q mode — cold runs carry
first-touch page-cache and codegen costs that aren't scale signal.
"""
import math
import os
import re
import subprocess
import sys

QUERIES = ["n03_minhash_sig", "n04_lsh_neardup", "n05_ngram_jaccard",
           "n06_simhash", "n07_dup_clusters", "n08_containment",
           "n11_ann_lsh", "n13_ann_ivf"]

base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
if len(sys.argv) > 4:  # optional subset, e.g. the 100x ladder's worst two
    QUERIES = sys.argv[4].split(",")
# optional clock: "qfull" forces full evaluation of every output column
# (required for prunable-tail queries, where count() lets Catalyst
# eliminate the work being measured — see PERF.md's n92 note)
mode = sys.argv[5] if len(sys.argv) > 5 else "q"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(sf_dir):
    # operator caches cleared per sample: a memoized cluster/shingle
    # frame would fake a ~0 exponent (warm-JVM, cache-cold semantics)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_LAB_COLD="1")
    out = subprocess.run(
        [os.path.join(repo, "tools/run.sh"), "graft.Lab", mode] + QUERIES,
        env=env, capture_output=True, text=True, check=True).stdout
    times = {}
    for q in QUERIES:
        # Lab prints via the JVM-locale f-interpolator: accept a comma
        # decimal separator too (same hazard Bench pins to Locale.ROOT)
        warms = [float(m.replace(",", ".")) for m in re.findall(
            rf"^{q} (?:warm|warm2)\s+([0-9.,]+) s", out, re.M)]
        if warms:
            times[q] = min(warms)
    return times


t1 = run(base)
t10 = run(big)
print(f"| query | {base} s | {big} s | exponent |")
print("|---|---|---|---|")
for q in QUERIES:
    if q in t1 and q in t10 and t1[q] > 0:
        exp = math.log(t10[q] / t1[q]) / math.log(ratio)
        print(f"| {q} | {t1[q]:.2f} | {t10[q]:.2f} | {exp:.2f} |")
    else:
        print(f"| {q} | {t1.get(q, '?')} | {t10.get(q, '?')} | parse-miss |")
