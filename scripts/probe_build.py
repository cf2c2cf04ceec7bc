"""Quick build-only scaling probe: times the fused build at one core count.

Usage: SPARK_GRAFT_CPUS=8 PROBE_DOCS=400000 python scripts/probe_build.py
Prints one JSON line with per-phase times + docs/sec + steal%.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from search_engine_spark.corpus import synth_corpus  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("PROBE_DOCS", "400000"))
    spark = get_spark(cpus)
    corpus = synth_corpus(spark, n_docs).persist()
    corpus.count()
    # warm-up small build (JIT)
    warm = synth_corpus(spark, 5000)
    prof_w = bench._profile_build(spark, warm, cpus)
    prof = bench._profile_build(spark, corpus, cpus)
    prof["docs_per_sec"] = round(n_docs / prof["wall_sec"], 1)
    prof["cpus"] = cpus
    prof["n_docs"] = n_docs
    print(json.dumps(prof))


if __name__ == "__main__":
    main()
