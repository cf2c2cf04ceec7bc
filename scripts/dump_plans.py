"""Dump .explain("formatted") for headline registry queries (guide §1 /
§7.2 evidence for plans/r06/*_{before,after}.txt).

Usage: python scripts/dump_plans.py <outdir> [query ...]
Defaults to the bench headline set. Each query's plan goes to
<outdir>/<name>.txt. Plans are captured AFTER get_index warms the sf index
(same steady state the bench times).
"""

from __future__ import annotations

import os
import sys

HEADLINE = [
    "ft_tokenize", "ft_postings", "ft_bm25_or2", "ft_bm25_and2",
    "ft_bm25_wand", "dd_exact", "dd_minhash_lsh", "dd_ngram_jaccard",
    "sim_ann_brute", "sim_ann_ivf_kmeans", "tx_quality",
    "rel_pricing_rollup", "mx_mnc_rank", "mx_mixed_total",
]


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from search_engine_spark.entry_queries import REGISTRY, get_index
    from search_engine_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    get_index(spark, sf_dir)  # steady state, like the bench
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
