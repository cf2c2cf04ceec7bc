#!/usr/bin/env python
"""spark-submit entry point: serve BM25 queries against a saved index.

Usage:
  spark-submit --py-files search_engine_spark.zip scripts/run_queries.py \
      --index <index dir> --query "terms ..." [--mode or|and] [--k 155] \
      [--wand] [--snippets] [--batch queries.tsv]

--batch: TSV of `qid<TAB>mode<TAB>qtext` executed in ONE plan (search_many).
Prints one JSON line per hit (or per batch row).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from search_engine_spark.plans.build import load_index  # noqa: E402
from search_engine_spark.plans.query import search, search_many  # noqa: E402
from search_engine_spark.plans.snippet import snippets_for  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query")
    ap.add_argument("--batch", help="TSV file: qid\\tmode\\tqtext")
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--k", type=int, default=155)
    ap.add_argument("--wand", action="store_true")
    ap.add_argument("--snippets", action="store_true")
    args = ap.parse_args()

    spark = get_spark("run-queries")
    idx = load_index(spark, args.index).cache()

    t0 = time.time()
    if args.batch:
        queries = {}
        for line in Path(args.batch).read_text().splitlines():
            qid, mode, qtext = line.split("\t", 2)
            queries[qid] = (qtext, mode)
        rows = search_many(spark, idx, queries, k=args.k).collect()
        for r in rows:
            print(json.dumps({"qid": r["qid"], "rank": r["rank"], "doc_id": r["doc_id"],
                              "score": round(r["score"], 4)}))
        print(json.dumps({"n_queries": len(queries), "wall_sec": round(time.time() - t0, 3),
                          "qps": round(len(queries) / (time.time() - t0), 2)}), file=sys.stderr)
        return

    if not args.query:
        ap.error("need --query or --batch")
    res = search(spark, idx, args.query, mode=args.mode, k=args.k, wand=args.wand)
    if args.snippets:
        from search_engine_spark.plans.query import digest_query

        res = snippets_for(idx, res, digest_query(args.query))
        for r in res.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": round(r["score"], 4),
                              "url": r["url"], "title": r["title"], "snippet": r["snippet"][:200]}))
    else:
        for r in res.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": round(r["score"], 4),
                              "match_dim": r["match_dim"]}))
    print(json.dumps({"wall_sec": round(time.time() - t0, 3)}), file=sys.stderr)


if __name__ == "__main__":
    main()
