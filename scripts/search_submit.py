"""spark-submit entry point: run a parsed query against a built index
and print the top-k as JSON lines.

    spark-submit --py-files dist/tantivy_spark.zip \\
        scripts/search_submit.py <index_dir> '<query string>' [--k 10]

Query syntax is the tantivy QueryParser subset (see
tantivy_spark/query/parser.py); add --lenient to never fail on
malformed input.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("query")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--lenient", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tantivy_spark.index.reader import IndexReader
    from tantivy_spark.query.exact import ExactSearcher
    from tantivy_spark.query.parser import QueryParser

    spark = SparkSession.builder.appName("tantivy_spark_search").getOrCreate()
    parser = QueryParser()
    if args.lenient:
        q, errors = parser.parse_lenient(args.query)
        for e in errors:
            print(json.dumps({"parse_warning": e}))
    else:
        q = parser.parse(args.query)
    s = ExactSearcher(IndexReader(spark, args.index_dir))
    for row in s.search(q, k=args.k).collect():
        print(json.dumps(row.asDict()))


if __name__ == "__main__":
    main()
