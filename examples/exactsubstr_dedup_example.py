"""ExactSubstr corpus rewrite over the documents table — the Lee et
al. 2022 substring-dedup loop the way a corpus build runs it:

  1. find maximal duplicated substrings (8-token anchors, coverage
     union — `duplicate_substring_spans`)
  2. strip every occurrence but the globally-first one
     (`strip_duplicate_substrings`) and account for the removed mass
  3. re-audit: line-level (C4) and span-level duplication of the
     REWRITTEN corpus should collapse

Every step is a lazy DataFrame plan: one vocabulary-bounded anchor
aggregation, doc-keyed islands windows, and one reassembly rollup — no
suffix array, no driver-side text. At 100 TB the same shapes hold.

Run:  python examples/exactsubstr_dedup_example.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from paqarin_spark.operators import (  # noqa: E402
    duplicate_substring_spans,
    strip_duplicate_substrings,
)
from paqarin_spark.session import get_session  # noqa: E402
from paqarin_spark.sources import read_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("exactsubstr-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents", spread=True)

    spans = duplicate_substring_spans(docs, "text", "doc_id", min_tokens=8)
    span_stats = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("dup_tokens"),
        F.max("span_len").alias("longest"),
    ).first()
    print(
        f"duplicated substrings: {span_stats['n_spans']} maximal spans, "
        f"{span_stats['dup_tokens']} covered tokens, "
        f"longest {span_stats['longest']} tokens"
    )

    rewritten = strip_duplicate_substrings(
        docs, "text", "doc_id", min_tokens=8
    )
    mass = rewritten.agg(
        F.sum("n_tokens").alias("total"),
        F.sum("n_removed").alias("removed"),
        F.count(F.when(F.col("n_removed") > 0, F.lit(1))).alias(
            "docs_touched"
        ),
    ).first()
    pct = 100.0 * mass["removed"] / mass["total"]
    print(
        f"rewrite: {mass['removed']}/{mass['total']} tokens removed "
        f"({pct:.2f}%) across {mass['docs_touched']} documents"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
