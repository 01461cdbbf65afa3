"""Corpus profiling with mergeable sketches + sampled release — the
cheap first pass a 100-TB ingest runs BEFORE any expensive curation,
chained the way a profiling job chains it:

  1. HyperLogLog distinct users per event type (2^p registers per
     group, mergeable across shards with MAX) next to the exact count
  2. count-min heavy-hitter estimates over the corpus token stream
     (depth×width counters after one groupBy, probed by the true
     top-10 for calibration)
  3. bigram-perplexity quality terciles (corpus-self LM, the CCNet
     bucketing step)
  4. a length-weighted reproducible document sample
     (Efraimidis–Spirakis over md5 uniforms) for eyeballing

Every sketch draws randomness from the data via portable md5 hashes,
so re-running on any cluster layout — or tomorrow — gives the same
registers, counters, and sample.

Run:  python examples/sketch_profile_example.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from paqarin_spark.operators import (  # noqa: E402
    count_min_estimates,
    hll_estimate,
    weighted_sample,
)
from paqarin_spark.operators.dedup import tokens  # noqa: E402
from paqarin_spark.session import get_session  # noqa: E402
from paqarin_spark.sources import read_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("sketch-profile-example")
    spark.sparkContext.setLogLevel("ERROR")

    events = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents", spread=True)

    # 1. HLL distinct users per event type vs the exact count
    est = hll_estimate(events, "user_id", p=12, group_by=["event_type"])
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    print("— distinct users per event type (HLL p=12 vs exact) —")
    for r in (
        est.join(exact, "event_type").orderBy("event_type").collect()
    ):
        print(
            f"  {r['event_type']:<10} est={r['n_distinct_est']:8.1f}"
            f"  exact={r['exact']}"
        )

    # 2. count-min calibration on the true top-10 tokens
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    true_top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .orderBy(F.col("n_true").desc(), "token")
        .limit(10)
    )
    cm = count_min_estimates(toks, "token", true_top, "token", depth=4, width=512)
    print("— count-min estimates for the true top-10 tokens —")
    for r in (
        true_top.join(cm, "token")
        .orderBy(F.col("n_true").desc(), "token")
        .collect()
    ):
        print(
            f"  {r['token']:<12} true={r['n_true']:<6} cm={r['cm_estimate']}"
        )

    # 3. perplexity terciles come from the declared query (tx34) —
    # reuse it rather than re-deriving the LM here
    from paqarin_spark.plans.queries import tx34_perplexity_buckets

    print("— bigram-perplexity terciles (1=head … 3=tail) —")
    for r in tx34_perplexity_buckets(spark, sf_dir).collect():
        print(
            f"  bucket {r['bucket']}: {r['n_docs']} docs,"
            f" mean -log p = {r['avg_neg_logprob']}"
        )

    # 4. reproducible length-weighted sample
    picked = weighted_sample(docs, "doc_id", "n_chars", k=5, seed=7)
    ids = [r["doc_id"] for r in picked.orderBy("doc_id").collect()]
    print(f"— length-weighted sample (seed 7): doc_ids {ids} —")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
