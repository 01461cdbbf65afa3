"""End-to-end training-data curation pipeline over the documents
table — the north-star surface chained the way a real corpus build
chains it:

  1. exact dedup (content-hash groupBy, keep smallest id)
  2. near-dup clustering (MinHash-LSH pairs -> connected components,
     keep each cluster's representative)
  3. quality pruning (single-pass text stats, keep >= global p25)
  4. token budgeting (BPE-ish pre-tokenizer counts per source)

Every step is a lazy DataFrame transformation; the only actions are
the final summaries. At 100 TB the same plan shapes hold: hash
shuffles on content digests, band-bucket equi-joins, a broadcast
threshold, partial-agg token sums.

Run:  python examples/corpus_pipeline_example.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from paqarin_spark.functions.text import bpe_token_count, text_stats  # noqa: E402
from paqarin_spark.operators import (  # noqa: E402
    duplicate_clusters,
    exact_duplicates,
    minhash_lsh_pairs,
)
from paqarin_spark.session import get_session  # noqa: E402
from paqarin_spark.sources import read_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: keep the canonical (smallest) id per content hash
    keepers = exact_duplicates(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    docs1 = docs.join(keepers, on="doc_id", how="left_semi")

    # 2. near-dup clustering: drop every doc that is not its own
    # cluster representative
    pairs = minhash_lsh_pairs(
        docs1, "text", "doc_id", num_hashes=4, band_size=2, shingle_n=3
    )
    clusters = duplicate_clusters(pairs)
    losers = clusters.where(F.col("doc") != F.col("cluster_rep")).select(
        F.col("doc").alias("doc_id")
    )
    docs2 = docs1.join(losers, on="doc_id", how="left_anti")

    # 3. quality pruning at the global p25 of the composite score
    stats = text_stats(docs2, "text", "doc_id")
    thresh = stats.agg(F.percentile("quality", F.lit(0.25)).alias("q25"))
    kept_ids = (
        stats.join(F.broadcast(thresh))
        .where(F.col("quality") >= F.col("q25"))
        .select("doc_id")
    )
    docs3 = docs2.join(kept_ids, on="doc_id", how="left_semi")

    # 4. token budget per source
    budget = (
        docs3.select("source", bpe_token_count(F.col("text")).alias("toks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("bpe_tokens"),
        )
        .orderBy("source")
    )

    # 5. mixture-sample the survivors, then lay them out as training
    #    sequences (concat-and-chunk at 512 tokens)
    from paqarin_spark.operators import mixture_sample, pack_sequences

    sampled = mixture_sample(
        docs3, "doc_id", "source", rates={"src0": 1.0}, default_rate=0.5
    )
    packed = pack_sequences(sampled, "doc_id", "text", budget=512)
    n_seqs = packed.agg(F.max("last_seq") + 1).first()[0]

    n1, n2, n3 = docs1.count(), docs2.count(), docs3.count()
    n4 = sampled.count()
    print(f"documents: {n0} raw -> {n1} exact-deduped -> "
          f"{n2} near-dedup'd -> {n3} quality-kept -> {n4} mixture-sampled "
          f"-> {n_seqs} training sequences of 512 tokens")
    budget.show(truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
