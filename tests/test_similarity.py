"""Embedding similarity search: exact brute-force cosine top-k and the
LSH-bucketed approximate variant (north-star surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paqarin_spark.operators import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # near 1
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(vectors):
    out = cosine_topk(vectors, "vec_id", "embedding", k=1).collect()
    best = {r["query_id"]: (r["neighbor_id"], r["cos_sim"]) for r in out}
    assert best[1][0] == 2
    assert best[2][0] == 1
    assert best[1][1] == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5, abs=1e-6)


def test_cosine_topk_excludes_self(vectors):
    out = cosine_topk(vectors, "vec_id", "embedding", k=3).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in out)


def test_cosine_topk_k_bound(vectors):
    out = cosine_topk(vectors, "vec_id", "embedding", k=2)
    per_q = out.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] <= 2 for r in per_q)


def test_lsh_buckets_find_near_neighbor(vectors):
    # With few planes, near-identical vectors land in the same bucket.
    out = lsh_topk(vectors, "vec_id", "embedding", k=2, num_planes=2, dim=4).collect()
    found = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert (1, 2) in found
