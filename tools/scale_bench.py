"""10x scale bench for the heavy query families (round-11 verdict #4):
the 2M-row scale smoke proves invariants; this MEASURES. It fabricates
a k-times replica of the bench dataset (default sf0.1 -> ~x10 "sf1")
with disjoint key spaces, runs the heaviest dedup/ANN/graph/streaming/
sketch queries at BOTH scales, and writes BENCH_SCALE_r{N}.json with
per-query wall times and the x10/x1 ratio — trend data for the
"survives 100x" plan-reading claims (superlinear ratios >> 10 are the
finding, not a failure).

Replication is designed so the WORK scales linearly with k (the honest
benchmark shape), never quadratically by construction:
  - every key domain shifts by replica*OFFSET (joins stay
    within-replica; no cross-replica key collisions);
  - document text goes through a per-replica character ROTATION
    (a bijection on the alphabet): shingle/token structure and
    within-replica duplicate relations are preserved EXACTLY, while
    replicas share no shingles — so dedup pair counts scale k-fold,
    not k^2-fold (10 identical text copies would make every doc a
    10-clique and benchmark the data fabric, not the engine);
  - embeddings scale by (1 + replica*1e-3): cosine structure is
    unchanged (scaling preserves angles), vector ties across replicas
    are avoided.
nation/region (bounded dims) copy as-is.

Usage:
  python tools/scale_bench.py [--k 10] [--out BENCH_SCALE_r11.json]
                              [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
The replica dir is cached at .scale{k} next to this repo's root and
reused across runs (delete it to regenerate).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from paqarin_spark.session import get_session  # noqa: E402
from paqarin_spark.sources import read_table  # noqa: E402

OFFSET = 10_000_000
ALPHA = "abcdefghijklmnopqrstuvwxyz"

# The heavy families the round-10 verdict asked to trend: dedup, ANN,
# graph, streaming, sketch, text. Superlinear candidates called out
# there (em27 NN-descent, q89 k-core, tx12 simhash banding) included.
DEFAULT_QUERIES = [
    # dedup / text
    "tx3_exact_dedup",
    "tx5_minhash_signatures",
    "tx6_minhash_lsh_pairs",
    "tx12_simhash_pairs",
    "tx22_contamination",
    "tx39_semdedup_keep",
    "tx28_sequence_pack",
    "tx31_bm25_search",
    "tx48_textrank_keywords",
    # ANN / embeddings
    "em2_lsh_topk",
    "em10_ann_recall",
    "em17_ivfpq_recall",
    "em18_hamming_rerank",
    "em25_nn_descent_recall",
    "em27_graph_ingest_recall",
    # graph
    "q81_triangle_brands",
    "q85_trade_reach",
    "q89_trade_kcore",
    "q111_hits_authorities",
    # sketch
    "q110_trailing_dau_hll",
    # streaming
    "st6_stream_daily_users",
    "st8_stream_interval_join",
    "st13_stream_left_join",
    # round-11 additions worth trending: the fixed-probe serving leg
    # (should stay ~flat) and the two decontamination duals
    "em34_ivfpq_serve",
    "em33_embedding_decontamination",
    "st24_stream_decontamination",
    # round-12: the Hamming-family fixed-probe serving leg (em18's
    # production answer — should stay far below em18's n² audit)
    "em35_hamming_serve",
    # round-12 continuation: the JVM-literal Markov rewrite's two
    # consumers (fit is the only data-sized stage — should trend ~
    # linear) and the new bucketed-prefix-sum Wasserstein floor
    "gen9_text_markov",
    "ev20_memorization_audit",
    "ev30_wasserstein_split",
    # round-12 continuation: spectral drift (two half-corpus cov
    # passes — should trend ~linear) and the categorical stream
    # monitor (bounded state — should trend ~flat + scan)
    "em36_pc_drift",
    "st25_stream_jsd",
]

_KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["user_id", "event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _rot(s: str, i: int) -> str:
    """Per-replica permutation of the translate domain: a keyed
    Fisher–Yates shuffle (seeded by the replica index), NOT a
    rotation — a rotation is the identity whenever i % 26 == 0, which
    would silently reintroduce cross-replica duplicate shingles at
    k > 26 and make dedup pair counts superlinear, invalidating the
    linear-work premise this bench documents. The shuffle is
    deterministic per replica and guaranteed non-identity for i > 0."""
    if i == 0:
        return s
    import random

    perm = list(s)
    random.Random(f"scale-rot-{i}").shuffle(perm)
    out = "".join(perm)
    if out == s:  # 1/26! chance, but make the guarantee unconditional
        out = s[1:] + s[:1]
    return out


def _write_single(df, out_dir: str, name: str) -> None:
    tmp = os.path.join(out_dir, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(
        os.path.join(tmp, part), os.path.join(out_dir, f"{name}.parquet")
    )
    shutil.rmtree(tmp)


def build_replica_dir(spark, base_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # INT96 parquet timestamps read back as timestamp[ns] in pyarrow,
    # which would falsely trigger read_table's nano-truncation path on
    # the replica files — write plain INT64 micros
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    for name in ["nation", "region"]:
        src = os.path.join(base_dir, f"{name}.parquet")
        shutil.copy(src, os.path.join(out_dir, f"{name}.parquet"))
    for name, keys in _KEY_SHIFTS.items():
        base = read_table(spark, base_dir, name)
        # graph-ANN operators require contiguous ids in [0, n) — shift
        # embeddings by the dense base count, not the sparse OFFSET
        off = base.count() if name == "embeddings" else OFFSET
        parts = []
        for i in range(k):
            df = base
            for key in keys:
                df = df.withColumn(key, F.col(key) + F.lit(i * off))
            if name == "documents" and i > 0:
                digits = "0123456789"
                df = df.withColumn(
                    "text",
                    F.translate(
                        "text",
                        ALPHA + digits,
                        _rot(ALPHA, i) + _rot(digits, i),
                    ),
                )
            if name == "embeddings" and i > 0:
                scale = 1.0 + i * 1e-3
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding", lambda x: (x * scale).cast("float")
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        _write_single(out, out_dir, name)
        print(f"built {name} x{k}", flush=True)


def run_leg(spark, sf_dir: str, names: list[str]) -> dict:
    out = {}
    for name in names:
        fn = entrymod.queries()[name]
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            out[name] = {"s": round(time.time() - t0, 3), "rows": n}
        except Exception as exc:  # noqa: BLE001
            out[name] = {
                "s": round(time.time() - t0, 3),
                "error": str(exc)[:200],
            }
        print(f"  {name}: {out[name]}", flush=True)
    return out


def main() -> int:
    args = sys.argv[1:]
    k = 10
    out_path = None
    names = []
    it = iter(args)
    for a in it:
        if a == "--k":
            k = int(next(it))
        elif a == "--out":
            out_path = next(it)
        else:
            names.append(a)
    names = names or DEFAULT_QUERIES
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rep_dir = os.path.join(repo, f".scale{k}")
    spark = get_session("scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(rep_dir, "lineitem.parquet")):
        t0 = time.time()
        build_replica_dir(spark, base_dir, rep_dir, k)
        print(f"replica build: {time.time() - t0:.1f}s", flush=True)

    # untimed warmup: first executions pay JVM/codegen/Arrow startup
    # that would otherwise inflate the base leg and deflate every ratio
    print(f"== warmup leg ({base_dir}, untimed)", flush=True)
    run_leg(spark, base_dir, names)
    print(f"== base leg ({base_dir})", flush=True)
    base = run_leg(spark, base_dir, names)
    print(f"== x{k} leg ({rep_dir})", flush=True)
    big = run_leg(spark, rep_dir, names)

    queries = {}
    for name in names:
        b, g = base.get(name, {}), big.get(name, {})
        row = {
            "base_s": b.get("s"),
            f"x{k}_s": g.get("s"),
            "base_rows": b.get("rows"),
            f"x{k}_rows": g.get("rows"),
        }
        if b.get("s") and g.get("s") and "error" not in b and "error" not in g:
            row["ratio"] = round(g["s"] / max(b["s"], 1e-9), 2)
        for leg, d in (("base", b), (f"x{k}", g)):
            if "error" in d:
                row[f"{leg}_error"] = d["error"]
        queries[name] = row
    # SimHash candidate growth under the derived band width (round-11
    # verdict #5): the fixed 8-bit tx12 bands measured candidate pairs
    # growing 44x at 10x data (random collisions ∝ n²/2^width); the
    # derived width widens with log₂(n), so candidates must grow
    # ~linearly here. Measured at BOTH legs so the ratio is on record.
    from paqarin_spark.operators import simhash_candidate_count

    simhash_growth = {}
    for leg, d in (("base", base_dir), (f"x{k}", rep_dir)):
        docs = read_table(spark, d, "documents")
        t0 = time.time()
        stats = simhash_candidate_count(docs, "text", "doc_id")
        stats["s"] = round(time.time() - t0, 3)
        simhash_growth[leg] = stats
        print(f"simhash candidates {leg}: {stats}", flush=True)
    b_c = simhash_growth["base"]["n_candidates"]
    g_c = simhash_growth[f"x{k}"]["n_candidates"]
    if b_c:
        simhash_growth["candidate_ratio"] = round(g_c / b_c, 2)

    result = {
        "metric": "scale_bench",
        "k": k,
        "base_dir": base_dir,
        "replica_dir": rep_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": queries,
        "simhash_derived_band_growth": simhash_growth,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
