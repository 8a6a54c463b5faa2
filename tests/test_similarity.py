"""ANN top-k vs a numpy oracle."""

import numpy as np

from knowledge_graph_creation_from_text_with_llms_spark.operators import similarity


def _vectors(n=50, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim)).astype(np.float32)
    return v


def test_brute_force_topk_matches_numpy(spark):
    v = _vectors()
    cands = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(len(v))],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, v[0].tolist()), (7, v[7].tolist())], "q_id long, q_emb array<float>"
    )
    got = similarity.brute_force_topk(queries, cands, k=5).collect()
    vv = v.astype(np.float64)
    sims = vv @ vv.T / (
        np.linalg.norm(vv, axis=1)[:, None] * np.linalg.norm(vv, axis=1)[None, :]
    )
    for q in (0, 7):
        order = [
            i for i in np.argsort(-sims[q], kind="stable") if i != q
        ][:5]
        got_q = sorted(
            [(r.rank_pos, r.vec_id) for r in got if r.q_id == q]
        )
        assert [vid for _, vid in got_q] == order


def test_ivf_only_probes_own_bucket(spark):
    v = _vectors()
    cands = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(len(v))],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, v[0].tolist())], "q_id long, q_emb array<float>"
    )
    got = similarity.ivf_topk(queries, cands, k=10, bits=3).collect()

    def bucket(x):
        return sum((1 << b) for b in range(3) if x[b] > 0)

    qb = bucket(v[0])
    assert all(bucket(v[r.vec_id]) == qb for r in got)
    assert all(r.vec_id != 0 for r in got)


def test_ivf_recall_vs_brute_force(spark):
    v = _vectors(n=200)
    cands = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(len(v))],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(5)], "q_id long, q_emb array<float>"
    )
    bf = similarity.brute_force_topk(queries, cands, k=10).collect()
    ivf = similarity.ivf_topk(queries, cands, k=10, bits=3).collect()
    bf_set = {(r.q_id, r.vec_id) for r in bf}
    ivf_set = {(r.q_id, r.vec_id) for r in ivf}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.2  # approximate by design; sanity floor


def test_kmeans_centroids_deterministic_and_partitioning(spark):
    v = _vectors(n=120, dim=6)
    cands = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(len(v))],
        "vec_id long, embedding array<float>",
    )
    c1 = {r.cid: r.cvec for r in similarity.kmeans_centroids(cands, 4, 2).collect()}
    c2 = {r.cid: r.cvec for r in similarity.kmeans_centroids(cands, 4, 2).collect()}
    assert c1 == c2  # bit-identical across runs (no RNG, integer sums)
    assert set(c1) == {1, 2, 3, 4}
    assert all(len(vec) == 6 for vec in c1.values())


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # two tight far-apart blobs but 3 clusters: one init centroid loses
    # all members after an update; it must survive with its old vector
    pts = [(i, [0.001 * i, 0.0]) for i in range(3)] + [
        (10 + i, [100.0 + 0.001 * i, 0.0]) for i in range(3)
    ]
    cands = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    cents = similarity.kmeans_centroids(cands, n_clusters=3, iterations=3)
    assert cents.count() == 3  # no cluster silently dropped


def test_ivf_kmeans_recall_vs_brute_force(spark):
    # clustered corpus: k-means cells should give decent recall
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=5.0, size=(4, 8))
    v = np.concatenate(
        [c + rng.normal(scale=0.3, size=(50, 8)) for c in centers]
    ).astype(np.float32)
    cands = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(len(v))],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(0, 200, 40)],
        "q_id long, q_emb array<float>",
    )
    bf = similarity.brute_force_topk(queries, cands, k=10).collect()
    km = similarity.ivf_kmeans_topk(queries, cands, k=10, n_clusters=4).collect()
    bf_set = {(r.q_id, r.vec_id) for r in bf}
    km_set = {(r.q_id, r.vec_id) for r in km}
    # approximate by design: cosine neighbors can straddle L2 blobs
    assert len(bf_set & km_set) / len(bf_set) >= 0.8


def test_ivf_recall_vs_bruteforce_quantified(spark):
    """Measured approximation quality, not just determinism: at
    multi-probe settings the IVF variants must hold measured recall@10
    floors (0.6 hyperplane, 0.7 trained-kmeans)
    against exact brute force on the sf0.001 embeddings, and
    multi-probe must strictly beat single-probe (deterministic data →
    deterministic recall, so these are hard floors, not flaky)."""
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from pyspark.sql import functions as F

    queries = embs.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    exact = {
        (r.q_id, r.vec_id)
        for r in similarity.brute_force_topk(queries, embs, k=10).collect()
    }

    def recall(df):
        got = {(r.q_id, r.vec_id) for r in df.collect()}
        return len(exact & got) / len(exact)

    ivf1 = recall(similarity.ivf_topk(queries, embs, k=10, bits=3))
    ivf4 = recall(
        similarity.ivf_topk(queries, embs, k=10, bits=3, n_probes=4)
    )
    # hyperplane sign codes are coarse: measured 0.64 at 4 probes
    # (0.12 single-probe); the trained-kmeans variant is the
    # higher-recall path and carries the 0.7 floor below
    assert ivf4 >= 0.6, f"multi-probe ivf recall@10 = {ivf4:.3f}"
    assert ivf4 > ivf1, (ivf1, ivf4)

    km1 = recall(
        similarity.ivf_kmeans_topk(
            queries, embs, k=10, n_clusters=4, iterations=2
        )
    )
    km3 = recall(
        similarity.ivf_kmeans_topk(
            queries, embs, k=10, n_clusters=4, iterations=2, n_probes=3
        )
    )
    # measured 0.50 (nprobe=1) -> 0.64 (2) -> 0.78 (3): near-uniform
    # synthetic embeddings, so recall tracks the probed fraction
    assert km3 >= 0.7, f"nprobe=3 kmeans recall@10 = {km3:.3f}"
    assert km3 > km1, (km1, km3)
