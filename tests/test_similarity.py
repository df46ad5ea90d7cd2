"""Similarity-search operator semantics."""

import numpy as np
import pandas as pd

from dask_mwu_spark.operators.similarity import (
    cosine_topk,
    embedding_dup_pairs,
    lsh_buckets,
    lsh_cosine_topk,
)

rng = np.random.default_rng(7)


def _emb(spark, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype=np.float32).tolist() for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    return spark.createDataFrame(pdf)


def test_cosine_topk_finds_identical_vector(spark):
    base = rng.normal(size=(20, 64))
    base[7] = base[0]  # vec 7 is identical to query 0
    out = cosine_topk(_emb(spark, base), n_queries=1, k=3).toPandas()
    assert out.iloc[0].vec_id == 7
    assert out.iloc[0].cosine == 1.0


def test_cosine_topk_scores_match_numpy(spark):
    base = rng.normal(size=(15, 64))
    out = cosine_topk(_emb(spark, base), n_queries=2, k=5).toPandas()
    f32 = base.astype(np.float32).astype(np.float64)
    norms = np.linalg.norm(f32, axis=1)
    for row in out.itertuples():
        expected = f32[row.q_id] @ f32[row.vec_id] / (norms[row.q_id] * norms[row.vec_id])
        assert abs(row.cosine - expected) < 2e-6


def test_lsh_bucket_identical_vectors_collide(spark):
    base = rng.normal(size=(10, 64))
    base[3] = base[1]
    b = lsh_buckets(_emb(spark, base)).toPandas().set_index("vec_id").bucket
    assert b.loc[1] == b.loc[3]
    assert (0 <= b).all() and (b < 256).all()


def test_lsh_topk_is_subset_of_bucket(spark):
    base = rng.normal(size=(30, 64))
    out = lsh_cosine_topk(_emb(spark, base), n_queries=3, k=5).toPandas()
    b = lsh_buckets(_emb(spark, base)).toPandas().set_index("vec_id").bucket
    for row in out.itertuples():
        assert b.loc[row.vec_id] == row.bucket == b.loc[row.q_id]


def test_embedding_dup_pairs_finds_duplicate(spark):
    base = rng.normal(size=(12, 64))
    base[9] = base[2] * 1.5  # same direction, cosine 1.0
    pairs = embedding_dup_pairs(_emb(spark, base), tau=0.95).toPandas()
    got = set(zip(pairs.vec_a, pairs.vec_b))
    assert (2, 9) in got


def test_ivf_index_assigns_centroid_to_itself(spark):
    from dask_mwu_spark.operators.similarity import ivf_index

    base = rng.normal(size=(40, 64))
    idx = ivf_index(_emb(spark, base), n_centroids=8).toPandas().set_index("vec_id")
    # a centroid's nearest centroid is itself (cosine 1.0)
    for c in range(8):
        assert idx.loc[c].cent_id == c
    assert set(idx.cent_id.unique()) <= set(range(8))
    assert len(idx) == 40


def test_ivf_topk_full_probe_equals_brute_force(spark):
    """n_probe == n_centroids searches every posting list -> exact."""
    from dask_mwu_spark.operators.similarity import ivf_topk

    base = rng.normal(size=(30, 64))
    exact = cosine_topk(_emb(spark, base), n_queries=3, k=4).toPandas()
    full = ivf_topk(
        _emb(spark, base), n_centroids=6, n_probe=6, n_queries=3, k=4
    ).toPandas()
    key = lambda df: sorted(zip(df.q_id, df.vec_id, df.cosine))
    assert key(full) == key(exact)


def test_ivf_topk_recall_reasonable(spark):
    from dask_mwu_spark.operators.similarity import ivf_topk

    base = rng.normal(size=(80, 64))
    exact = cosine_topk(_emb(spark, base), n_queries=5, k=3).toPandas()
    approx = ivf_topk(
        _emb(spark, base), n_centroids=8, n_probe=4, n_queries=5, k=3
    ).toPandas()
    hits = set(zip(approx.q_id, approx.vec_id)) & set(zip(exact.q_id, exact.vec_id))
    assert len(hits) >= len(exact) * 0.4  # ANN: recall well above chance
    assert len(approx) == len(exact)


def test_ivf_injected_centroids_beat_seeded(spark):
    """VERDICT r1 #8: real centroids (KMeans||) injected via centroids= must
    reach at least the seeded baseline's recall on a clustered corpus."""
    from dask_mwu_spark.operators.similarity import ivf_topk, kmeans_centroids

    centers = rng.normal(size=(8, 64))
    base = centers[np.arange(96) % 8] + 0.05 * rng.normal(size=(96, 64))
    emb = _emb(spark, base)
    exact = set(
        map(tuple, cosine_topk(emb, n_queries=6, k=3).select("q_id", "vec_id").collect())
    )

    def recall(centroids):
        got = set(
            map(
                tuple,
                ivf_topk(
                    emb, n_centroids=8, n_probe=2, n_queries=6, k=3,
                    centroids=centroids,
                ).select("q_id", "vec_id").collect(),
            )
        )
        return len(got & exact) / len(exact)

    r_seeded = recall(None)
    r_kmeans = recall(kmeans_centroids(emb, k=8, seed=7))
    assert r_kmeans >= r_seeded
    assert r_kmeans >= 0.8  # well-separated clusters -> near-perfect routing


def test_multi_table_lsh_recall_dominates_single(spark):
    from dask_mwu_spark.operators.similarity import lsh_multi_topk

    # clustered vectors: 6 centers + small noise
    centers = rng.normal(size=(6, 64))
    base = centers[np.arange(60) % 6] + 0.1 * rng.normal(size=(60, 64))
    emb = _emb(spark, base)
    exact = set(
        map(tuple, cosine_topk(emb, n_queries=5, k=3).select("q_id", "vec_id").collect())
    )
    single = set(
        map(
            tuple,
            lsh_cosine_topk(emb, n_queries=5, k=3).select("q_id", "vec_id").collect(),
        )
    )
    multi = set(
        map(
            tuple,
            lsh_multi_topk(emb, n_queries=5, k=3, n_tables=4)
            .select("q_id", "vec_id")
            .collect(),
        )
    )
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.8  # 4 tables on well-clustered data


def test_random_projection_matches_numpy(spark, sf_dir):
    import numpy as np

    from dask_mwu_spark.operators.similarity import random_projection, rp_matrix
    from dask_mwu_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    rows = emb.select("vec_id", "embedding").collect()
    got = (
        random_projection(spark.createDataFrame(rows), k=4)
        .toPandas()
        .set_index(["vec_id", "j"])
        .component
    )
    mat = np.array(rp_matrix(4))  # k x 64
    for r in rows:
        want = mat @ np.array(r.embedding, dtype=np.float64)
        for j in range(4):
            assert abs(got.loc[(r.vec_id, j)] - round(want[j], 6)) < 1e-9


def test_semantic_dup_pairs_within_cluster_only(spark):
    """Pairs must come from the same assigned cluster, and planted
    near-identical vectors must be found."""
    from dask_mwu_spark.operators.similarity import ivf_index, semantic_dup_pairs

    base = rng.normal(size=(40, 32))
    base[25] = base[20] + 1e-4 * rng.normal(size=32)  # planted near-dup
    emb = _emb(spark, base)
    pairs = semantic_dup_pairs(emb, n_centroids=4, tau=0.9).toPandas()
    assert (20, 25) in set(zip(pairs.vec_a, pairs.vec_b))
    asg = ivf_index(emb, n_centroids=4).toPandas().set_index("vec_id").cent_id
    for r in pairs.itertuples():
        assert asg.loc[r.vec_a] == asg.loc[r.vec_b] == r.cent_id


def test_semantic_dup_pairs_cap_identity_under_cap(spark):
    """max_cluster_size larger than every cluster: results IDENTICAL to the
    uncapped path (the cap only kicks in above the threshold)."""
    from dask_mwu_spark.operators.similarity import semantic_dup_pairs

    base = rng.normal(size=(40, 32))
    base[25] = base[20] + 1e-4 * rng.normal(size=32)
    emb = _emb(spark, base)
    uncapped = semantic_dup_pairs(emb, n_centroids=4, tau=0.5).toPandas()
    capped = semantic_dup_pairs(
        emb, n_centroids=4, tau=0.5, max_cluster_size=1000
    ).toPandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cent_id", "cosine"]].values.tolist()))  # noqa: E731
    assert key(capped) == key(uncapped) and len(uncapped) > 0


def test_semantic_dup_pairs_cap_bounds_mega_cluster(spark):
    """A planted mega-cluster (every vector near one direction -> one
    centroid) must produce ~n*cap pairs under the cap instead of n^2/2,
    and every surviving pair must still be intra-sub-bucket correct
    (cosine recomputed exactly)."""
    from dask_mwu_spark.operators.similarity import semantic_dup_pairs

    n = 200
    base = rng.normal(size=(n, 16)) * 0.01
    base[:, 0] += 1.0  # everything points along dim 0 -> one cluster
    emb = _emb(spark, base)
    # inject orthogonal centroids so assignment provably collapses onto
    # centroid 0 (the seeded defaults sample centroids from the same
    # near-dim-0 cone and split the cluster by noise)
    cents = spark.createDataFrame(
        [(i, [1.0 if d == i else 0.0 for d in range(16)]) for i in range(4)],
        "cent_id: long, embedding: array<double>",
    )
    uncapped = semantic_dup_pairs(emb, n_centroids=4, tau=-1.0, centroids=cents)
    capped = semantic_dup_pairs(
        emb, n_centroids=4, tau=-1.0, centroids=cents, max_cluster_size=25
    )
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un == n * (n - 1) // 2  # genuinely one mega-cluster
    # ceil(200/25)=8 sub-buckets: expected pair count ~ 8 * C(25,2) = 2400;
    # allow hash-imbalance headroom but require the quadratic blowup gone
    assert n_cap < n_un * 0.25
    # capped pairs are a subset of uncapped pairs (same scores)
    cp = set(map(tuple, capped.toPandas()[["vec_a", "vec_b"]].values.tolist()))
    up = set(map(tuple, uncapped.toPandas()[["vec_a", "vec_b"]].values.tolist()))
    assert cp <= up


def test_semantic_purge_keeps_min_per_component(spark):
    from dask_mwu_spark.operators.similarity import semantic_purge

    base = rng.normal(size=(30, 32))
    base[12] = base[4]          # dup of 4
    base[21] = base[4] * 1.001  # scaled copy (cosine 1) -> same component
    out = semantic_purge(_emb(spark, base), n_centroids=4, tau=0.999).toPandas()
    kept = set(out.vec_id)
    assert 4 in kept and 12 not in kept and 21 not in kept
    assert len(kept) == 28


def test_quantize_embeddings_matches_numpy(spark):
    from dask_mwu_spark.operators.similarity import quantize_embeddings

    base = rng.normal(size=(8, 16))
    base[3] = 0.0  # zero vector edge case
    got = quantize_embeddings(_emb(spark, base)).toPandas().set_index("vec_id")
    f32 = base.astype(np.float32).astype(np.float64)
    for vid in range(8):
        x = f32[vid]
        m = np.abs(x).max()
        if m == 0:
            want = np.zeros_like(x, dtype=np.int64)
        else:
            want = np.floor(x * (127.0 / m) + 0.5).astype(np.int64)
        assert list(got.loc[vid].qvec) == want.tolist()
        assert np.abs(want).max() <= 127
        assert abs(got.loc[vid].qnrm - np.sqrt((want * want).sum())) < 1e-9


def test_quantized_topk_recall_vs_float(spark):
    """On clustered data the quantized top-k must recover most of the float
    top-k (int8 max-abs keeps cosine error ~1e-2)."""
    from dask_mwu_spark.operators.similarity import quantized_topk

    centers = rng.normal(size=(5, 32)) * 3
    base = np.vstack([c + 0.05 * rng.normal(size=(12, 32)) for c in centers])
    emb = _emb(spark, base)
    exact = cosine_topk(emb, n_queries=5, k=5).toPandas()
    quant = quantized_topk(emb, n_queries=5, k=5).toPandas()
    e = {(r.q_id, r.vec_id) for r in exact.itertuples()}
    q = {(r.q_id, r.vec_id) for r in quant.itertuples()}
    assert len(e & q) / len(e) >= 0.8


def test_dimension_stats_known_values(spark):
    import pandas as pd
    from dask_mwu_spark.operators.similarity import dimension_stats

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1, 2],
                "embedding": [[1.0, 10.0], [2.0, 10.0], [3.0, 10.0]],
                "label": [0, 0, 0],
            }
        )
    )
    out = {r["dim"]: r.asDict() for r in dimension_stats(emb).collect()}
    assert out[0]["mean"] == 2.0 and out[0]["vmin"] == 1.0 and out[0]["vmax"] == 3.0
    assert abs(out[0]["std"] - 0.816497) < 1e-6  # population std of {1,2,3}
    assert out[1]["std"] == 0.0 and out[1]["mean"] == 10.0
    assert all(r["n"] == 3 for r in out.values())
