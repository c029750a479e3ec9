"""Similarity-search tests: planted near-dup recall at multiple LSH
configurations, candidate-count bounds, and plane-count scaling.

The embeddings testdata table is isotropic random (no real near-dup
structure), so these tests plant their own: base vectors plus copies with a
small deterministic perturbation (cos >= ~0.99) and assert the LSH paths
find them.
"""

from __future__ import annotations

import math
import random

import pytest

from rgr_pdal_topo_spark.operators import similarity


def _planted(n_base: int = 60, dim: int = 64, seed: int = 3):
    rng = random.Random(seed)
    rows = []
    for i in range(n_base):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        rows.append((i, [float(x) for x in v]))
        w = [x + 0.05 * rng.gauss(0.0, 1.0) for x in v]
        rows.append((1000 + i, [float(x) for x in w]))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _planted(), "vec_id long, embedding array<float>"
    )


@pytest.mark.parametrize(
    "n_planes,multi_probe,min_recall",
    [(4, False, 0.5), (8, True, 0.5)],
)
def test_near_dup_recall(emb, n_planes, multi_probe, min_recall):
    got = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dups(
            emb, threshold=0.95, n_planes=n_planes, multi_probe=multi_probe
        ).collect()
    }
    planted = {(i, 1000 + i) for i in range(60)}
    recall = len(got & planted) / len(planted)
    assert recall >= min_recall, (
        f"planes={n_planes} probe={multi_probe}: recall {recall}"
    )


def test_multi_probe_dominates_single_bucket(emb):
    single = similarity.embedding_near_dups(
        emb, threshold=0.95, n_planes=8, multi_probe=False
    ).count()
    probed = similarity.embedding_near_dups(
        emb, threshold=0.95, n_planes=8, multi_probe=True
    ).count()
    assert probed >= single


def test_candidate_count_bounded(spark):
    # isotropic corpus: the probe structure must score only a small
    # fraction of all pairs (9/2^8 expected for 8 planes + Hamming<=1)
    rng = random.Random(11)
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(64)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.embedding_near_dups(
        df, threshold=-1.0, n_planes=8, multi_probe=True
    ).count()
    all_pairs = 300 * 299 // 2
    assert got < 0.12 * all_pairs, (
        f"{got}/{all_pairs} pairs scored — LSH structure not selective"
    )


def test_topk_lsh_recall_vs_exact(emb):
    exact = {
        (r.query_id, r.nn_id)
        for r in similarity.cosine_topk(emb, n_queries=10, k=1).collect()
    }
    approx = {
        (r.query_id, r.nn_id)
        for r in similarity.cosine_topk_lsh(
            emb, n_queries=10, k=1, n_planes=8, multi_probe=True
        ).collect()
    }
    # rank-1 neighbor of a planted base vector is its near-dup copy —
    # overwhelmingly likely to share a bucket within Hamming<=1
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"top-1 recall {recall}"


def test_n_planes_for_scaling():
    assert similarity.n_planes_for(50) == 4
    assert similarity.n_planes_for(500) == 4
    assert similarity.n_planes_for(10**6) == math.ceil(math.log2(10**6 / 64))
    assert similarity.n_planes_for(10**12) == 24


def test_ivf_recall_and_structure(spark):
    """IVF top-k: (a) every query emits exactly k ranked rows, (b) each
    (query, neighbor) appears once (one list per member + distinct probe
    cids), (c) recall@5 vs exact brute force clears a floor appropriate
    for a 16-list 4-probe structure."""
    from rgr_pdal_topo_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    ivf = similarity.cosine_topk_ivf(
        emb, n_queries=10, k=5, n_centroids=16, n_probe=4
    ).toPandas()
    assert (ivf.groupby("query_id").size() == 5).all()
    assert not ivf.duplicated(["query_id", "nn_id"]).any()
    exact = similarity.cosine_topk(emb, n_queries=10, k=5).toPandas()
    hits = 0
    for qid, g in exact.groupby("query_id"):
        truth = set(g.nn_id)
        got = set(ivf[ivf.query_id == qid].nn_id)
        hits += len(truth & got)
    recall = hits / len(exact)
    assert recall >= 0.4, f"IVF recall@5 {recall:.2f} below floor"


def test_kmeans_nd_matches_numpy_lloyd(spark):
    """Distributed multi-dim Lloyd == sequential numpy Lloyd from the
    same deterministic seeds: identical assignments, centroids equal to
    float tolerance (mean aggregation order differs)."""
    import numpy as np

    from rgr_pdal_topo_spark.operators.cluster import kmeans_nd
    from rgr_pdal_topo_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    assigned, cents = kmeans_nd(emb, "embedding", k=6, iters=3)
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    X = np.stack(pdf.embedding.to_numpy()).astype("float64")
    C = X[:6].copy()
    for _ in range(3):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)  # argmin ties -> lowest index, same rule
        for c in range(6):
            if (lab == c).any():
                C[c] = X[lab == c].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    lab = d.argmin(axis=1)
    got = (
        assigned.select("vec_id", "cluster")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got.cluster.to_numpy() == lab).mean() > 0.999
    np.testing.assert_allclose(np.array(cents), C, rtol=1e-9, atol=1e-9)


def test_ivf_with_trained_centroids(spark):
    """cosine_topk_ivf accepts trained centroids: structure invariants
    hold and recall clears the same floor as the seed quantizer."""
    from rgr_pdal_topo_spark.operators.cluster import kmeans_nd
    from rgr_pdal_topo_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    _, cents = kmeans_nd(emb, "embedding", k=16, iters=2)
    ivf = similarity.cosine_topk_ivf(
        emb, n_queries=10, k=5, n_probe=4, centroids=cents
    ).toPandas()
    assert (ivf.groupby("query_id").size() == 5).all()
    exact = similarity.cosine_topk(emb, n_queries=10, k=5).toPandas()
    hits = sum(
        len(set(g.nn_id) & set(ivf[ivf.query_id == q].nn_id))
        for q, g in exact.groupby("query_id")
    )
    assert hits / len(exact) >= 0.4


def test_sq8_recall_vs_exact(emb):
    """SQ8 quantization is lossy in the 3rd decimal at scale 200 over
    unit-ish vectors — top-5 sets should overlap the float path almost
    everywhere, and top-1 (a planted near-dup) must survive."""
    exact5 = {
        (r.query_id, r.nn_id)
        for r in similarity.cosine_topk(emb, n_queries=10, k=5).collect()
    }
    sq5 = {
        (r.query_id, r.nn_id)
        for r in similarity.cosine_topk_sq8(emb, n_queries=10, k=5).collect()
    }
    assert len(sq5 & exact5) / len(exact5) >= 0.8
    exact1 = {
        (r.query_id, r.nn_id)
        for r in similarity.cosine_topk(emb, n_queries=10, k=1).collect()
    }
    sq1 = {
        (r.query_id, r.nn_id)
        for r in similarity.cosine_topk_sq8(emb, n_queries=10, k=1).collect()
    }
    assert len(sq1 & exact1) / len(exact1) >= 0.9


def test_sq8_quantization_bounds(emb):
    """Quantized components stay on the clamped int8 grid."""
    from pyspark.sql import functions as F

    scale = similarity.sq8_trained_scale(emb)
    row = (
        emb.select(
            similarity.quantize_sq8("embedding", scale).alias("qv")
        )
        .select(
            F.min(F.array_min("qv")).alias("lo"),
            F.max(F.array_max("qv")).alias("hi"),
        )
        .collect()[0]
    )
    assert -127 <= row.lo <= row.hi <= 127


def test_ivf_sq8_composition_recall_and_structure(spark):
    """IVF+SQ8 composed (FAISS IVF16,SQ8): (a) k ranked rows per query,
    no duplicate candidates; (b) the NEIGHBOR SETS equal plain IVF's —
    routing is float in both, and SQ8's quantization error is far below
    the inter-candidate cosine gaps at this corpus size — while the
    cosine VALUES differ (quantized); (c) recall@5 vs exact brute force
    clears the same floor as IVF alone."""
    from rgr_pdal_topo_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    comp = similarity.cosine_topk_ivf_sq8(
        emb, n_queries=10, k=5, n_centroids=16, n_probe=4
    ).toPandas()
    assert (comp.groupby("query_id").size() == 5).all()
    assert not comp.duplicated(["query_id", "nn_id"]).any()
    ivf = similarity.cosine_topk_ivf(
        emb, n_queries=10, k=5, n_centroids=16, n_probe=4
    ).toPandas()
    exact = similarity.cosine_topk(emb, n_queries=10, k=5).toPandas()
    hits = ivf_agree = 0
    for qid, g in exact.groupby("query_id"):
        got = set(comp[comp.query_id == qid].nn_id)
        hits += len(set(g.nn_id) & got)
        ivf_agree += len(set(ivf[ivf.query_id == qid].nn_id) & got)
    assert hits / len(exact) >= 0.4
    assert ivf_agree / len(ivf) >= 0.8  # quantization barely moves top-5


def test_semdedup_planted_clusters(spark):
    """Hand-computed SemDeDup on a 2-centroid toy corpus: near-seed
    vectors pair with the seed and each other (lowest id survives), a
    tie between centroids resolves to the lower cid, and a non-duplicate
    member is kept."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),      # seed / cluster 0
        (1, [0.0, 1.0, 0.0, 0.0]),      # seed / cluster 1
        (2, [0.9, 0.05, 0.0, 0.0]),     # ~seed0 -> dup of 0
        (3, [0.9, 0.05, 0.001, 0.0]),   # ~2     -> dup of 0 and 2
        (4, [0.05, 0.9, 0.0, 0.0]),     # ~seed1 -> dup of 1
        (5, [0.6, 0.6, 0.5, 0.0]),      # equidistant tie -> cid 0, kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["cid"]: (r["n_vectors"], r["n_dup_pairs"], r["n_dropped"],
                   r["n_kept"])
        for r in similarity.semdedup(emb, n_centroids=2).collect()
    }
    assert got == {
        0: (4, 3, 2, 2),   # members {0,2,3,5}; pairs (0,2)(0,3)(2,3)
        1: (2, 1, 1, 1),   # members {1,4}; pair (1,4)
    }


def test_pq_structure_and_recall(spark):
    """PQ-ADC: (a) exactly k ranked rows per query and no duplicate
    (query, neighbor); (b) codebook seeds reconstruct EXACTLY to
    themselves (d2 == 0 per subspace -> adc_cosine of a seed against
    its own reconstruction is its true cosine), checked via a seed
    query whose self is excluded but whose top hits carry exact
    cosines for seed neighbors; (c) recall@5 vs the exact scan clears
    a floor appropriate for an 8x16 seed-codebook quantizer."""
    from rgr_pdal_topo_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    pq = similarity.cosine_topk_pq(
        emb, n_queries=10, k=5, m=8, n_codes=16
    ).toPandas()
    assert (pq.groupby("query_id").size() == 5).all()
    assert not pq.duplicated(["query_id", "nn_id"]).any()
    exact = similarity.cosine_topk(emb, n_queries=10, k=5).toPandas()
    hits = 0
    for qid, g in exact.groupby("query_id"):
        truth = set(g.nn_id)
        got = set(pq[pq.query_id == qid].nn_id)
        hits += len(truth & got)
    recall = hits / len(exact)
    # seed codebooks (first 16 vectors' subvectors) are deliberately
    # untrained — measured recall@5 is ~0.22 here; per-subspace
    # kmeans_nd codebooks are the documented lift path.  The floor
    # guards structure, not quantizer quality.
    assert recall >= 0.15, f"PQ recall@5 {recall:.2f} below floor"


def test_pq_seeds_reconstruct_exactly(spark):
    """On an all-seed corpus (16 vectors, 16 codes) every vector IS a
    codebook entry, so d2 == 0 in every subspace, the reconstruction
    is the vector itself, and EVERY adc_cosine equals the exact
    cosine at the shared ROUND(,5) surface — the PQ analogue of
    SQ8's trained-scale roundtrip pin."""
    import numpy as np

    rng = random.Random(23)
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(64)])
        for i in range(16)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    pq = similarity.cosine_topk_pq(
        emb, n_queries=10, k=5, m=8, n_codes=16
    ).toPandas()
    vecs = {
        i: np.array(v, dtype="float32").astype("float64")
        for i, v in rows
    }
    assert len(pq) == 50
    for r in pq.itertuples():
        a, b = vecs[r.query_id], vecs[int(r.nn_id)]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.adc_cosine - true_cos) < 5e-6, (
            r.query_id, r.nn_id, r.adc_cosine, true_cos,
        )


def test_ivf_pq_is_ivf_routing_of_pq_scores(spark):
    """The composed index must be EXACTLY the PQ scores restricted to
    IVF-probed lists: every (query, nn, adc_cosine) in ivf_pq appears
    with the same score in a full PQ scan ranking, and candidates come
    only from the query's probed lists."""
    from rgr_pdal_topo_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    comp = similarity.cosine_topk_ivf_pq(
        emb, n_queries=10, k=5, n_centroids=16, n_probe=4,
        m=8, n_codes=16,
    ).toPandas()
    assert (comp.groupby("query_id").size() <= 5).all()
    # full PQ scan with a huge k = the unrestricted score surface
    full = similarity.cosine_topk_pq(
        emb, n_queries=10, k=10**6, m=8, n_codes=16
    ).toPandas()
    fmap = {
        (r.query_id, r.nn_id): r.adc_cosine for r in full.itertuples()
    }
    for r in comp.itertuples():
        assert fmap[(r.query_id, int(r.nn_id))] == r.adc_cosine


def test_pq_trained_codebooks_reduce_quantization_error(spark):
    """cosine_topk_pq accepts per-subspace kmeans_nd codebooks (the
    cosine_topk_ivf trained-quantizer contract): total reconstruction
    error sum|x - x_hat|^2 with trained codebooks must not exceed the
    seed codebooks' (Lloyd minimizes exactly this objective), and the
    structure invariants hold."""
    import numpy as np

    from rgr_pdal_topo_spark.operators.cluster import kmeans_nd
    from rgr_pdal_topo_spark.operators.similarity import (
        _pq_reconstruct, with_norm,
    )
    from rgr_pdal_topo_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    m, w = 8, 8
    books = []
    for j in range(m):
        sl = emb.selectExpr(
            "vec_id", f"slice(embedding, {j * w + 1}, {w}) AS embedding"
        )
        _, cents = kmeans_nd(sl, "embedding", k=16, iters=2)
        books.append([list(c) for c in cents])

    base = with_norm(emb).selectExpr("vec_id AS nn_id", "vec", "norm")

    def total_err(codebooks):
        rec = _pq_reconstruct(base, m, 16, codebooks).toPandas()
        full = base.select("nn_id", "vec").toPandas()
        xs = {r.nn_id: np.array(r.vec) for r in full.itertuples()}
        return sum(
            float(((xs[r.nn_id] - np.array(r.xhat)) ** 2).sum())
            for r in rec.itertuples()
        )

    err_seed = total_err(None)
    err_trained = total_err(books)
    assert err_trained <= err_seed, (err_trained, err_seed)
    # and the full query path runs with trained books
    out = similarity.cosine_topk_pq(
        emb, n_queries=5, k=3, m=m, n_codes=16, codebooks=books
    ).toPandas()
    assert (out.groupby("query_id").size() == 3).all()


def test_ann_recall_eval_consistent_with_components(spark):
    """The eval row must equal the set overlap of its two component
    queries' outputs, recomputed independently in pandas; every query
    appears exactly once including zero-overlap ones."""
    from rgr_pdal_topo_spark.operators import similarity
    from rgr_pdal_topo_spark.queries import QUERIES
    from rgr_pdal_topo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    bt = similarity.cosine_topk(emb, n_queries=10, k=5).toPandas()
    iv = similarity.cosine_topk_ivf(
        emb, n_queries=10, k=5, n_centroids=16, n_probe=4
    ).toPandas()
    truth = {
        q: set(g.nn_id) for q, g in bt.groupby("query_id")
    }
    approx = {
        q: set(g.nn_id) for q, g in iv.groupby("query_id")
    }
    rows = QUERIES["ann_recall_eval"](spark, sf).collect()
    assert sorted(r["query_id"] for r in rows) == sorted(truth)
    total = 0
    for r in rows:
        exp = len(truth[r["query_id"]] & approx.get(r["query_id"], set()))
        assert r["n_hit"] == exp
        assert r["recall_at_5"] == round(exp / 5.0, 6)
        total += exp
    assert all(
        r["mean_recall"] == round(total / (5.0 * len(rows)), 6)
        for r in rows
    )
