"""Property pins for the embedding maintenance operators
(``llm/embeddings.py``): quantizer range/error bounds and centroid
exactness against a driver-side numpy recomputation.
"""

from __future__ import annotations

import numpy as np

from mapreduceplusplus_spark.llm.embeddings import (
    embedding_label_centroids,
    embedding_quantize_int8,
)
from mapreduceplusplus_spark.sources.tables import load_table
from tests.conftest import SF_DIR_ORACLE


def test_quantizer_range_and_error_bound(spark):
    rows = embedding_quantize_int8(spark, SF_DIR_ORACLE).collect()
    raw = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF_DIR_ORACLE, "embeddings").collect()
    }
    assert rows
    for r in rows:
        codes = np.asarray(r.codes, dtype=np.int64)
        assert np.abs(codes).max() <= 127
        x = np.asarray(raw[r.vec_id], dtype=np.float64)
        if r.scale == 0:
            assert not codes.any()
            continue
        # the max-|x| element maps to exactly ±127
        assert np.abs(codes).max() == 127
        # reconstruction error bounded by half a quantization step
        recon = codes * r.scale / 127.0
        assert np.abs(x - recon).max() <= r.scale / 254.0 * (1 + 1e-9)
        assert r.sum_codes == int(codes.sum())


def test_centroids_match_numpy_integer_recompute(spark):
    rows = {r.label: r for r in embedding_label_centroids(spark, SF_DIR_ORACLE).collect()}
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(
            [int(round(float(v) * 1_000_000)) for v in r.embedding]
        )
    assert set(rows) == set(by_label)
    for label, vecs in by_label.items():
        a = np.asarray(vecs, dtype=np.int64)
        got = rows[label]
        assert got.n_vecs == len(vecs)
        assert list(a.sum(axis=0)) == list(got.centroid_sum_e6)
        # floor-division mean, including negative sums
        want_mean = [s // len(vecs) for s in a.sum(axis=0)]
        assert want_mean == list(got.centroid_mean_e6)


def test_pca_projection_matches_independent_recompute(spark):
    """Pin embedding_pca_project three ways: (1) the projections match
    an independent single-machine recompute (numpy covariance from the
    raw table — exercises the distributed integer-Gram plumbing end to
    end), (2) PC1 variance dominates every coordinate axis (the
    variance-maximality that DEFINES PCA), and (3) two invocations are
    row-identical (the integer-Gram determinism contract)."""
    from mapreduceplusplus_spark.llm.embeddings import (
        _PCA_MICRO,
        embedding_pca_project,
    )

    rows = embedding_pca_project(spark, SF_DIR_ORACLE).collect()
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").collect()
    X = np.asarray([[float(v) for v in r.embedding] for r in emb])
    ids = [r.vec_id for r in emb]
    Xi = np.rint(X * _PCA_MICRO)
    mu = Xi.mean(axis=0)
    cov = (Xi.T @ Xi) / len(Xi) - np.outer(mu, mu)
    _, vecs = np.linalg.eigh(cov)
    pc = vecs[:, -1]
    ref = ((Xi - np.rint(mu)) @ pc) / _PCA_MICRO
    got = np.array([{r.vec_id: r.pc1 for r in rows}[i] for i in ids])
    cos = abs(got @ ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999999, cos
    assert got.var() >= X.var(axis=0).max()
    assert abs(got.mean()) < 1e-3          # centered projection
    assert rows == embedding_pca_project(spark, SF_DIR_ORACLE).collect()


def test_kcenter_greedy_gain_monotone_and_distinct(spark):
    """Greedy farthest-point invariants at oracle scale: the covering
    gain is non-increasing from pick 2 on (min-dist to a GROWING set
    can only shrink), picks are distinct, seed is min vec_id with
    gain 0."""
    from mapreduceplusplus_spark import registry

    registry.load_all()
    rows = sorted(
        registry.queries()["sample_kcenter_coreset"](
            spark, SF_DIR_ORACLE
        ).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert rows[0]["pick_rank"] == 1 and rows[0]["gain_dist"] == 0
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    gains = [r["gain_dist"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(gains, gains[1:])), gains


def test_triplet_single_corpus_pass(spark):
    """Plan pin (r13 audit): triplet mining must NOT re-execute the
    scan+broadcast subplan per polarity branch — the single (probe,
    polarity) window materializes the ≤ k-per-key survivors once and
    the final join reads only that frame (zero FileScans in the final
    plan).  Measured 1.5× faster than the two-branch form at 25×
    (24.8 vs 37.6 s, same session).  ``embedding_matryoshka_eval`` is
    deliberately NOT pinned this way: for it the two-branch form
    measured FASTER than both single-pass alternatives (see its
    inline comment) — one plan shape is not the answer for both."""
    from mapreduceplusplus_spark import registry

    registry.load_all()
    df = registry.queries()["sim_search_triplet_mining"](spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0, f"re-scans per branch:\n{plan}"


def test_triplet_lsh_gated_recall_and_plan(spark):
    """The r15 ANN-gated triplet miner: (a) candidate generation is a
    pure bucket EQUI-JOIN — no CartesianProduct / BroadcastNestedLoop
    anywhere in the plan (the scale contract vs the exact form's
    broadcast anchors); (b) every emitted pair's cosine equals the
    exact miner's value for the same (anchor, negative) pair — scores
    never degrade, only recall; (c) recall of the LSH-gated hardest
    negatives vs the exact form clears the ANN floor; (d) emitted
    per-anchor ranks are contiguous from 1."""
    from mapreduceplusplus_spark import registry

    registry.load_all()
    qs = registry.queries()
    df = qs["sim_search_triplet_mining_lsh"](spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    got = df.collect()
    assert got, "LSH-gated miner emitted no triplets on the fixture"

    exact = qs["sim_search_triplet_mining"](spark, SF_DIR_ORACLE).collect()
    exact_scores = {
        (r.probe_id, r.neg_vec_id): r.neg_cosine for r in exact
    }
    exact_negs: dict[int, set[int]] = {}
    for r in exact:
        exact_negs.setdefault(r.probe_id, set()).add(r.neg_vec_id)
    hits = total = 0
    for pid, negs in exact_negs.items():
        mine = {r.neg_vec_id for r in got if r.probe_id == pid}
        hits += len(mine & negs)
        total += len(negs)
    assert total and hits / total >= 0.3, f"recall {hits}/{total}"
    for r in got:
        if (r.probe_id, r.neg_vec_id) in exact_scores:
            assert r.neg_cosine == exact_scores[(r.probe_id, r.neg_vec_id)]
    by_anchor: dict[int, list[int]] = {}
    for r in got:
        by_anchor.setdefault(r.probe_id, []).append(r.rnk)
    for pid, rnks in by_anchor.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (pid, rnks)
