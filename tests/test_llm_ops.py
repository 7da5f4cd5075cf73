"""Pins for the LLM-pipeline operators whose semantics the SQL oracle
cannot express (SURVEY.md §5.2): approximate dedup vs the exact
baseline, ANN vs the exact scorer, and the deterministic decode stub.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mapreduceplusplus_spark import registry
from tests.conftest import SF_DIR_ORACLE

registry.load_all()


def _pairs(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_minhash_matches_exact_jaccard(spark):
    """Fixed-seed MinHash-LSH (16 bands × 4 rows) must recover EVERY
    pair the exact trigram-Jaccard dedup finds on this corpus (planted
    pairs are ≥ 0.9 Jaccard — miss probability ~4e-8 per pair), with
    identical verified Jaccard values."""
    qs = registry.queries()
    exact = _pairs(qs["dedup_ngram_jaccard"](spark, SF_DIR_ORACLE), "doc_a", "doc_b", "jaccard")
    approx = _pairs(qs["dedup_minhash_near"](spark, SF_DIR_ORACLE), "doc_a", "doc_b", "jaccard")
    assert len(exact) > 0
    assert approx == exact


def test_simhash_recall_and_bound(spark):
    """SimHash 16-bit-band candidates: every output pair respects the
    Hamming bound, and recall over the exact near-dup pairs is ≥ 0.8
    (SimHash on ~50-token docs is noisy by nature — candidates are
    verified downstream in a real pipeline)."""
    qs = registry.queries()
    exact = {(a, b) for a, b, _ in _pairs(qs["dedup_ngram_jaccard"](spark, SF_DIR_ORACLE), "doc_a", "doc_b", "jaccard")}
    sim = _pairs(qs["dedup_simhash"](spark, SF_DIR_ORACLE), "doc_a", "doc_b", "hamming")
    assert all(h <= 6 for _, _, h in sim)
    found = {(a, b) for a, b, _ in sim}
    recall = len(found & exact) / len(exact)
    assert recall >= 0.8, f"simhash recall {recall:.2f} over {len(exact)} exact pairs"


def test_simhash_deterministic(spark):
    qs = registry.queries()
    r1 = _pairs(qs["dedup_simhash"](spark, SF_DIR_ORACLE), "doc_a", "doc_b", "hamming")
    r2 = _pairs(qs["dedup_simhash"](spark, SF_DIR_ORACLE), "doc_a", "doc_b", "hamming")
    assert r1 == r2


def test_lsh_topk_subset_of_exact_scores(spark):
    """ANN results must be REAL similarities: every (vec_id, cosine)
    the LSH variant returns must carry the same cosine the exact
    scorer computes for that vec_id, and candidates must come from the
    probe's bucket (recall < 1 is the ANN contract, correctness of
    scores is not negotiable)."""
    from mapreduceplusplus_spark.llm.similarity import PROBE_ID, _as_double, _dot, _norm
    from mapreduceplusplus_spark.sources.tables import load_table

    qs = registry.queries()
    lsh = qs["sim_search_lsh"](spark, SF_DIR_ORACLE).collect()
    assert 0 < len(lsh) <= 10

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    probe = emb.where(F.col("vec_id") == PROBE_ID).select(F.col("v").alias("pv"))
    exact = (
        emb.where(F.col("vec_id") != PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(_dot(F.col("v"), F.col("pv")) / (_norm(F.col("v")) * _norm(F.col("pv"))), 3).alias("cosine"),
        )
    )
    exact_map = {r.vec_id: r.cosine for r in exact.collect()}
    for r in lsh:
        assert exact_map[r.vec_id] == r.cosine
    # ranks are contiguous and ordered by descending cosine
    ranks = [r.rnk for r in sorted(lsh, key=lambda r: (-r.cosine, r.vec_id))]
    assert ranks == list(range(1, len(lsh) + 1))


def test_decode_stub_formula(spark):
    """The fake decoder is a placeholder for PIL/ffmpeg, but its
    plumbing contract is real: deterministic per-payload metadata,
    one output row per input row, Arrow-batched."""
    qs = registry.queries()
    out = {r.doc_id: r for r in qs["multimodal_decode_stub"](spark, SF_DIR_ORACLE).collect()}
    from mapreduceplusplus_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for d in docs[:50]:
        payload = d.text.encode("utf-8")
        r = out[d.doc_id]
        assert r.n_bytes == len(payload)
        assert r.format == ["png", "jpeg", "webp"][payload[0] % 3]
        assert r.width == len(payload) % 640 + 16
        assert r.ok is True


def test_fingerprint_matches_hashlib(spark):
    qs = registry.queries()
    fp = {r.doc_id: r.exact_fp for r in qs["text_fingerprint"](spark, SF_DIR_ORACLE).collect()}
    from mapreduceplusplus_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text").limit(20).collect()
    for d in docs:
        assert fp[d.doc_id] == hashlib.md5(d.text.encode("utf-8")).hexdigest()


def test_ivf_topk_scores_and_recall(spark):
    """IVF ANN: every returned cosine must equal the exact scorer's
    value for that vec_id (score correctness is not negotiable), ranks
    must be contiguous, the result must be deterministic, and recall
    vs the exact top-k must clear the ANN floor (nprobe=4 of 16 lists;
    on the fixture the probe's neighbors cluster into few lists)."""
    qs = registry.queries()
    ivf = qs["sim_search_ivf"](spark, SF_DIR_ORACLE).collect()
    assert 0 < len(ivf) <= 10
    ivf2 = qs["sim_search_ivf"](spark, SF_DIR_ORACLE).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, ivf2))

    exact = qs["sim_search_topk"](spark, SF_DIR_ORACLE).collect()
    exact_cos = {r.vec_id: r.cosine for r in exact}

    from mapreduceplusplus_spark.llm.similarity import PROBE_ID, _as_double, _dot, _norm
    from mapreduceplusplus_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    probe = emb.where(F.col("vec_id") == PROBE_ID).select(F.col("v").alias("pv"))
    all_cos = {
        r.vec_id: r.cosine
        for r in emb.where(F.col("vec_id") != PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("v"), F.col("pv")) / (_norm(F.col("v")) * _norm(F.col("pv"))), 3
            ).alias("cosine"),
        )
        .collect()
    }
    for r in ivf:
        assert all_cos[r.vec_id] == r.cosine
    recall = len({r.vec_id for r in ivf} & set(exact_cos)) / len(exact_cos)
    assert recall >= 0.5, f"ivf recall {recall:.2f}"


def test_frame_sample_fanout_formula(spark):
    """The fake frame sampler is a placeholder for ffmpeg, but the 1→N
    Arrow fan-out contract is real: n%5+1 frames per doc, millisecond
    timestamps, monotone frame sizes."""
    qs = registry.queries()
    out = {r.doc_id: r for r in qs["multimodal_frame_sample"](spark, SF_DIR_ORACLE).collect()}
    from mapreduceplusplus_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for d in docs[:50]:
        n = len(d.text.encode("utf-8"))
        exp_frames = n % 5 + 1
        r = out[d.doc_id]
        assert r.n_frames == exp_frames
        assert r.first_ts_ms == 0 and r.last_ts_ms == (exp_frames - 1) * 1000
        assert r.total_frame_bytes == sum(max(n - i, 0) for i in range(exp_frames))


def test_resize_and_feature_stub_contracts(spark):
    """Resize: binary in/binary out, payload never grows, target dims
    stamped.  Feature-extract: unit-norm array<float> of FEATURE_DIM.
    Both are narrow Arrow stages feeding the similarity operators."""
    import math

    from mapreduceplusplus_spark.llm.multimodal import (
        FEATURE_DIM,
        extract_features,
        resize_images,
    )
    from mapreduceplusplus_spark.sources.tables import load_table

    docs = (
        load_table(spark, SF_DIR_ORACLE, "documents")
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
        .limit(50)
    )
    rs = resize_images(docs, 224, 224).collect()
    assert len(rs) == 50
    for r in rs:
        assert r.width == 224 and r.height == 224
        assert 1 <= len(r.payload) <= r.orig_bytes

    fe = extract_features(docs).collect()
    assert len(fe) == 50
    for r in fe:
        assert len(r.feature) == FEATURE_DIM
        nrm = math.sqrt(sum(x * x for x in r.feature))
        assert abs(nrm - 1.0) < 1e-5 or nrm == 0.0


def test_stratified_sample_rates_and_determinism(spark):
    """sampleBy with a fixed seed: identical rows on every run, empirical
    per-stratum rates within a loose Bernoulli tolerance, full-rate
    strata kept verbatim."""
    from mapreduceplusplus_spark.llm.pipeline import SAMPLE_FRACTIONS
    from mapreduceplusplus_spark.sources.tables import load_table

    qs = registry.queries()
    s1 = {r.doc_id for r in qs["sample_stratified"](spark, SF_DIR_ORACLE).collect()}
    s2 = {r.doc_id for r in qs["sample_stratified"](spark, SF_DIR_ORACLE).collect()}
    assert s1 == s2 and len(s1) > 0

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "lang").collect()
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    for lang, frac in SAMPLE_FRACTIONS.items():
        if lang not in by_lang:
            continue
        kept = len(by_lang[lang] & s1)
        total = len(by_lang[lang])
        if frac == 1.0:
            assert kept == total, f"{lang}: full-rate stratum must keep all"
        else:
            # Bernoulli(n≈250, p=0.5): allow ±4σ
            import math

            sigma = math.sqrt(total * frac * (1 - frac))
            assert abs(kept - total * frac) <= 4 * sigma, (lang, kept, total)


def test_ngram_prefix_losslessness_adversarial(spark):
    """Directly exercise the prefix/position-filter arithmetic of
    ``_ngram_pairs`` on corpora built to sit ON its boundaries —
    places a fixture-corpus invariance test can never reach:

    - 1- and 2-shingle documents (prefix length clamps to 1);
    - identical documents (Jaccard exactly 1.0);
    - a pair at exactly the 0.8 threshold (|a∩b|=8, |a|=|b|=9 → 8/10);
    - a clearly-below pair (|a|=|b|=9 sharing 7 → 7/11 ≈ 0.636, absent);
    - a pair JUST under threshold (|a|=|b|=44 sharing 39 → 39/49 ≈
      0.7959, must be absent — the tightest integer gap near 0.8 at
      this size, so an off-by-one in the ceiling arithmetic flips it);
    - prefix lengths where float ceil(0.8*n) rounds the wrong way
      (n = 45: exact ceil is 36, float computes 37);
    - many documents sharing one hot shingle (df-order tail) with no
      real similarity.

    For every corpus the filtered result must equal the brute-force
    full-inverted-index result, and the threshold cases must be
    present/absent exactly."""
    from mapreduceplusplus_spark.llm.dedup import _ngram_pairs

    def mk(docs):  # docs: {doc_id: [shingle, ...]}
        rows = [(i, sorted(set(sh))) for i, sh in docs.items() if sh]
        return spark.createDataFrame(rows, "doc_id: bigint, sh: array<string>")

    def pairs(df):
        return sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())

    g = lambda k, n: [f"g{k}_{j}" for j in range(n)]  # noqa: E731

    corpora = {
        "tiny_docs": {
            1: ["a b c"], 2: ["a b c"],            # 1-shingle identical
            3: ["a b c", "x y z"], 4: ["a b c", "x y z"],
            5: ["q r s"],                            # singleton, no pair
        },
        "exact_threshold": {
            # |a|=|b|=9, share 8 → J = 8/10 = 0.8 exactly: MUST appear
            1: g("s", 8) + ["only a"],
            2: g("s", 8) + ["only b"],
            # |c|=|d|=9, share 7 → 7/11 ≈ 0.636: must NOT appear
            3: g("t", 7) + ["c x", "c y"],
            4: g("t", 7) + ["d x", "d y"],
        },
        "just_under_threshold": {
            # |a|=|b|=44, share 39 → J = 39/49 ≈ 0.7959: the closest an
            # equal-size integer pair gets to 0.8 from below at this
            # size — must NOT appear (share 40 would be 40/48 ≈ 0.833)
            1: g("n", 39) + [f"a{j} x" for j in range(5)],
            2: g("n", 39) + [f"b{j} x" for j in range(5)],
        },
        "float_ceil_n45": {
            # n=45 each, share 41 → J = 41/49 ≈ 0.837 ≥ 0.8.  With the
            # float-ceil bug the prefix would be 45-37+1=9 instead of
            # 10 — still likely caught, but the arithmetic is pinned
            # by equality with brute force either way.
            1: g("c", 41) + ["a1 x", "a2 x", "a3 x", "a4 x"],
            2: g("c", 41) + ["b1 x", "b2 x", "b3 x", "b4 x"],
        },
        "hot_shingle": {
            # 30 docs all share one stop-phrase; no pair qualifies
            i: [f"u{i} v", f"w{i} z", "the hot one"] for i in range(30)
        },
    }
    for name, docs in corpora.items():
        df = mk(docs)
        got = pairs(_ngram_pairs(df, prefix=True))
        brute = pairs(_ngram_pairs(df, prefix=False))
        assert got == brute, f"{name}: filtered != brute force"
    # threshold semantics, checked on the corpus built for them
    thr = pairs(_ngram_pairs(mk(corpora["exact_threshold"]), prefix=True))
    assert (1, 2, 0.8) in thr, "exact-0.8 pair must be reported"
    assert not any(a == 3 and b == 4 for a, b, _ in thr), "sub-threshold pair leaked"
    near = pairs(_ngram_pairs(mk(corpora["just_under_threshold"]), prefix=True))
    assert near == [], f"0.7959 pair leaked past the 0.8 threshold: {near}"
