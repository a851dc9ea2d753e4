"""Similarity search: exact top-k determinism and ANN recall bounds."""

from pyspark.sql import functions as F

from change_data_capture_spark.extensions import similarity
from tests.conftest import load


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_brute_force_is_deterministic(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = similarity.brute_force_topk(emb, q, k=5).collect()
    b = similarity.brute_force_topk(emb, q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 5 * 5


def test_ann_variants_recall(spark, sf_dir):
    """Both approximate indexes must recover a meaningful fraction of
    the exact top-5 (they trade recall for candidate reduction, but a
    broken bucket join would drop to ~0)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(similarity.brute_force_topk(emb, q, k=5))

    for name, ann_df, floor in (
        ("lsh", similarity.lsh_ann_topk(emb, q, k=5, dim=64, planes=4), 0.3),
        ("ivf", similarity.ivf_ann_topk(emb, q, k=5, n_lists=16, n_probe=2), 0.6),
        ("ivfpq", similarity.ivfpq_ann_topk(emb, q, k=5, n_lists=16, n_probe=2), 0.5),
    ):
        approx = _topk_sets(ann_df)
        hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= floor, f"{name} recall collapsed: {hits}/{total}"


def test_ivf_respects_k_and_ranks(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = similarity.ivf_ann_topk(emb, q, k=5, n_lists=16, n_probe=2)
    per_q = out.groupBy("query_id").agg(F.count("*").alias("n"), F.max("rnk").alias("mx"))
    bad = per_q.filter((F.col("n") > 5) | (F.col("mx") > 5)).count()
    assert bad == 0


def test_kmeans_lloyd_deterministic_and_improving(spark, sf_dir):
    """Lloyd training must be bit-identical across input partitionings
    (the integer-quantized mean is the whole point), cover every
    vector exactly once, and not make the mean assignment score worse
    than the seeded (0-iteration) assignment."""
    emb = load(spark, sf_dir, "embeddings")
    a = similarity.kmeans_lloyd(emb, k=4, iters=2, dim=64).collect()
    b = similarity.kmeans_lloyd(emb.repartition(13), k=4, iters=2, dim=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = emb.count()
    assert len(a) == n
    assert len({r["vec_id"] for r in a}) == n
    assert len({r["cluster"] for r in a}) <= 4

    seeded = similarity.kmeans_lloyd(emb, k=4, iters=0, dim=64).collect()
    mean_trained = sum(r["score"] for r in a) / n
    mean_seeded = sum(r["score"] for r in seeded) / n
    assert mean_trained >= mean_seeded - 1e-9


def test_quantize_int8_hand_computed(spark):
    from change_data_capture_spark.extensions.similarity import quantize_int8

    vecs = spark.createDataFrame(
        [
            (1, [0.0, 10.0, 7.0]),
            (2, [5.0, 10.0, 7.0]),
            (3, [10.0, 20.0, 7.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: list(r["codes"]) for r in quantize_int8(vecs).collect()}
    # d1: range [0,10] -> floor(x/10*255)-128; d2: range [10,20]; d3 constant -> 0
    assert out[1] == [-128, -128, 0]
    assert out[2] == [int(5 / 10 * 255) - 128, -128, 0]  # floor(127.5)=127 -> -1
    assert out[2][0] == -1
    assert out[3] == [127, 127, 0]


def test_pq_encode_hand_computed(spark):
    vecs = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 1.0, 1.0, 1.0]),
            (3, [0.1, 0.0, 0.9, 1.0]),
            (4, [1.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    # codebook = vectors 1 and 2; subspaces are dims [0,1] and [2,3]
    out = {
        r["vec_id"]: r
        for r in similarity.pq_encode(vecs, m=2, k=2, dim=4).collect()
    }
    assert (out[1]["code0"], out[1]["code1"]) == (0, 0)
    assert (out[2]["code0"], out[2]["code1"]) == (1, 1)
    assert (out[3]["code0"], out[3]["code1"]) == (0, 1)
    assert (out[4]["code0"], out[4]["code1"]) == (1, 0)
    assert abs(out[3]["recon_err"] - 0.02) < 1e-9
    assert out[4]["recon_err"] == 0.0


def test_pq_encode_plan_is_narrow(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = similarity.pq_encode(emb)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # literal codebook: no join, no shuffle, no Python in the encode
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_decontaminate_matches_brute_force(spark):
    import math
    import random

    rng = random.Random(7)
    dim = 8
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    train = df.filter(F.col("vec_id") % 4 != 0)
    bench = df.filter(F.col("vec_id") % 4 == 0)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    expected = {
        (i, j)
        for i, a in vecs
        if i % 4 != 0
        for j, b in vecs
        if j % 4 == 0 and cos(a, b) >= 0.4
    }
    out = similarity.embedding_decontaminate(
        train, bench, threshold=0.4, n_lists=4, dim=dim
    )
    got = {(r.train_id, r.bench_id) for r in out.collect()}
    assert got == expected and len(expected) > 0
    # set confinement: never a train-train or bench-bench pair
    assert all(i % 4 != 0 and j % 4 == 0 for i, j in got)


def test_ivf_index_catalog_roundtrip_matches_direct(spark, sf_dir, tmp_path):
    """FAISS-style build/query split: the persisted IVF index (id,
    list_id, vector) round-trips the CDC envelope into a managed table
    and querying against it returns exactly the build-per-query
    results — centroids re-derive from the index's own smallest ids,
    no side-channel files."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.extensions.similarity import ivf_ann_topk, ivf_index
    from tests.conftest import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    direct = ivf_ann_topk(emb, queries, k=5, n_lists=16, n_probe=2, dim=64)

    idx = ivf_index(emb, n_lists=16, dim=64)
    assert set(idx.columns) == {"vec_id", "list_id", "embedding"}
    cat = TableCatalog(str(tmp_path / "ivf"))
    apply_changelog(spark, snapshot_changelog(idx, "ml.ivf", ["vec_id"]), cat)
    stored = cat.read(spark, "ml.ivf")

    via_index = ivf_ann_topk(
        emb, queries, k=5, n_lists=16, n_probe=2, dim=64, index=stored
    )
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_ivfpq_index_catalog_roundtrip_matches_direct(spark, sf_dir, tmp_path):
    """The compressed (PQ) index also persists and queries identically:
    all-integer code columns ride the envelope, centroids/codebook/
    rerank vectors re-derive from the corpus, and a wrong-m index
    fails fast."""
    import pytest
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.extensions.similarity import (
        ivfpq_ann_topk, ivfpq_index,
    )
    from tests.conftest import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 6)
    direct = ivfpq_ann_topk(emb, queries, k=5, dim=64)

    idx = ivfpq_index(emb, dim=64)
    assert set(idx.columns) == {"vec_id", "list_id"} | {f"code{s}" for s in range(8)}
    cat = TableCatalog(str(tmp_path / "pq"))
    apply_changelog(spark, snapshot_changelog(idx, "ml.pq", ["vec_id"]), cat)
    via = ivfpq_ann_topk(emb, queries, k=5, dim=64, index=cat.read(spark, "ml.pq"))
    assert sorted(map(tuple, via.collect())) == sorted(map(tuple, direct.collect()))

    with pytest.raises(ValueError, match="different m"):
        ivfpq_ann_topk(emb, queries, k=5, dim=64, m=16, index=cat.read(spark, "ml.pq"))


def test_hybrid_retrieval_rrf_semantics(spark):
    """A doc ranked high in BOTH legs must outrank docs carried by one
    leg alone, absent legs contribute exactly 0, and every fused score
    equals the closed-form RRF of its own ranks."""
    from change_data_capture_spark.extensions.similarity import hybrid_retrieval

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),          # the query
            (1, "alpha beta gamma"),          # lexical twin + dense twin
            (2, "alpha zz yy"),               # weak lexical overlap
            (3, "qq rr ss"),                  # no shared tokens at all
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.01]),                # dense #1
            (2, [0.0, 1.0]),                  # dense last
            (3, [0.9, 0.2]),                  # dense #2, lexical absent
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["doc_id"]: r for r in
           hybrid_retrieval(docs, emb, query_ids=[0], k=3).collect()}
    assert out[1]["rnk"] == 1                      # both legs -> top
    assert out[3]["lex_rank"] is None              # absent leg is NULL...
    for r in out.values():                         # ...and contributes 0
        want = sum(
            round(1.0 / (60 + r[c]), 8)
            for c in ("dense_rank", "lex_rank") if r[c] is not None
        )
        assert r["rrf_score"] == want, (r, want)


def test_similarity_params_fail_fast(spark, sf_dir):
    """ADVICE r6 follow-up area: degenerate/typo'd parameters raise at
    the call naming themselves — never a silent empty result, a
    shiftleft overflow, or a mid-job arithmetic error."""
    import pytest

    from change_data_capture_spark.extensions import similarity as sm
    from conftest import load

    emb = load(spark, sf_dir, "embeddings")
    q = emb.limit(2)
    with pytest.raises(ValueError, match="k=0"):
        sm.brute_force_topk(emb, q, k=0)
    with pytest.raises(ValueError, match="planes=63"):
        sm.lsh_ann_topk(emb, q, k=5, dim=64, planes=63)
    with pytest.raises(ValueError, match="n_probe=0"):
        sm.ivf_ann_topk(emb, q, k=5, n_lists=16, n_probe=0)
    with pytest.raises(ValueError, match="not divisible"):
        sm.pq_encode(emb, m=7, k=16, dim=64)
    with pytest.raises(ValueError, match="smaller than the"):
        sm.pq_encode(emb.limit(3), m=8, k=16, dim=64)
    with pytest.raises(ValueError, match="rerank=3 < k=5"):
        sm.ivfpq_ann_topk(emb, q, k=5, rerank=3)
    with pytest.raises(ValueError, match="query_ids is empty"):
        sm.hybrid_retrieval(
            load(spark, sf_dir, "documents"), emb, query_ids=[], k=5
        )
    with pytest.raises(ValueError, match="iters=-1"):
        sm.kmeans_lloyd(emb, k=4, iters=-1)


def test_ivf_corpus_side_plan_is_shuffle_free(spark, sf_dir):
    """r11 structural pin: the literal-centroid fused assignment keeps
    the whole IVF-PQ index side (list ids + PQ codes) a narrow
    projection chain — no Exchange, no join — and builds each query
    with exactly ONE bounded collect (the shared head of the corpus).
    The pre-r11 shape paid a corpus Exchange for the assignment window
    plus an Exchange+sort pair for the codes equi-join."""
    from change_data_capture_spark.extensions import similarity as sm
    from change_data_capture_spark.planaudit import ExecutedPlanCollector

    emb = load(spark, sf_dir, "embeddings")
    # index side alone (emit mode): zero shuffles in the plan
    with ExecutedPlanCollector(spark) as col:
        col.drain()
        col.clear()
        idx = sm.ivfpq_index(emb)
        n_build = len(col.drain())
    assert n_build == 1, f"expected 1 bounded head collect, saw {n_build}"
    plan = idx._jdf.queryExecution().executedPlan().toString()
    # spread()'s round-robin scan-parallelism repartition is the ONLY
    # allowed exchange; no key shuffle, no join anywhere
    assert "hashpartitioning" not in plan, plan[:2000]
    assert "rangepartitioning" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]
