"""Dedup operators: exact/jaccard/minhash agreement and the
connected-components clustering fixpoint."""

from pyspark.sql import functions as F

from change_data_capture_spark.extensions import dedup
from tests.conftest import load


def test_minhash_matches_bruteforce(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bf = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup.jaccard_duplicates(docs, n=5, threshold=0.8).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup.minhash_lsh_duplicates(
            docs, n=5, k=96, bands=24, threshold=0.8
        ).collect()
    }
    assert bf == lsh and len(bf) > 0
    # recall floor for the narrowed r5 bench configuration (72/24x3,
    # >=2-band miss ~9e-7): the LSH answer must STILL equal brute force
    lsh72 = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup.minhash_lsh_duplicates(
            docs, n=5, k=72, bands=24, threshold=0.8
        ).collect()
    }
    assert bf == lsh72


def test_simhash_is_subset_of_bruteforce(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bf = {
        (r["a_id"], r["b_id"])
        for r in dedup.jaccard_duplicates(docs, n=5, threshold=0.8).collect()
    }
    sh = {
        (r["a_id"], r["b_id"])
        for r in dedup.simhash_duplicates(docs, hamming_max=3, threshold=0.8).collect()
    }
    assert sh <= bf


def test_duplicate_clusters_fixpoint(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_duplicate_clusters_long_chain_converges(spark):
    # A diameter-11 chain forces many label-propagation rounds, each
    # reading the PREVIOUS round's lazily-materialized local checkpoint
    # (r11: the convergence count is the job that stores it) — a
    # regression here would mean a round consumed an unmaterialized or
    # stale checkpoint.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "a_id long, b_id long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {i: 100 for i in range(100, 112)}


def test_exact_duplicates_on_injected_copies(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.limit(7).select((F.col("doc_id") + 500000).alias("doc_id"), "text")
    dups = dedup.exact_duplicates(docs.unionByName(copies))
    got = {(r["dup_id"], r["keeper_id"]) for r in dups.collect()}
    assert {(d + 500000, d) for (d,) in docs.limit(7).select("doc_id").collect()} <= got


def test_cluster_representatives_keeps_best(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        # doc 2 best in cluster 1; tie in cluster 10 -> doc 10 by id
        [(1, 0.5), (2, 0.9), (3, 0.7), (10, 0.8), (11, 0.8)],
        "doc_id long, quality_score double",
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in dedup.cluster_representatives(clusters, scores).collect()
    }
    assert got == {1: False, 2: True, 3: False, 10: True, 11: False}


def test_minhash_incremental_finds_cross_set_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # "new batch" = exact copies of 6 corpus docs under fresh ids
    new = docs.limit(6).select((F.col("doc_id") + 900000).alias("doc_id"), "text")
    got = dedup.minhash_lsh_against(new, docs, n=5, k=96, bands=24, threshold=0.8)
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"] for r in got.collect()}
    for (d,) in docs.limit(6).select("doc_id").collect():
        assert pairs.get((d + 900000, d)) == 1.0, d
    # direction is new -> corpus only
    assert all(a >= 900000 and b < 900000 for a, b in pairs)


def test_lsh_bucket_cap_drops_template_family(spark):
    """max_bucket_size: a family of identical template docs must emit
    ZERO candidate pairs when capped (the M^2 blowup guard), while
    ordinary near-dup pairs outside the mega-bucket survive."""
    from change_data_capture_spark.extensions import dedup
    from pyspark.sql import functions as F

    template = "the same boilerplate navigation header appears on every page of this site "
    body = "a genuinely unique long document body with plenty of distinct shingle text number "
    rows = [(i, template * 4) for i in range(100, 130)]  # 30-doc template family
    rows += [(1, body * 6 + "tail one"), (2, body * 6 + "tail two")]  # true near-dup pair
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.minhash_lsh_duplicates(
        docs, n=5, k=32, bands=8, threshold=0.8, max_bucket_size=10
    )
    pairs = {(r.a_id, r.b_id) for r in capped.collect()}
    assert (1, 2) in pairs, "near-dup outside the mega-bucket must survive the cap"
    assert not any(a >= 100 for a, _ in pairs), "capped template family must emit no pairs"

    # uncapped: the template family floods the candidate set
    full = dedup.minhash_lsh_duplicates(docs, n=5, k=32, bands=8, threshold=0.8)
    full_pairs = {(r.a_id, r.b_id) for r in full.collect()}
    assert sum(1 for a, _ in full_pairs if a >= 100) == 30 * 29 // 2
    assert (1, 2) in full_pairs


def test_cluster_weighted_sample_semantics(spark):
    """Uniques always kept; cluster members kept with P=1/size via the
    deterministic integer rule (verified against a direct Python
    recomputation of the same md5 decision)."""
    import hashlib

    from change_data_capture_spark.extensions import dedup

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 11)], "doc_id long, text string"
    )
    # one 4-cluster {1,2,3,4} and one 2-cluster {7,8}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "a_id long, b_id long"
    )
    out = {r.doc_id: r for r in dedup.cluster_weighted_sample(docs, pairs).collect()}
    assert len(out) == 10
    for d in (5, 6, 9, 10):
        assert out[d].cluster_size == 1 and out[d].keep is True
        assert out[d].cluster_id == d
    for d in (1, 2, 3, 4):
        assert out[d].cluster_size == 4 and out[d].cluster_id == 1
    for d in (7, 8):
        assert out[d].cluster_size == 2 and out[d].cluster_id == 7
    for d, r in out.items():
        u32 = int(hashlib.md5(f"cws:{d}".encode()).hexdigest()[:8], 16)
        assert r.keep == (u32 * r.cluster_size < 2**32), d


def test_signature_index_roundtrip_matches_direct_incremental(spark, sf_dir, tmp_path):
    """Signing the corpus once into a managed table and deduping a new
    batch against the INDEX yields exactly the pairs the direct
    (re-sign-everything) operator finds — the table round-trip loses
    no signature bits, and a wrong-k index fails fast."""
    import pytest
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.limit(6).select((F.col("doc_id") + 900000).alias("doc_id"), "text")
    cat = TableCatalog(str(tmp_path / "sigcat"))
    apply_changelog(spark, snapshot_changelog(docs, "ml.docs", ["doc_id"]), cat)
    apply_changelog(spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=96), cat)

    via_index = dedup.minhash_lsh_against_index(
        new, cat.read(spark, "ml.sigs"), cat.read(spark, "ml.docs"),
        n=5, k=96, bands=24, threshold=0.8,
    )
    direct = dedup.minhash_lsh_against(new, docs, n=5, k=96, bands=24, threshold=0.8)
    assert sorted(map(tuple, via_index.collect())) == sorted(map(tuple, direct.collect()))

    with pytest.raises(ValueError, match="different k"):
        dedup.minhash_lsh_against_index(
            new, cat.read(spark, "ml.sigs"), cat.read(spark, "ml.docs"), k=128
        )


def test_minhash_index_enforces_disjoint_ids_on_docs_side(spark, sf_dir, tmp_path):
    """A corpus doc re-ingested under its OLD id must not union two
    texts' shingle sets in the verify: the corpus twin is dropped on
    BOTH the signature and the text side (same contract as the direct
    operator)."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cat = TableCatalog(str(tmp_path / "sig2"))
    apply_changelog(spark, snapshot_changelog(docs, "ml.docs", ["doc_id"]), cat)
    apply_changelog(spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=96), cat)
    # new batch REUSES existing corpus ids (a revision re-ingest)
    new = docs.limit(6)
    out = dedup.minhash_lsh_against_index(
        new, cat.read(spark, "ml.sigs"), cat.read(spark, "ml.docs"),
        n=5, k=96, bands=24, threshold=0.8,
    )
    # overlapping ids dropped from the corpus side -> a self-pair
    # (a_id == b_id) can never appear
    assert out.filter(F.col("a_id") == F.col("b_id")).count() == 0


def test_signature_index_two_day_ingest_loop(spark, sf_dir, tmp_path):
    """The full production loop: day-1 batch dedupes against the index,
    its survivors' signatures APPEND (same CDC apply, version 2), and
    day 2 collides with both the original corpus and day 1 — the index
    grows incrementally, never re-signing the corpus."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cat = TableCatalog(str(tmp_path / "loop"))
    apply_changelog(spark, snapshot_changelog(docs, "ml.docs", ["doc_id"]), cat)
    apply_changelog(spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=96), cat)

    day1 = docs.limit(3).select((F.col("doc_id") + 900000).alias("doc_id"), "text")
    p1 = dedup.minhash_lsh_against_index(
        day1, cat.read(spark, "ml.sigs"), cat.read(spark, "ml.docs"),
        n=5, k=96, bands=24, threshold=0.8,
    )
    assert p1.count() >= 3  # exact copies collide with their originals
    # append day 1 to BOTH managed tables (it would be kept-or-dropped
    # by policy; here keep all to exercise the growth path)
    apply_changelog(
        spark, snapshot_changelog(day1, "ml.docs", ["doc_id"], insert_version=2), cat
    )
    apply_changelog(
        spark,
        dedup.signature_changelog(day1, "ml.sigs", n=5, k=96, version=2),
        cat,
    )
    assert cat.read(spark, "ml.sigs").count() == docs.count() + 3

    # day 2 copies a DAY-1 doc: the collision must come from the
    # incrementally-appended index rows
    day2 = day1.limit(1).select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    p2 = dedup.minhash_lsh_against_index(
        day2, cat.read(spark, "ml.sigs"), cat.read(spark, "ml.docs"),
        n=5, k=96, bands=24, threshold=0.8,
    )
    b_ids = {r.b_id for r in p2.collect()}
    assert any(b >= 900000 for b in b_ids)  # matched the day-1 doc via the index


def test_cluster_size_report_partitions_corpus(spark):
    from change_data_capture_spark.extensions import dedup

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    # components: {0,1,2} (chain), {5,6} (pair); 3,4,7,8,9 singletons
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.9), (5, 6, 0.85)],
        "a_id long, b_id long, jaccard double",
    )
    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["n_removable"])
        for r in dedup.cluster_size_report(
            docs, dedup.duplicate_clusters(pairs)
        ).collect()
    }
    assert out == {1: (5, 5, 0), 2: (1, 2, 1), 3: (1, 3, 2)}
    assert sum(d for _, d, _ in out.values()) == 10  # partitions the corpus


def test_jaccard_score_histogram_integer_banding(spark):
    from change_data_capture_spark.extensions import dedup

    # d1/d2 near-identical (high band); d3/d4 moderately similar
    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"), (2, "abcdefghix"),
            (3, "aaaaabbbbb"), (4, "aaaaabbxyz"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.0), (3, 4, 0.0)], "a_id long, b_id long, jaccard double"
    )
    out = {r["bucket"]: r for r in
           dedup.jaccard_score_histogram(docs, pairs, n=5).collect()}

    # recompute expected bands in python over distinct 5-gram sets
    def grams(t):
        return {t[i:i + 5] for i in range(len(t) - 4)}

    def band(a, b):
        k = len(grams(a) & grams(b))
        return (20 * k) // (len(grams(a)) + len(grams(b)) - k)

    b12 = band("abcdefghij", "abcdefghix")
    b34 = band("aaaaabbbbb", "aaaaabbxyz")
    assert set(out) == {b12, b34}
    for b, r in out.items():
        assert r["n_pairs"] == 1 and r["bucket_lo"] == b / 20


def test_jaccard_prefix_unicode_char_parity(spark):
    """Review regression: the prefix-join adapter shingles CHARACTERS
    (like jaccard_duplicates and the oracle), not UTF-8 bytes — on
    non-ASCII text the two definitions diverge, so assert against a
    char-level brute force on multibyte content."""
    import itertools

    base = "café résumé naïve œuvre déjà-vu " * 6
    docs = spark.createDataFrame(
        [(1, base), (2, base + "ÉDITÉ!"), (3, base[: len(base) // 3])],
        "doc_id long, text string",
    )
    got = {
        (r.a_id, r.b_id): (r.inter_shingles, r.union_shingles)
        for r in dedup.jaccard_duplicates_prefix(
            docs, n=5, threshold_num=1, threshold_den=5
        ).collect()
    }
    texts = {1: base, 2: base + "ÉDITÉ!", 3: base[: len(base) // 3]}

    def char_shingles(t):
        top = max(len(t) - 4, 1)
        return {t[i : i + 5] for i in range(top)}

    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = char_shingles(texts[a]), char_shingles(texts[b])
        i, u = len(sa & sb), len(sa | sb)
        if 5 * i >= 1 * u:
            want[(a, b)] = (i, u)
    assert got == want and (1, 2) in got


def test_narrowed_config_adversarial_boilerplate_envelope(spark):
    """Regression fence for the r5 MinHash narrowing (VERDICT r6
    directive #7), at the registry's EXACT production config
    (k=72, bands=24, rows=3): a worst-case corpus of 150 mid-Jaccard
    boilerplate docs (shared 300-char template + unique tails,
    pairwise J ~ 0.55 — below the 0.8 threshold but dominating the
    per-band minima, so they flood LSH buckets) plus 10 true near-dup
    pairs outside the family. With max_bucket_size on:

    - recall envelope: output EQUALS brute force in both directions
      (all 10 true pairs found, zero boilerplate false positives);
    - candidate envelope: the capped >= 2-band candidate set stays
      within a fixed budget while the uncapped set shows the blowup
      the cap exists to absorb — the fence any FUTURE narrowing must
      still clear.
    """
    from change_data_capture_spark.extensions import dedup
    from change_data_capture_spark.extensions.dedup import (
        _band_buckets, _cap_buckets, minhash_signatures, shingles,
    )

    import hashlib

    K, BANDS, CAP = 72, 24, 32
    template = " ".join(f"boiler{j}" for j in range(40))  # ~300 chars shared
    fam = [
        (
            i,
            f"{template} "
            + " ".join(
                hashlib.md5(f"fam{i}-{j}".encode()).hexdigest()[:10]
                for j in range(12)
            ),
        )
        for i in range(1000, 1150)
    ]
    truth = set()
    uniq = []
    for i in range(10):
        # md5-derived words: deterministic, with no cross-document
        # shingle overlap (plain f"doc{i}token{j}" words share most of
        # their 5-grams ACROSS i and made unrelated docs near-dups)
        body = " ".join(
            hashlib.md5(f"{i}-{j}".encode()).hexdigest()[:10] for j in range(25)
        )
        uniq.append((i * 2, body + " alpha"))
        uniq.append((i * 2 + 1, body + " omega"))
        truth.add((i * 2, i * 2 + 1))
    docs = spark.createDataFrame(fam + uniq, "doc_id long, text string")

    brute = {(r.a_id, r.b_id) for r in dedup.jaccard_duplicates(docs, n=5, threshold=0.8).collect()}
    assert brute == truth, "fixture self-check: only the cloned pairs are true pairs"

    got = {
        (r.a_id, r.b_id)
        for r in dedup.minhash_lsh_duplicates(
            docs, n=5, k=K, bands=BANDS, threshold=0.8, max_bucket_size=CAP
        ).collect()
    }
    assert got == brute, f"recall/precision envelope broken: {got ^ brute}"

    # candidate-count envelope via the same internals the operator uses
    sig = minhash_signatures(
        shingles(docs, n=5, distinct=False), k=K
    ).persist()
    sig.count()
    try:
        def n_candidates(cap):
            b = _cap_buckets(_band_buckets(sig, bands=BANDS, rows=K // BANDS,
                                           id_col="doc_id"), cap)
            a_side = b.select(F.col("doc_id").alias("a_id"), "band", "bh")
            b_side = b.select(F.col("doc_id").alias("b_id"), "band", "bh")
            return (
                a_side.join(b_side, ["band", "bh"])
                .filter(F.col("a_id") < F.col("b_id"))
                .groupBy("a_id", "b_id")
                .agg(F.count("*").alias("nb"))
                .filter(F.col("nb") >= 2)
                .count()
            )

        capped, uncapped = n_candidates(CAP), n_candidates(None)
        # documented envelope: with the cap, candidate count is O(family
        # size) — sub-cap boilerplate collisions the signature screen
        # absorbs (measured 151 for a 150-doc family at this config) —
        # NOT O(family^2); without the cap the mid-J family floods the
        # candidate set quadratically. A future narrowing that pushes
        # more mid-J mass through the bands must still clear this fence.
        n_family = 150
        assert capped <= 2 * n_family + 10 * len(truth), (
            f"capped candidates blew the O(family) envelope: {capped}"
        )
        assert uncapped > 10 * capped, (
            f"fixture lost its adversarial bite: uncapped={uncapped} capped={capped}"
        )
    finally:
        sig.unpersist()


def test_minhash_survives_null_text_docs(spark, sf_dir):
    """r6 review (confirmed by execution pre-fix): two NULL-text docs
    got identical constant signatures, collided in every band, and the
    exact verify divided 0/0 under ANSI. Content-less docs are now
    excluded from similarity entirely — matching the brute-force
    baseline, which never pairs them (NULL join keys)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(30)
    with_nulls = docs.unionByName(
        spark.createDataFrame([(900001, None), (900002, None)], "doc_id long, text string")
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in dedup.minhash_lsh_duplicates(
            with_nulls, n=5, k=72, bands=24, threshold=0.8
        ).collect()
    }
    assert not any(a >= 900000 or b >= 900000 for a, b in got)


def test_score_histogram_handles_reversed_pair_orientation(spark):
    """r6 review (confirmed by execution pre-fix): (a_id > b_id) pairs
    from the incremental new-vs-corpus paths vanished from the
    threshold-tuning histogram."""
    docs = spark.createDataFrame(
        [(2, "shared near duplicate content body"), (9, "shared near duplicate content bodX")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(9, 2)], "a_id long, b_id long")  # reversed
    out = dedup.jaccard_score_histogram(docs, pairs, n=5).collect()
    assert len(out) == 1 and out[0]["n_pairs"] == 1


def test_score_histogram_from_counts_matches_recompute(spark):
    """r11 optimization pin: the one-pipeline histogram over the verify
    stage's (inter_k, n_a, n_b) integers must band IDENTICALLY to the
    recompute form (second shingle + inverted-index pass) it replaced
    in dedup_score_histogram — same integer arithmetic, same rows."""
    from change_data_capture_spark.extensions import dedup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dof"),
            (3, "pack my box with five dozen liquor jugs now"),
            (4, "pack my box with five dozen liquor jugs nov"),
            (5, "sphinx of black quartz judge my vow today ok"),
            (6, "completely unrelated text with no dup at all"),
        ],
        "doc_id long, text string",
    )
    plain = dedup.minhash_lsh_duplicates(docs, n=5, k=32, bands=8, threshold=0.5)
    # default output contract unchanged: exactly the three public columns
    assert plain.columns == ["a_id", "b_id", "jaccard"]

    counted = dedup.minhash_lsh_duplicates(
        docs, n=5, k=32, bands=8, threshold=0.5, _with_counts=True
    )
    assert counted.columns == ["a_id", "b_id", "jaccard", "inter_k", "n_a", "n_b"]
    # same verified pairs, same scores
    assert sorted((r["a_id"], r["b_id"], r["jaccard"]) for r in counted.collect()) == sorted(
        (r["a_id"], r["b_id"], r["jaccard"]) for r in plain.collect()
    )

    fast = {
        (r["bucket"], r["bucket_lo"], r["n_pairs"])
        for r in dedup.jaccard_score_histogram_from_counts(counted).collect()
    }
    slow = {
        (r["bucket"], r["bucket_lo"], r["n_pairs"])
        for r in dedup.jaccard_score_histogram(docs, plain, n=5).collect()
    }
    assert fast == slow and fast  # identical, and non-empty
