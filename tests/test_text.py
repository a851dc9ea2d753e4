"""Text-quality operators: hand-computed expectations on tiny docs."""

from change_data_capture_spark.extensions import text


def test_repetition_scores_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # 6 tokens, 3 distinct; bigrams: "a b","b a","a b","b c","c c"
            # -> 5 bigrams, 4 distinct, top count 2
            ("d1", "a b a b c c"),
            # single token: no bigrams -> NULL ratios
            ("d2", "solo"),
            # fully distinct
            ("d3", "w x y z"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in text.repetition_scores(docs).collect()}

    d1 = out["d1"]
    assert (d1["n_tokens"], d1["n_distinct_tokens"]) == (6, 3)
    assert d1["dup_token_frac"] == round((6 - 3) / 6, 6)
    assert d1["n_bigrams"] == 5
    assert d1["dup_bigram_frac"] == round((5 - 4) / 5, 6)
    assert d1["top_bigram_frac"] == round(2 / 5, 6)

    d2 = out["d2"]
    assert (d2["n_tokens"], d2["n_bigrams"]) == (1, 0)
    assert d2["dup_bigram_frac"] is None and d2["top_bigram_frac"] is None

    d3 = out["d3"]
    assert d3["dup_token_frac"] == 0.0
    assert d3["n_bigrams"] == 3 and d3["dup_bigram_frac"] == 0.0


def test_chunk_dedup_flags_shared_chunks(spark):
    # chunk size 3; "x y z" appears in d1 and d2 -> boilerplate
    docs = spark.createDataFrame(
        [
            ("d1", "x y z a b c"),
            ("d2", "x y z q r"),
            ("d3", "u v w"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in text.chunk_dedup(docs, chunk_tokens=3).collect()}
    assert (out["d1"]["n_chunks"], out["d1"]["n_dup_chunks"]) == (2, 1)
    assert out["d1"]["cleaned_text"] == "a b c"
    assert (out["d2"]["n_chunks"], out["d2"]["n_dup_chunks"]) == (2, 1)
    assert out["d2"]["cleaned_text"] == "q r"
    assert (out["d3"]["n_chunks"], out["d3"]["n_dup_chunks"]) == (1, 0)
    assert out["d3"]["cleaned_text"] == "u v w"


def test_chunk_dedup_all_duplicate_doc_null_text(spark):
    docs = spark.createDataFrame(
        [("d1", "a b c"), ("d2", "a b c")], "doc_id string, text string"
    )
    out = {r["doc_id"]: r for r in text.chunk_dedup(docs, chunk_tokens=3).collect()}
    assert out["d1"]["dup_chunk_frac"] == 1.0
    assert out["d1"]["cleaned_text"] is None


def test_pii_scan_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "mail me at jo.doe+x@corp.example.org thanks"),
            ("d2", "server 192.168.0.1 and 10.0.0.255 up"),
            ("d3", "call 555-123-4567 or 555.987.6543"),
            ("d4", "ssn-ish 123456789 acct 98765432101234"),
            ("d5", "clean text no identifiers here"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in text.pii_scan(docs).collect()}
    assert out["d1"]["n_emails"] == 1 and out["d1"]["n_pii_total"] == 1
    assert out["d1"]["redacted_text"] == "mail me at [EMAIL] thanks"
    assert out["d2"]["n_ipv4s"] == 2
    assert out["d2"]["redacted_text"] == "server [IP] and [IP] up"
    assert out["d3"]["n_phones"] == 2
    assert out["d3"]["redacted_text"] == "call [PHONE] or [PHONE]"
    assert out["d4"]["n_id_numbers"] == 2
    assert out["d4"]["redacted_text"] == "ssn-ish [ID] acct [ID]"
    assert out["d5"]["n_pii_total"] == 0
    assert out["d5"]["redacted_text"] == "clean text no identifiers here"


def test_lm_fluency_hand_computed(spark):
    # corpus bigrams: d1 "a b","b a","a b"; d2 "a b","b c"
    # C(a,b)=3 C(b,a)=1 C(b,c)=1; contexts C(a)=3 C(b)=2
    docs = spark.createDataFrame(
        [("d1", "a b a b"), ("d2", "a b c"), ("d3", "solo")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in text.lm_fluency(docs).collect()}
    d1 = out["d1"]
    # instances: (a,b) m=2 -> c2=3, (b,a) m=1 -> c2=1; ctx: a->3 (x2), b->2
    assert d1["n_bigrams"] == 3
    assert d1["pair_support_sum"] == 2 * 3 + 1 * 1
    assert d1["ctx_support_sum"] == 2 * 3 + 1 * 2
    assert d1["fluency"] == round(7 / 8, 6)
    d2 = out["d2"]
    # instances: (a,b) m=1 -> c2=3, (b,c) m=1 -> c2=1; ctx: a->3, b->2
    assert d2["n_bigrams"] == 2
    assert d2["pair_support_sum"] == 3 + 1
    assert d2["ctx_support_sum"] == 3 + 2
    assert d2["fluency"] == round(4 / 5, 6)
    d3 = out["d3"]
    assert d3["n_bigrams"] == 0 and d3["fluency"] is None


def test_perplexity_buckets_tertiles(spark):
    import math

    # 6 scorable docs spanning a range of bigram support + 1 unscorable.
    docs = spark.createDataFrame(
        [
            ("d1", "a b a b a b"),        # repeats the dominant bigram
            ("d2", "a b c d"),
            ("d3", "c d e f"),
            ("d4", "e f a b"),
            ("d5", "q r s t u"),          # unique transitions
            ("d6", "a b e f c d"),
            ("d7", "solo"),               # no bigrams -> unscored
        ],
        "doc_id string, text string",
    )
    flu = {
        r["doc_id"]: r["fluency"]
        for r in text.lm_fluency(docs).collect()
        if r["n_bigrams"] > 0
    }
    vals = sorted(flu.values())
    n = len(vals)
    t1 = vals[math.floor((1.0 / 3.0) * (n - 1))]
    t2 = vals[math.floor((2.0 / 3.0) * (n - 1))]
    expected = {
        d: ("tail" if v <= t1 else "middle" if v <= t2 else "head")
        for d, v in flu.items()
    }
    expected["d7"] = "unscored"
    out = {r["doc_id"]: r["ppl_bucket"] for r in text.perplexity_buckets(docs).collect()}
    assert out == expected
    # the cuts partition the scored docs into non-empty thirds
    from collections import Counter

    c = Counter(out.values())
    assert c["tail"] >= 1 and c["middle"] >= 1 and c["head"] >= 1


def test_span_dedup_hand_computed(spark):
    # doc 1 and 2 share one exact 8-token span; doc 3 shares nothing.
    shared = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"x1 {shared} y1"),          # 10 tokens -> 3 spans, 1 dup
            (2, f"x2 x3 {shared}"),          # 10 tokens -> 3 spans, 1 dup
            (3, "p q r s t u v w z9 z8"),    # 10 tokens -> 3 spans, 0 dup
            (4, "tiny doc"),                 # < 8 tokens -> 1 whole-doc span
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.span_dedup_signals(docs, w=8).collect()}
    assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (3, 1)
    assert (out[2]["n_spans"], out[2]["n_dup_spans"]) == (3, 1)
    assert (out[3]["n_spans"], out[3]["n_dup_spans"]) == (3, 0)
    assert (out[4]["n_spans"], out[4]["n_dup_spans"]) == (1, 0)
    assert abs(out[1]["dup_span_frac"] - 1 / 3) < 1e-6


def test_language_id_keeps_null_and_empty_text_docs(spark):
    docs = spark.createDataFrame(
        [(1, "the and of to in"), (2, None), (3, "")],
        "doc_id bigint, text string",
    )
    from change_data_capture_spark.extensions import text as t

    got = {r["doc_id"]: (r["detected_lang"], r["stopword_hits"]) for r in t.language_id(docs).collect()}
    assert got == {1: ("en", 5), 2: ("unknown", 0), 3: ("unknown", 0)}


def test_inverted_index_df_cf_and_postings_cap(spark):
    docs = spark.createDataFrame(
        [(3, "b a a"), (1, "a x"), (2, "a  a b")],
        "doc_id long, text string",
    )
    rows = {
        r.token: r
        for r in text.inverted_index(docs, max_postings=2).collect()
    }
    assert set(rows) == {"a", "b", "x"}
    a = rows["a"]
    # df counts docs, cf counts occurrences, postings ascending
    assert (a.df, a.cf, a.postings_head) == (3, 5, "1,2")  # capped at 2
    assert (rows["b"].df, rows["b"].cf, rows["b"].postings_head) == (2, 2, "2,3")
    assert (rows["x"].df, rows["x"].cf, rows["x"].postings_head) == (1, 1, "1")


def test_bpe_merge_candidates_hand_computed(spark):
    # vocab: "aab" x2 docs, "ab" x1 -> freqs: aab:2, ab:1
    # pairs: (a,a): 2, (a,b): 2 + 1 = 3 -> top pair (a,b)
    docs = spark.createDataFrame(
        [(1, "aab ab"), (2, "aab")], "doc_id long, text string"
    )
    rows = text.bpe_merge_candidates(docs, top_n=5).collect()
    got = [(r.left_sym, r.right_sym, r.pair_freq, r.merge_rank) for r in rows]
    assert got == [("a", "b", 3, 1), ("a", "a", 2, 2)]


def test_kn_continuation_counts_hand_computed(spark):
    # bigram types: (the,cat), (the,dog), (cat,sat), (dog,sat)
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "the cat sat")],
        "doc_id long, text string",
    )
    rows = {r.token: r for r in text.kn_continuation_counts(docs).collect()}
    # 'sat' follows 2 distinct words; 'the' precedes 2 distinct words
    assert (rows["sat"].cont_left, rows["sat"].cont_right) == (2, 0)
    assert (rows["the"].cont_left, rows["the"].cont_right) == (0, 2)
    assert (rows["cat"].cont_left, rows["cat"].cont_right) == (1, 1)


def _bpe_reference(word_freqs, iters):
    """Pure-Python greedy BPE (Sennrich): the semantics bpe_train must
    reproduce, including consecutive-pair fenceposts like a,b,a,b."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for it in range(1, iters + 1):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((it, a, b, freq))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_greedy_reference(spark):
    # 'abab' forces the consecutive-pair fencepost: merging (a,b) must
    # yield [ab, ab], which a single string replace gets wrong.
    rows = [("d1", "abab abab low"), ("d2", "abab banana low low"), ("d3", "banana aba")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    word_freqs = {}
    for _, t in rows:
        for w in t.split():
            word_freqs[w] = word_freqs.get(w, 0) + 1
    want = _bpe_reference(word_freqs, iters=4)
    got = [
        (r["iteration"], r["left_sym"], r["right_sym"], r["pair_freq"])
        for r in text.bpe_train(docs, iters=4).orderBy("iteration").collect()
    ]
    assert got == want, f"{got} != {want}"


def test_bpe_train_runs_of_same_symbol(spark):
    # 'aaaa' with merge (a,a): greedy gives [aa, aa]; [aaa] would mean
    # overlapping merges, [aa, a, a] a missed second pass.
    docs = spark.createDataFrame(
        [("d1", "aaaa aaaa aa"), ("d2", "aaa ab")], "doc_id string, text string"
    )
    word_freqs = {"aaaa": 2, "aa": 1, "aaa": 1, "ab": 1}
    want = _bpe_reference(word_freqs, iters=3)
    got = [
        (r["iteration"], r["left_sym"], r["right_sym"], r["pair_freq"])
        for r in text.bpe_train(docs, iters=3).orderBy("iteration").collect()
    ]
    assert got == want, f"{got} != {want}"


def test_bpe_encode_counts_invariants(spark):
    docs = spark.createDataFrame(
        [("d1", "abab abab low"), ("d2", "abab banana low low")],
        "doc_id string, text string",
    )
    # zero merges: every token encodes to its character count
    zero = {r["doc_id"]: r for r in text.bpe_encode_counts(docs, iters=0).collect()}
    assert zero["d1"]["n_bpe_tokens"] == zero["d1"]["n_chars_compact"] == 11
    assert zero["d1"]["n_ws_tokens"] == 3
    # after merges: strictly fewer symbols, never below one per token
    four = {r["doc_id"]: r for r in text.bpe_encode_counts(docs, iters=4).collect()}
    for d in ("d1", "d2"):
        assert four[d]["n_bpe_tokens"] < zero[d]["n_bpe_tokens"]
        assert four[d]["n_bpe_tokens"] >= four[d]["n_ws_tokens"]
        assert four[d]["n_ws_tokens"] == zero[d]["n_ws_tokens"]


def test_bpe_train_property_random_corpora(spark):
    """Property check of the double-replace merge trick against the
    pure-Python greedy reference over adversarial mini-corpora: words
    drawn from a 2-letter alphabet maximize consecutive-pair and
    same-symbol-run fenceposts (abab, aaaa, aabb...)."""
    import random

    rng = random.Random(417)
    alphabet = "ab"
    for case in range(6):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 10))
        ]
        # distribute words over a few docs
        docs_rows = []
        for d in range(3):
            body = " ".join(rng.choice(words) for _ in range(rng.randint(2, 8)))
            docs_rows.append((f"d{d}", body))
        word_freqs = {}
        for _, t in docs_rows:
            for w in t.split():
                word_freqs[w] = word_freqs.get(w, 0) + 1
        docs = spark.createDataFrame(docs_rows, "doc_id string, text string")
        want = _bpe_reference(word_freqs, iters=3)
        got = [
            (r["iteration"], r["left_sym"], r["right_sym"], r["pair_freq"])
            for r in text.bpe_train(docs, iters=3).orderBy("iteration").collect()
        ]
        assert got == want, f"case {case}: {docs_rows}\n{got} != {want}"


def test_bpe_train_exhausted_vocab_and_zero_iters(spark):
    """A corpus of single-char words has nothing to merge: training
    must stop with an empty merge table (never wipe the vocabulary),
    and encoding must still count every token. iters=0 returns the
    empty table, not an error."""
    docs = spark.createDataFrame(
        [("d1", "a b a b"), ("d2", "b a")], "doc_id string, text string"
    )
    assert text.bpe_train(docs, iters=2).count() == 0
    assert text.bpe_train(docs, iters=0).count() == 0
    enc = {r["doc_id"]: r for r in text.bpe_encode_counts(docs, iters=2).collect()}
    assert enc["d1"]["n_ws_tokens"] == 4 and enc["d1"]["n_bpe_tokens"] == 4
    assert enc["d2"]["n_ws_tokens"] == 2 and enc["d2"]["n_bpe_tokens"] == 2

    # partially exhausted: one merge possible, iters asks for 3
    docs2 = spark.createDataFrame([("d1", "ab ab c")], "doc_id string, text string")
    merges = text.bpe_train(docs2, iters=3).collect()
    assert [(r["left_sym"], r["right_sym"]) for r in merges] == [("a", "b")]


def test_sliding_chunks_hand_computed(spark):
    from change_data_capture_spark.extensions.text import sliding_chunks

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "short doc")],
        "doc_id long, text string",
    )
    out = sliding_chunks(docs, size=4, stride=3)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: 10 tokens, size 4 stride 3 -> chunks at 0,3,6,9 -> 1+ceil(6/3)=3? no:
    # 1 + ceil((10-4)/3) = 1 + 2 = 3 chunks at offsets 0,3,6
    assert sorted(k[1] for k in rows if k[0] == 1) == [0, 1, 2]
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"
    assert rows[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
    assert rows[(1, 2)]["n_chunk_tokens"] == 4
    # short doc: one partial window
    assert rows[(2, 0)]["chunk_text"] == "short doc"
    assert rows[(2, 0)]["n_chunk_tokens"] == 2
    # overlap: last token of each window is the next window's first
    import pytest

    with pytest.raises(ValueError):
        sliding_chunks(docs, size=4, stride=5)


def test_hashed_ngram_score_with_explicit_weights(spark):
    from change_data_capture_spark.extensions.text import hashed_ngram_score
    import hashlib

    # doc 1: bigrams "a b", "b a", "a b"; doc 2 single token -> no bigrams
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "solo")], "doc_id long, text string"
    )

    def bucket(bigram, n=4096):
        return int(hashlib.md5(f"hb:{bigram}".encode()).hexdigest()[:8], 16) % n

    b_ab, b_ba = bucket("a b"), bucket("b a")
    weights = spark.createDataFrame(
        [(b_ab, 10), (b_ba, -3)], "bucket long, weight long"
    )
    out = {r.doc_id: r for r in hashed_ngram_score(docs, weights).collect()}
    assert out[1].score == 2 * 10 + 1 * (-3) and out[1].n_bigrams == 3
    assert out[1].keep is True
    assert out[2].score == 0 and out[2].n_bigrams == 0 and out[2].keep is False


def test_hashed_ngram_score_derived_weights_match_python_md5(spark):
    from change_data_capture_spark.extensions.text import hashed_ngram_score
    import hashlib

    docs = spark.createDataFrame([(7, "x y")], "doc_id long, text string")
    b = int(hashlib.md5(b"hb:x y").hexdigest()[:8], 16) % 4096
    w = (int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16) % 2001) - 1000
    r = hashed_ngram_score(docs).collect()[0]
    assert r.score == w and r.n_bigrams == 1 and r.keep == (w > 0)


def test_regex_token_stats_hand_computed(spark):
    from change_data_capture_spark.extensions.text import regex_token_stats

    # "ab 12.5, x!" -> tokens: ab | 12 | . | 5 | , | x | !  = 7
    # words: ab, x = 2; numbers: 12, 5 = 2; punct: . , ! = 3
    # compact chars = len("ab12.5,x!") = 9 -> 9/7
    docs = spark.createDataFrame([(1, "ab 12.5, x!")], "doc_id long, text string")
    r = regex_token_stats(docs).collect()[0]
    assert r.n_regex_tokens == 7
    assert r.n_word_tokens == 2 and r.n_number_tokens == 2 and r.n_punct_tokens == 3
    assert r.chars_per_token == round(9 / 7, 6)


def test_bm25_topk_ranks_by_saturated_tf_idf(spark):
    """Hand-checkable BM25: rarer terms outweigh common ones, tf
    saturates, longer docs are penalized, non-matching docs absent."""
    from change_data_capture_spark.extensions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana"),       # high tf common term
            (2, "apple cherry"),                    # rare term, short doc
            (3, "apple banana banana banana"),
            (4, "plum plum plum plum"),             # no query terms
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["apple", "CHERRY"], k=10).collect()
    assert [r.doc_id for r in out if r.rank == 1] == [2]  # cherry df=1 dominates
    ids = {r.doc_id for r in out}
    assert 4 not in ids and ids == {1, 2, 3}
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].n_terms_matched == 2
    # tf saturation: doc 1 (tf=3) scores above doc 3 (tf=1, longer... same len)
    assert by_id[1].score > by_id[3].score
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]


def test_vocab_coverage_monotone_and_exact(spark):
    from change_data_capture_spark.extensions.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )  # freqs: a=4 b=3 c=1 d=1 (ties c<d), total 9
    rows = sorted(vocab_coverage(docs, max_rank=3).collect(), key=lambda r: r.rank)
    assert [(r.token, r.freq, r.cum_freq) for r in rows] == [
        ("a", 4, 4), ("b", 3, 7), ("c", 1, 8),
    ]
    assert rows[-1].coverage == round(8 / 9, 6)
    assert all(rows[i].cum_freq < rows[i + 1].cum_freq for i in range(2))


def test_compression_ratio_orders_redundancy(spark):
    """Ordering properties, not byte counts (zlib-build-dependent):
    repetitive text compresses best, natural-ish prose in the middle,
    high-entropy text worst; empty and null texts get ratio 1.0."""
    import hashlib

    noise = " ".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(40)
    )
    docs = spark.createDataFrame(
        [
            (1, "spam ham " * 300),
            (2, "the quick brown fox jumps over the lazy dog and then "
                "discusses parquet row groups at considerable length " * 8),
            (3, noise),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    from change_data_capture_spark.extensions.text import compression_ratio

    r = {x.doc_id: x for x in compression_ratio(docs).collect()}
    assert r[1].compression_ratio < r[2].compression_ratio < r[3].compression_ratio
    assert r[4].compression_ratio == 1.0 and r[5].compression_ratio == 1.0
    assert r[4].utf8_len == 0 and r[5].compressed_len == 0
    assert r[1].utf8_len == len("spam ham " * 300)


def test_winnowing_hand_computed_selection_and_tie_rule(spark):
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    docs = spark.createDataFrame(
        [("d1", "aaaa"), ("d2", "abab"), ("d3", "abab")],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["n_fingerprints"], r["fp_digest"])
        for r in text.winnowing_fingerprints(docs, k=2, w=2).collect()
    }
    # d1: grams aa@1 aa@2 aa@3 all hash-equal; windows [1,2] and [2,3]
    # pick the RIGHTMOST min -> positions 2 and 3
    want_d1 = sorted([f"{h('aa')}:2", f"{h('aa')}:3"])
    assert out["d1"] == (2, hashlib.md5(",".join(want_d1).encode()).hexdigest())
    # d2: grams ab@1 ba@2 ab@3; per-window mins are deterministic by
    # hash order; recompute the reference selection in Python
    keys = {1: h("ab"), 2: h("ba"), 3: h("ab")}
    sel = set()
    for j in (1, 2):  # complete windows only
        i = min(range(j, j + 2), key=lambda p: (keys[p], -p))
        sel.add(f"{keys[i]}:{i}")
    want_d2 = sorted(sel)
    assert out["d2"] == (
        len(want_d2),
        hashlib.md5(",".join(want_d2).encode()).hexdigest(),
    )
    # identical docs -> identical fingerprint sets
    assert out["d2"] == out["d3"]


def test_text_ops_survive_empty_and_null_docs(spark):
    """r6 review (confirmed by execution pre-fix): empty-string docs
    crashed quality_scores with DIVIDE_BY_ZERO under ANSI, and
    NULL-text docs silently vanished from token_stats/quality/
    repetition outputs via the token-explode inner join."""
    from change_data_capture_spark.extensions import text as tx

    docs = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    for fn in (tx.token_stats, tx.quality_scores, tx.repetition_scores):
        out = fn(docs)
        assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == [1, 2, 3], fn.__name__
    q = {r["doc_id"]: r for r in tx.quality_scores(docs).collect()}
    assert q[2]["punct_ratio"] == 0.0 and q[3]["digit_ratio"] == 0.0


def test_pii_counts_agree_with_redaction_on_nested_matches(spark):
    """r6 review (confirmed by execution pre-fix): a 9-digit local
    part inside an email counted as BOTH an email and an id number —
    one PII item, n_pii_total=2, while the redaction emitted a single
    [EMAIL] token."""
    from change_data_capture_spark.extensions import text as tx

    docs = spark.createDataFrame(
        [(1, "contact 123456789@example.com"), (2, "acct 987654321 plain")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in tx.pii_scan(docs).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_id_numbers"] == 0
    assert got[1]["n_pii_total"] == 1
    assert "[EMAIL]" in got[1]["redacted_text"] and "[ID]" not in got[1]["redacted_text"]
    assert got[2]["n_id_numbers"] == 1 and got[2]["n_pii_total"] == 1


def test_compression_ratio_carries_string_ids(spark):
    from change_data_capture_spark.extensions import text as tx

    docs = spark.createDataFrame(
        [("doc-001", "aaa " * 50), ("doc-002", "xyzzy prose")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["compression_ratio"] for r in tx.compression_ratio(docs).collect()}
    assert set(got) == {"doc-001", "doc-002"}
    assert got["doc-001"] < got["doc-002"]  # repetition compresses better
