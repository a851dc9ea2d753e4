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
