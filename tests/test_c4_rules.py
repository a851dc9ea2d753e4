"""C4 rule-filter tests: hand-built docs exercising each rule and the
multi-line retained-sentence count."""

from change_data_capture_spark.extensions.text import c4_rules


def test_c4_rules_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # kept: 3 lines, all retained, 4 sentences
            (1, "this line has five good words.\n"
                "another line with enough words here!\n"
                "is this a fine question? yes it is."),
            # lorem ipsum -> dropped even with sentences
            (2, "lorem ipsum dolor sit amet is here.\n"
                "another line with enough words here.\n"
                "a third line with enough words too."),
            # brace -> dropped
            (3, "function bodies look like this { now.\n"
                "another line with enough words here.\n"
                "a third line with enough words too."),
            # line rules: short line, no terminal punct, javascript
            (4, "too short.\n"
                "this line has no terminal punctuation at all\n"
                "please enable javascript to view this page.\n"
                "only this one line is actually retained. really. truly."),
            # only 2 sentences across retained lines -> dropped
            (5, "this line has five good words.\n"
                "another line with enough words here!"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_rules(docs).collect()}
    assert got[1]["kept"] and got[1]["n_kept_lines"] == 3
    assert got[1]["n_sentences"] == 4
    assert got[1]["n_words"] == 6 + 6 + 8
    assert got[5]["n_words"] == 12
    assert not got[2]["kept"] and got[2]["has_lorem_ipsum"]
    assert not got[3]["kept"] and got[3]["has_brace"]
    d4 = got[4]
    assert d4["n_lines"] == 4 and d4["n_kept_lines"] == 1
    assert d4["n_sentences"] == 3 and d4["kept"]
    assert not got[5]["kept"] and got[5]["n_sentences"] == 2


def test_c4_rules_plan_is_jvm_only(spark):
    docs = spark.createDataFrame([(1, "a b c d e.")], "doc_id long, text string")
    plan = c4_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_rules_hand_computed(spark):
    from change_data_capture_spark.extensions.text import gopher_rules

    good = " ".join(
        ["the quick brown foxes jumped over lazy dogs and cats today"] * 5
    )  # 55 words, alpha, stopwords 'the' 'and', mean len ~4.6
    short = "tiny doc with the and words"  # < 50 words
    symbols = " ".join(["woah#"] * 60)  # symbol ratio 1.0, no stopwords
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert got[1]["kept"] and got[1]["n_words"] == 55
    assert got[1]["n_stop_words"] == 2
    assert not got[2]["kept"] and got[2]["n_words"] == 6
    d3 = got[3]
    assert not d3["kept"] and d3["n_symbols"] == 60 and d3["n_stop_words"] == 0


def test_gopher_rules_bullet_and_ellipsis_lines(spark):
    from change_data_capture_spark.extensions.text import gopher_rules

    body = " ".join(["steady the words and more of them going on"] * 7)
    text = "- bullet line here\n" + "\n".join([body] * 2) + "\ntrailing thought..."
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = gopher_rules(docs).collect()
    assert r["n_lines"] == 4 and r["n_bullet_lines"] == 1
    assert r["n_ellipsis_lines"] == 1
    # 1/4 bullet lines > 10% -> dropped despite healthy words
    assert not r["kept"]
