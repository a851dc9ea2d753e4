"""Text analysis operators: language id, quality scoring, token stats,
document fingerprinting.

All pure Catalyst expressions (split/regexp/md5/windows) — each
operator is a narrow map or one hash-shuffle, so they stream over a
100 TB documents table without Python in the loop. Formulas are kept
ANSI-SQL-expressible on purpose: the DuckDB oracle replays them
exactly (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import spread

# Tiny embedded stopword lists (public, language-characteristic words).
# Deliberately small: language id here is the n-gram/stopword-ratio
# HEURISTIC a data pipeline applies at scale, not a trained model.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "mit", "für", "auf", "ein", "zu"),
    "es": ("el", "la", "de", "los", "las", "es", "en", "por", "que", "un"),
    "fr": ("le", "la", "les", "et", "est", "en", "pour", "que", "une", "dans"),
}


def tokens(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    # spread: token explode is a high-expansion stage; see dedup.spread.
    return spread(docs).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    )


def token_stats(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counts: whitespace tokens, distinct tokens, and a
    BPE-ish subword proxy (4-char chunks of the de-spaced text).
    NULL text coalesces to '' (the all-docs output contract
    language_id pins; r6 review: the token-explode inner join silently
    dropped NULL-text docs from the output)."""
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    compact_len = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    t = tokens(docs, id_col=id_col, text_col=text_col)
    distinct = t.groupBy(id_col).agg(F.countDistinct("token").alias("n_distinct_tokens"))
    base = docs.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        compact_len.cast("bigint").alias("n_chars_compact"),
        F.ceil(compact_len / 4).cast("bigint").alias("n_subword_est"),
    )
    return base.join(distinct, id_col)


def quality_scores(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score. Every ratio is
    double arithmetic over integer counts -> engine-reproducible.
    NULL text coalesces to '' (all-docs contract) and every character
    denominator is floored at 1 — an empty doc scores zero ratios
    instead of dying with DIVIDE_BY_ZERO under ANSI (r6 review,
    confirmed by execution; same guard as regex_token_stats)."""
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    compact = F.length(F.regexp_replace(text, r"\s", ""))
    mean_tok_len = compact.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    digit_ratio = n_digit.cast("double") / F.greatest(n_chars, F.lit(1))

    t = tokens(docs, id_col=id_col, text_col=text_col)
    sw = F.when(F.col("token").isin(*STOPWORDS["en"]), 1).otherwise(0)
    swr = t.groupBy(id_col).agg(
        (F.sum(sw).cast("double") / F.count("*")).alias("stopword_ratio")
    )
    base = docs.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
    )
    out = base.join(swr, id_col)
    score = (
        F.lit(1.0)
        - F.least(F.col("punct_ratio") * 2, F.lit(0.5))
        - F.least(F.col("digit_ratio") * 2, F.lit(0.3))
        + F.least(F.col("stopword_ratio"), F.lit(0.2))
    )
    return out.select(
        id_col,
        "n_tokens",
        "mean_token_len",
        "punct_ratio",
        "digit_ratio",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language id: the language whose stopword list hits
    the most tokens wins (ties: lexicographically smallest language;
    no hits at all: 'unknown').

    One shuffle total: the token explode feeds a single per-doc
    aggregation with one conditional sum per language (all codegen;
    the 40-word membership tests are IN-list predicates), and the
    winner falls out of a struct max — (hits, -lang_rank) compares
    field-by-field, so the highest hit count wins and ties go to the
    SMALLEST language rank. The previous shape (broadcast vocab join
    -> (doc, lang) agg -> ranking window -> join back to all docs)
    paid three shuffles and dropped no work the conditional sums
    don't also do."""
    langs = sorted(STOPWORDS)
    # NULL text must still yield an 'unknown' row (the all-docs output
    # contract): coalesce to '' so split/explode emits one empty token
    # for it instead of zero rows.
    safe = docs.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    t = tokens(safe, id_col=id_col, text_col=text_col)
    hits = t.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("token").isin(*STOPWORDS[lang]), 1).otherwise(0)
            ).alias(f"__h_{lang}")
            for lang in langs
        ]
    )
    best = F.greatest(
        *[
            F.struct(
                F.col(f"__h_{lang}").alias("hits"), F.lit(-i).alias("nrank")
            )
            for i, lang in enumerate(langs)
        ]
    )
    lang_names = F.array(*[F.lit(lang) for lang in langs])
    # with the coalesce above, every doc yields >= 1 token row (split
    # of '' is ['']), so the aggregate covers all docs — no join back
    return hits.select(
        id_col,
        F.when(
            best["hits"] > 0, F.element_at(lang_names, -best["nrank"] + 1)
        )
        .otherwise("unknown")
        .alias("detected_lang"),
        best["hits"].cast("bigint").alias("stopword_hits"),
    )


def fingerprints(
    docs: DataFrame, *, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic document fingerprint: min/max md5 over character
    n-gram shingles of the lowercased text (a winnowing-style content
    signature; equal fingerprints => near-certain duplicate prefix/body)."""
    text = F.lower(F.col(text_col))
    # explode + substr stays in whole-stage codegen (a transform()
    # array build would be interpreted per element — measured ~9x
    # slower at sf0.1).
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))))
    sh = spread(docs).select(F.col(id_col), text.alias("__t"), pos.alias("i")).select(
        F.col(id_col), F.md5(F.col("__t").substr(F.col("i"), F.lit(n))).alias("h")
    )
    return sh.groupBy(id_col).agg(
        F.min("h").alias("fp_min"), F.max("h").alias("fp_max"), F.count("*").alias("n_shingles")
    )


def winnowing_fingerprints(
    docs: DataFrame,
    *,
    k: int = 8,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints — the MOSS algorithm (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003, public): hash every character
    k-gram, slide a window of ``w`` consecutive hashes, and select each
    window's MINIMUM (rightmost on ties). The selected set carries the
    paper's guarantee: any substring match of length >= w + k - 1
    between two documents shares at least one selected fingerprint —
    the local, position-aware near-dup signature ``fingerprints``'s
    global min/max cannot give (expected density 2/(w+1), so the
    fingerprint is ~4x smaller than the full shingle set at w=8).

    Engine-portable by construction: hashes are md5 hex (identical in
    DuckDB), and the rightmost-min tie rule is encoded INTO the
    ordering key — ``md5(gram) || lpad(10^9 - pos)`` — so one plain
    ``min`` per window selects both the hash and its position with no
    struct-comparison semantics to disagree over. Per doc the output
    is the selected-set SIZE plus an order-canonical md5 digest of the
    whole set (sorted "fp:pos" pairs), which pins every selected
    fingerprint and position without emitting O(text) rows.

    Plan: one explode+substr shingle stage (whole-stage codegen, the
    ~9x-faster-than-transform rule), then ONE hash shuffle on the doc
    id shared by the sliding-window min, the window-count filter, and
    the final per-doc fold."""
    from pyspark.sql import Window as W

    text = F.lower(F.col(text_col))
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))))
    keyed = spread(docs).select(F.col(id_col), text.alias("__t"), pos.alias("i")).select(
        F.col(id_col),
        F.col("i"),
        F.concat(
            F.md5(F.col("__t").substr(F.col("i"), F.lit(k))),
            F.lpad((F.lit(1_000_000_000) - F.col("i")).cast("string"), 10, "0"),
        ).alias("key"),
    )
    win = W.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    per_doc = W.partitionBy(id_col)
    selected = (
        keyed.withColumn("__mk", F.min("key").over(win))
        .withColumn("__n", F.count(F.lit(1)).over(per_doc))
        # only complete windows select (the last w-1 positions belong
        # to earlier windows); shorter-than-w docs keep one window
        .filter(F.col("i") <= F.greatest(F.col("__n") - (w - 1), F.lit(1)))
        .select(
            F.col(id_col),
            F.concat_ws(
                ":",
                F.substring("__mk", 1, 32),
                (F.lit(1_000_000_000) - F.substring("__mk", 33, 10).cast("long")).cast(
                    "string"
                ),
            ).alias("fp"),
        )
        .distinct()
    )
    return selected.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list("fp")))).alias("fp_digest"),
    )


def _bigram_rows(docs: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Adjacent-token bigram relation ``(id, w1, w2)``: lowercase,
    whitespace-split, explode positions 1..n-1. The ONE shared
    tokenization for ``repetition_scores`` / ``lm_fluency`` /
    ``hashed_ngram_score`` — a tokenizer fix lands in all three at
    once. Zero-shuffle narrow map; explode+element_at stays in
    whole-stage codegen (a transform() array build would be
    interpreted per element — measured ~9x slower at sf0.1)."""
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        spread(docs)
        .select(F.col(id_col), arr.alias("__a"))
        .select(
            F.col(id_col),
            F.col("__a"),
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("__a") - 1, F.lit(1)))
            ).alias("i"),
        )
        .filter(F.col("i") <= F.size("__a") - 1)
        .select(
            F.col(id_col),
            F.element_at("__a", F.col("i")).alias("w1"),
            F.element_at("__a", F.col("i") + 1).alias("w2"),
        )
    )


def repetition_scores(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    public report): the fraction of duplicate tokens, the fraction of
    duplicate bigrams, and the share of the most-repeated bigram —
    high values flag boilerplate/template documents a pretraining
    pipeline filters out.

    Per doc: ``dup_token_frac = (n_tokens - n_distinct)/n_tokens``,
    ``dup_bigram_frac = (n_bigrams - n_distinct_bigrams)/n_bigrams``,
    ``top_bigram_frac = max_bigram_count/n_bigrams``. Docs with fewer
    than 2 tokens have no bigrams; their bigram ratios are NULL.

    Plan shape: bigrams come from explode(sequence) + element_at over
    the ONE split array — whole-stage codegen, no HOF transform, no
    per-token self-join — then two partial-aggregated hash shuffles
    (per-(doc,bigram), per-doc). Integer counts + one final division:
    engine-exact. NULL text coalesces to '' (all-docs contract;
    r6 review)."""
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    text = F.trim(F.lower(F.col(text_col)))
    arr = F.split(text, r"\s+")
    base = docs.select(F.col(id_col), F.size(arr).cast("bigint").alias("n_tokens"))
    dtok = (
        tokens(docs, id_col=id_col, text_col=text_col)
        .groupBy(id_col)
        .agg(F.countDistinct("token").alias("n_distinct_tokens"))
    )
    bg = _bigram_rows(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.concat_ws(" ", "w1", "w2").alias("bigram")
    )
    bstats = (
        bg.groupBy(id_col, "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.count("*").cast("bigint").alias("n_distinct_bigrams"),
            F.max("c").cast("bigint").alias("top_bigram_count"),
        )
    )
    out = base.join(dtok, id_col).join(bstats, id_col, "left")
    return out.select(
        id_col,
        "n_tokens",
        "n_distinct_tokens",
        F.round(
            (F.col("n_tokens") - F.col("n_distinct_tokens")).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("dup_token_frac"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.round(
            (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
            / F.col("n_bigrams"),
            6,
        ).alias("dup_bigram_frac"),
        F.round(
            F.col("top_bigram_count").cast("double") / F.col("n_bigrams"), 6
        ).alias("top_bigram_frac"),
    )


def chunk_dedup(
    docs: DataFrame,
    *,
    chunk_tokens: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sub-document (chunk-level) dedup — the "line-level dedup" of
    CCNet/RefinedWeb (public reports) adapted to newline-free text:
    documents are cut into disjoint ``chunk_tokens``-token chunks, a
    chunk occurring in >= ``min_docs`` DISTINCT documents is boiler-
    plate, and each doc reports its duplicated-chunk stats plus the
    text rebuilt from only its unique chunks.

    Output per doc: ``n_chunks``, ``n_dup_chunks``, ``dup_chunk_frac``
    (6dp), ``cleaned_text`` (NULL when every chunk was boilerplate).

    Plan shape: one explode to O(tokens/chunk_tokens) chunk rows
    (slice over the ONE split array — codegen, no HOF in the hot
    path), a map-side-combinable count-distinct by chunk (the global
    dedup shuffle), a semi-join-shaped flag join back on chunk, and a
    per-doc aggregation. The rebuild's sort+transform HOF runs on
    per-doc arrays of <= a few hundred chunks — bounded, not
    corpus-sized. All shuffles are on content hashes: no skew beyond
    genuine boilerplate chunks, which AQE splits."""
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_chunks_of = F.ceil(F.size("__a") / chunk_tokens).cast("int")
    chunks = (
        spread(docs)
        .select(F.col(id_col), arr.alias("__a"))
        .select(
            F.col(id_col),
            F.col("__a"),
            F.explode(F.sequence(F.lit(0), n_chunks_of - 1)).alias("ci"),
        )
        .select(
            F.col(id_col),
            F.col("ci"),
            F.array_join(
                F.slice("__a", F.col("ci") * chunk_tokens + 1, chunk_tokens), " "
            ).alias("chunk"),
        )
    )
    dup = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("chunk", F.lit(True).alias("__dup"))
    )
    flagged = chunks.join(dup, "chunk", "left").withColumn(
        "__dup", F.coalesce(F.col("__dup"), F.lit(False))
    )
    stats = flagged.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(F.col("__dup").cast("int")).cast("bigint").alias("n_dup_chunks"),
    )
    kept = (
        flagged.filter(~F.col("__dup"))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ci", "chunk"))),
                    lambda x: x["chunk"],
                ),
                " ",
            ).alias("cleaned_text")
        )
    )
    return (
        stats.join(kept, id_col, "left")
        .select(
            id_col,
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6).alias(
                "dup_chunk_frac"
            ),
            "cleaned_text",
        )
    )


def tfidf_top_terms(
    docs: DataFrame, *, top_k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k terms per document by tf-idf with a LINEAR idf,
    idf = (N + 1) / (df + 1), instead of the usual log: libm log()
    differs across engines in the last ulp, and ranking must be
    bit-reproducible for the oracle gate (and for reproducible
    training-data curation generally). Monotone in df, so the top-k
    ranking it induces differs from log-idf only through the tf
    tradeoff, which the linear form weights more sharply.

    Three shuffles, all partial-aggregated: per-(doc,term) tf, per-term
    df, and the ranking window; the tiny (N) scalar joins in as a
    broadcast."""
    tok = tokens(docs, id_col=id_col, text_col=text_col).filter(F.col("token") != "")
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(id_col, "token", "tf", "df", F.round("tfidf", 6).alias("tfidf"), "rn")
    )


def decontaminate_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 12,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination, pair form: (doc_id, bench_id,
    shared_ngrams) for every corpus/benchmark doc pair sharing at
    least ``min_shared`` distinct character n-grams — the standard
    train/eval overlap sweep an LLM pipeline runs before training.

    Plan shape: distinct shingles per side, one equi-join on the
    shingle value, pair-count aggregation. The benchmark side is
    orders of magnitude smaller than the corpus (eval suites vs a
    100 TB crawl), so AQE broadcasts it; the corpus side streams
    through without ever self-joining."""
    from .dedup import shingles

    cs = shingles(corpus, n=n, id_col=id_col, text_col=text_col, distinct=True)
    bs = shingles(benchmark, n=n, id_col=id_col, text_col=text_col, distinct=True).select(
        F.col(id_col).alias("bench_id"), "sh"
    )
    return (
        cs.join(bs, "sh")
        .groupBy(id_col, "bench_id")
        .agg(F.count("*").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def contamination_ratio(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-doc contamination: the fraction of the doc's distinct
    character n-grams that appear anywhere in the benchmark set — the
    thresholdable metric behind decontamination decisions. Returns
    (doc_id, n_shingles, n_contaminated, contamination) for every
    corpus doc.

    The benchmark shingle SET (one distinct column, eval-suite-sized,
    broadcast) is the only relation joined against the corpus
    shingles, as a membership-marking LEFT join — so the corpus
    shingle relation is computed and scanned exactly ONCE (total and
    contaminated counts come out of the same aggregation), and no
    pair blowup can occur even when overlap is pervasive."""
    from .dedup import shingles

    cs = shingles(corpus, n=n, id_col=id_col, text_col=text_col, distinct=True)
    bset = (
        shingles(benchmark, n=n, id_col=id_col, text_col=text_col, distinct=True)
        .select("sh")
        .distinct()
        .withColumn("__in_bench", F.lit(1))
    )
    return (
        cs.join(bset, "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce("__in_bench", F.lit(0))).cast("bigint").alias("n_contaminated"),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_shingles"), 6
            ).alias("contamination"),
        )
    )



# PII patterns shared by the scan and the redactor. Kept inside the
# regex subset Java (Spark) and RE2 (DuckDB) match identically: plain
# character classes and counted repetition — no backreferences, no
# lookaround, so counts and replacements agree across engines.
# Redaction applies the list IN ORDER (emails before bare digit runs,
# IPs before phone-shaped digit groups).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
    ("phone", r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "[PHONE]"),
    ("id_number", r"[0-9]{9,}", "[ID]"),
)


def pii_scan(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the scrubbing pass a pretraining
    pipeline runs before publishing a corpus. Per doc: one match count
    per pattern class (emails, IPv4 addresses, phone-shaped numbers,
    long digit runs), a total, and the text with every match replaced
    by its class token.

    A pure narrow map (regexp_count + chained regexp_replace, all
    JVM codegen): zero shuffles, streams over a 100 TB corpus at scan
    speed. Each class is counted on the PROGRESSIVELY-REDACTED text —
    the same chain the redaction itself walks — so counts and
    redaction always agree: a 9-digit local part inside an email
    counts ONCE as an email, never again as an id number (r6 review,
    confirmed by execution: counting every class on the original text
    double-counted nested matches and contradicted the docstring's
    non-overlap claim)."""
    red = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(red, F.lit(pat)).cast("bigint").alias(f"n_{name}s")
        )
        red = F.regexp_replace(red, pat, token)
    out = docs.select(F.col(id_col), *counts, red.alias("redacted_text"))
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}s")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total.cast("bigint"))


def lm_fluency(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-bigram fluency score — the engine-portable analog of the
    CCNet/KenLM perplexity filter (Wenzek et al. 2020, public): how
    well each document's word transitions are supported by the corpus
    itself. Documents full of incoherent transitions score low and get
    filtered; formulaic text scores high.

    Per doc: ``fluency = sum(C(w1,w2)) / sum(C(w1))`` over the doc's
    bigram instances, where C(w1,w2) is the corpus count of that
    bigram and C(w1) the corpus count of bigram contexts starting
    with w1 — a support-weighted average of the conditional
    probabilities P(w2|w1) that a bigram LM would assign. Kept
    integer-exact on purpose (two BIGINT sums, ONE final double
    division — no log, no order-dependent float accumulation) so the
    score is bit-identical across engines and partitionings.

    Plan shape: per-(doc,bigram) pre-aggregation FIRST (map-side
    combinable, collapses repeated bigrams before any join), then the
    corpus count tables join against the compressed relation, then one
    per-doc roll-up — the tf-idf shape, no self-joins, skew bounded by
    genuine head bigrams which AQE splits."""
    bg = _bigram_rows(docs, id_col=id_col, text_col=text_col)
    d = bg.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("m"))
    pair_c = d.groupBy("w1", "w2").agg(F.sum("m").alias("c2"))
    ctx_c = d.groupBy("w1").agg(F.sum("m").alias("c1"))
    per_doc = (
        d.join(pair_c, ["w1", "w2"])
        .join(ctx_c, ["w1"])
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("c2")).cast("bigint").alias("pair_support_sum"),
            F.sum(F.col("m") * F.col("c1")).cast("bigint").alias("ctx_support_sum"),
        )
    )
    base = docs.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("pair_support_sum", F.lit(0)).cast("bigint").alias("pair_support_sum"),
        F.coalesce("ctx_support_sum", F.lit(0)).cast("bigint").alias("ctx_support_sum"),
        F.round(
            F.col("pair_support_sum").cast("double") / F.col("ctx_support_sum"), 6
        ).alias("fluency"),
    )


def perplexity_buckets(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet head/middle/tail corpus partition (Wenzek et al. 2020
    §4.3, public): split the corpus into equal-mass thirds by LM
    score, so downstream training can keep the 'head' (most fluent
    third), sample the 'middle', and drop the 'tail' — the standard
    perplexity-bucketing step between LM scoring and corpus selection.

    The score is this engine's integer-exact ``lm_fluency`` (higher =
    better-supported transitions, so 'head' is the TOP third — CCNet's
    lowest-perplexity third). The two cut points are EXACT order
    statistics of the score (k = floor(q*(n-1)), the lower-element
    convention shared with ``scale.exact_quantiles``), found by the
    histogram-refinement selector: per round one min/max/count + one
    bucket-count aggregate over the cached score frame — no global
    sort, no row shuffle, O(buckets) driver state. Bucket assignment
    is then a narrow map against two literal thresholds:
    ``fluency <= t1`` -> tail, ``<= t2`` -> middle, else head; docs
    with no bigram at all can't be scored and land in 'unscored'.

    At 100 TB the score frame is one row per doc (already reduced);
    selecting 2 order statistics over it touches only count
    histograms, and the assignment adds zero shuffles on top of the
    fluency computation itself."""
    from . import scale as sc

    # Materialize the score frame ONCE (one row per doc): both the
    # quantile refinement's scans and the final bucket projection read
    # the checkpoint instead of re-running the bigram explode + count
    # joins behind lm_fluency (exact_quantiles' internal cache covers
    # only its own single-column projection, not the returned frame).
    flu = lm_fluency(docs, id_col=id_col, text_col=text_col).localCheckpoint()
    t = sc.exact_quantiles(flu.filter(F.col("n_bigrams") > 0), "fluency", list(cuts))
    by_q = {float(r["q"]): r["value"] for r in t.collect()}
    t1, t2 = by_q[float(cuts[0])], by_q[float(cuts[1])]
    bucket = (
        F.when(F.col("n_bigrams") == 0, F.lit("unscored"))
        .when(F.col("fluency") <= F.lit(t1), F.lit("tail"))
        .when(F.col("fluency") <= F.lit(t2), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return flu.select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.col("fluency"),
        bucket.alias("ppl_bucket"),
    )


def rarity_scores(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-relative rarity/commonness proxy (the CCNet-style signal
    for keeping rare, information-dense documents): per doc, the mean
    document frequency of its DISTINCT tokens — low means the doc uses
    vocabulary few other docs use. Deliberately integer-exact: the
    aggregate is a sum of integer dfs, and the only floating-point op
    is one final division of two exact integers — no log, no
    order-dependent double accumulation, so the score is bit-identical
    across engines, runs, and partitionings.

    Two hash shuffles (distinct tokens, df counts) + one broadcast-
    eligible join back — the same shape as the tf-idf operator."""
    tok = tokens(docs, id_col=id_col, text_col=text_col).filter(F.col("token") != "").distinct()
    dfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    return (
        tok.join(dfreq, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_tokens"),
            F.sum("df").cast("bigint").alias("df_sum"),
        )
        .select(
            id_col,
            "n_distinct_tokens",
            "df_sum",
            F.round(
                F.col("df_sum").cast("double") / F.col("n_distinct_tokens"), 6
            ).alias("commonness"),
        )
    )


def span_dedup_signals(
    docs: DataFrame, *, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Cross-document duplicated token-span detection — the exact-
    substring dedup signal of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better"), reshaped from suffix arrays to
    relational form: every w-token sliding window is a span; a span
    that occurs in >= 2 DISTINCT documents is duplicated; each doc
    reports its total spans, duplicated-span positions, and the
    duplicated fraction (the signal used to cut boilerplate and
    memorization-prone text).

    Plan shape (100 TB): one explode (w-token windows via
    slice+array_join, all codegen), one hash-shuffle groupBy on the
    span's 64-bit xxhash, one shuffle join back on that hash, one
    per-doc agg. Spans travel as 8-byte hashes, never strings, after
    the first projection; a 64-bit collision (~1e-7 at 1e9 spans)
    can only flip one span's dup flag, which is the standard
    fingerprinting trade every suffix-array sharder makes too."""
    ts = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tok = spread(docs).select(F.col(id_col), ts.alias("__ts"))
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.size("__ts") - (w - 1), F.lit(1)))
    )
    spans = tok.select(F.col(id_col), "__ts", pos.alias("__i")).select(
        F.col(id_col),
        F.xxhash64(F.array_join(F.slice("__ts", F.col("__i"), w), " ")).alias("__sh"),
    )
    dup = (
        spans.groupBy("__sh")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__sh")
    )
    flagged = spans.join(dup.withColumn("__dup", F.lit(True)), "__sh", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("__dup"), 1).otherwise(0)).cast("bigint").alias("n_dup_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            F.round(F.col("n_dup_spans").cast("double") / F.col("n_spans"), 6).alias(
                "dup_span_frac"
            ),
        )
    )


def inverted_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 64,
) -> DataFrame:
    """Term -> postings search-index construction — the corpus-scale
    retrieval structure behind BM25/keyword search and RAG-style
    lookups. Per term: document frequency, collection frequency, and a
    bounded postings prefix (the first ``max_postings`` doc ids
    ascending, comma-joined) — bounding the prefix is what makes the
    row width O(1) for stopword-grade terms whose full posting list is
    O(corpus).

    Plan: token explode -> one (token, doc) partial-aggregated tf
    shuffle -> one token-keyed exchange shared by the ranking window
    and the final aggregate (Spark 4 ordered ``listagg`` keeps the
    prefix deterministic; the CASE feed skips rank > cap, and listagg
    ignores NULLs in both engines). No driver collects, no Python."""
    tf = (
        tokens(docs, id_col=id_col, text_col=text_col)
        .filter(F.col("token") != "")
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rn = F.row_number().over(
        Window.partitionBy("token").orderBy(F.col(id_col).asc())
    )
    return (
        tf.withColumn("rn", rn)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
            F.expr(
                f"listagg(CASE WHEN rn <= {int(max_postings)} "
                f"THEN CAST(`{id_col}` AS STRING) END, ',') "
                f"WITHIN GROUP (ORDER BY `{id_col}`)"
            ).alias("postings_head"),
        )
    )


def bpe_merge_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """The first BPE tokenizer-training step at corpus scale: rank
    adjacent character-pair merge candidates by frequency (each pair
    weighted by its word's corpus frequency — exactly what the
    classic BPE iteration maximizes over an initial character
    vocabulary).

    Plan: one map-side-combinable word-frequency count (collapses the
    corpus to its vocabulary BEFORE any expansion), then a per-word
    explode bounded by word length over the VOCAB (not the corpus),
    substr pair extraction in codegen, one pair-keyed aggregation, and
    a parallel TakeOrdered for the global top-N — never a
    single-partition sort. Deterministic tiebreak (freq desc, pair
    asc) so the merge ranking is engine-exact."""
    freqs = (
        tokens(docs, id_col=id_col, text_col=text_col)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("token") >= 2)
    )
    tok = F.col("token")
    pairs = (
        freqs.select(
            "token",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("token") - 1)).alias("i"),
        )
        .select(
            tok.substr(F.col("i"), F.lit(1)).alias("left_sym"),
            tok.substr(F.col("i") + 1, F.lit(1)).alias("right_sym"),
            "freq",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").cast("long").alias("pair_freq"))
    )
    w = Window.orderBy(
        F.col("pair_freq").desc(), F.col("left_sym").asc(), F.col("right_sym").asc()
    )
    return (
        pairs.orderBy(
            F.col("pair_freq").desc(), F.col("left_sym").asc(), F.col("right_sym").asc()
        )
        .limit(top_n)
        .withColumn("merge_rank", F.row_number().over(w).cast("long"))
    )


def bpe_train(
    docs: DataFrame,
    *,
    iters: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multi-iteration BPE tokenizer training over the corpus
    vocabulary: repeat (count adjacent symbol pairs weighted by word
    frequency -> merge the argmax pair everywhere -> recount) ``iters``
    times — the real training loop (Sennrich et al. 2016), not just
    the first merge ranking (``bpe_merge_candidates``).

    Returns one row per iteration: (iteration, left_sym, right_sym,
    pair_freq) — the learned merge table in order.

    Representation: each vocab word's symbol sequence is a string
    with TWO spaces between symbols and one boundary space at each end
    (`` h  e  l  l  o ``). Applying a merge (a, b) is then ONE literal
    ``replace`` of ``' a  b '`` with ``' ab '``: with double-space
    separators, two pattern occurrences overlap in the string IF AND
    ONLY IF they share a symbol (each occurrence consumes one space of
    each neighboring separator, leaving the other space for the next
    occurrence), so leftmost-non-overlapping replace selects exactly
    the pairs the greedy left-to-right BPE pass merges — including
    same-symbol runs like ``bbbbbb``, where a single-space encoding
    provably diverges (the shared delimiter makes skips cascade:
    [bb, b, bb, b] instead of [bb, bb, bb]; caught by
    tests/test_text.py::test_bpe_train_property_random_corpora). The
    replacement ``' ab '`` restores one space on each side, so the
    separator invariant is maintained and the result holds in ANY
    engine with standard replace semantics — which is what lets a
    DuckDB oracle reproduce the whole training run bit-for-bit (same
    trick family as web.pagerank's BIGINT unrolling: no floats, no
    UDFs, engine-exact strings and integers).

    Scale: every per-iteration relation is O(vocabulary), not
    O(corpus) — the corpus collapses to (token, freq) once, up front.
    Each iteration is one pair-count aggregation (map-side combinable)
    + a 1-row argmax joined back via broadcast; ``localCheckpoint``
    cuts the lineage per iteration exactly as the PageRank loop does.
    Nothing row-sized ever reaches the driver."""
    merges, _ = _bpe_train_state(docs, iters=iters, id_col=id_col, text_col=text_col)
    if not merges:
        # iters=0 or nothing mergeable in round 1: empty merge table
        # with the contract schema, not an error.
        return docs.sparkSession.createDataFrame(
            [], "iteration long, left_sym string, right_sym string, pair_freq long"
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_train_state(
    docs: DataFrame, *, iters: int, id_col: str, text_col: str
) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE training loop: returns (per-iteration 1-row merge
    frames, final vocabulary with each token's post-merge segmented
    symbol string ``s``)."""
    vocab = (
        tokens(docs, id_col=id_col, text_col=text_col)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    v = vocab.select(
        "token",
        "freq",
        F.concat(F.lit(" "), F.regexp_replace("token", "(.)", "$1  ")).alias("s"),
    ).localCheckpoint()
    merges = []
    for it in range(1, iters + 1):
        with_syms = v.select("freq", F.split(F.trim(F.col("s")), "  ").alias("a"))
        pairs = (
            with_syms.filter(F.size("a") >= 2)
            .select(
                "freq",
                "a",
                F.explode(F.sequence(F.lit(1), F.size("a") - 1)).alias("i"),
            )
            .select(
                F.element_at("a", F.col("i")).alias("left_sym"),
                F.element_at("a", F.col("i") + 1).alias("right_sym"),
                "freq",
            )
            .groupBy("left_sym", "right_sym")
            .agg(F.sum("freq").cast("long").alias("pair_freq"))
        )
        best = (
            pairs.orderBy(
                F.col("pair_freq").desc(), F.col("left_sym").asc(), F.col("right_sym").asc()
            )
            .limit(1)
            .withColumn("iteration", F.lit(it).cast("long"))
            .localCheckpoint()
        )
        # Vocabulary exhausted (every word is one symbol): no pair to
        # merge, and a crossJoin with the EMPTY argmax frame would wipe
        # the whole vocabulary — stop training instead. All later
        # rounds would be empty too (pairs only shrink), which is also
        # why the oracle's fixed unrolling stays consistent: its
        # LEFT JOIN keeps v unchanged and contributes no merge row.
        if not best.take(1):
            break
        merges.append(best.select("iteration", "left_sym", "right_sym", "pair_freq"))
        pat = F.concat(
            F.lit(" "), F.col("left_sym"), F.lit("  "), F.col("right_sym"), F.lit(" ")
        )
        rep = F.concat(F.lit(" "), F.col("left_sym"), F.col("right_sym"), F.lit(" "))
        v = (
            v.join(F.broadcast(best.select("left_sym", "right_sym")), F.lit(True), "left")
            .select(
                "token",
                "freq",
                F.when(
                    F.col("left_sym").isNull(), F.col("s")
                ).otherwise(F.replace(F.col("s"), pat, rep)).alias("s"),
            )
            .localCheckpoint()
        )
    return merges, v


def bpe_encode_counts(
    docs: DataFrame,
    *,
    iters: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the learned BPE merge table back to the corpus — the step
    after ``bpe_train`` in every tokenizer pipeline, and the statistic
    a training-data pipeline actually budgets on: per document, how
    many BPE tokens does it cost to encode?

    Returns (id, n_ws_tokens, n_bpe_tokens, n_chars_compact): raw
    whitespace tokens, BPE symbols after ``iters`` merges, and
    whitespace-free character count (= BPE symbol count at 0 merges,
    so ``n_chars_compact - n_bpe_tokens`` is exactly the merge
    savings).

    Scale: the merges are applied to the VOCABULARY (O(vocab) rows,
    the same loop as training — at scale the trained vocab is the
    persisted artifact this reads), and the corpus is encoded by one
    token->vocab equi-join (AQE broadcasts the vocab side) + one
    per-doc sum. The corpus-sized work is exactly one token explode,
    one join probe, one aggregation — no per-row merge application
    ever touches corpus rows."""
    _, vocab = _bpe_train_state(docs, iters=iters, id_col=id_col, text_col=text_col)
    seg = vocab.select(
        "token", F.size(F.split(F.trim(F.col("s")), "  ")).cast("long").alias("n_syms")
    )
    t = tokens(docs, id_col=id_col, text_col=text_col).filter(F.col("token") != "")
    return (
        t.join(seg, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ws_tokens"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("token")).cast("long").alias("n_chars_compact"),
        )
    )


def kn_continuation_counts(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Kneser-Ney continuation counts — the LM-smoothing statistic
    (how many DISTINCT contexts a word follows / precedes) that
    separates versatile words from ones glued to a single phrase;
    used for interpolated-KN n-gram models and as a boilerplate
    signal (high frequency + low continuation = template text).

    Plan: adjacent-bigram explode (slice over the one split array),
    one distinct on (w1, w2) — the bigram TYPE table, map-side
    combinable — then two aggregations over that compressed relation
    keyed by each side, outer-merged per token. Counts are integers
    end-to-end: engine-exact."""
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    bg = (
        spread(docs)
        .select(F.col(id_col), arr.alias("__a"))
        .select(
            F.col(id_col),
            F.col("__a"),
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("__a") - 1, F.lit(1)))
            ).alias("i"),
        )
        .filter(F.col("i") <= F.size("__a") - 1)
        .select(
            F.element_at("__a", F.col("i")).alias("w1"),
            F.element_at("__a", F.col("i") + 1).alias("w2"),
        )
    )
    types = bg.distinct()
    left = types.groupBy(F.col("w2").alias("token")).agg(
        F.count(F.lit(1)).cast("long").alias("cont_left")
    )
    right = types.groupBy(F.col("w1").alias("token")).agg(
        F.count(F.lit(1)).cast("long").alias("cont_right")
    )
    return (
        left.join(right, "token", "full_outer")
        .select(
            "token",
            F.coalesce("cont_left", F.lit(0)).cast("long").alias("cont_left"),
            F.coalesce("cont_right", F.lit(0)).cast("long").alias("cont_right"),
        )
    )


def c4_rules(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4-style heuristic page filter (Raffel et al. 2020, §2.2 "Colossal
    Clean Crawled Corpus" rules), the most-replicated public web-text
    curation recipe:

    - a LINE is retained only if it ends in terminal punctuation
      (``[.!?"]``), has >= 5 words, and does not mention javascript;
    - a DOC is kept only if it has no "lorem ipsum", no ``{`` (code
      page signal), and >= 3 sentences across its RETAINED lines
      (sentences counted as terminal-punctuation marks).

    Output per doc: (id, n_lines, n_words, n_kept_lines, n_sentences,
    has_lorem_ipsum, has_brace, kept) — the audit columns a curation
    run reports, not just the verdict.

    One explode on the newline split + one hash-shuffle groupBy on the
    doc id; every rule is a JVM regexp/length expression (zero
    Python). Doc-level flags are computed on the full text BEFORE the
    explode and ride the groupBy keys (constant per doc)."""
    line = F.col("__line")
    trimmed = F.trim(line)
    words = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    keep_line = (
        F.rtrim(line).rlike(r'[.!?"]$')
        & (words >= 5)
        & ~F.lower(line).contains("javascript")
    )
    sent = F.when(
        keep_line, F.regexp_count(line, F.lit(r"[.!?]"))
    ).otherwise(F.lit(0))
    lines = docs.select(
        F.col(id_col),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("has_lorem_ipsum"),
        F.col(text_col).contains("{").alias("has_brace"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    )
    agg = lines.groupBy(id_col, "has_lorem_ipsum", "has_brace").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(words).cast("long").alias("n_words"),
        F.sum(keep_line.cast("int")).cast("long").alias("n_kept_lines"),
        F.sum(sent).cast("long").alias("n_sentences"),
    )
    return agg.select(
        id_col,
        "n_lines",
        "n_words",
        "n_kept_lines",
        "n_sentences",
        "has_lorem_ipsum",
        "has_brace",
        (
            ~F.col("has_lorem_ipsum")
            & ~F.col("has_brace")
            & (F.col("n_sentences") >= 3)
        ).alias("kept"),
    )


def gopher_rules(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style heuristic quality filter (Rae et al. 2021,
    "Scaling Language Models", Table A1 repetition-free rules — the
    other canonical public web-text recipe next to C4):

    - 50 <= word count <= 100,000;
    - mean word length in [3, 10] characters;
    - symbol-to-word ratio (#, ellipsis) <= 0.1;
    - <= 10% of lines start with a bullet, <= 30% end with an
      ellipsis;
    - >= 80% of words contain an alphabetic character;
    - >= 2 of the 8 canonical stop words present (the, be, to, of,
      and, that, have, with).

    Every ratio rule is evaluated in INTEGER arithmetic
    (``3*n <= total <= 10*n`` instead of a float mean, etc.) so the
    verdict and all audit columns are engine-exact under the DuckDB
    oracle. One word-explode + one hash-shuffle groupBy on the doc id;
    the line/symbol/stop-word signals are zero-shuffle ``(?m)``
    multiline-regexp counts over the full text carried through
    ``first()`` aggregates."""
    word = F.col("__w")
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    n_stop = sum(
        (F.lower(F.col(text_col)).rlike(rf"\b{s}\b")).cast("int") for s in stops
    )
    exploded = docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(r"#|…|\.\.\.")).alias("__sym"),
        (F.size(F.split(F.col(text_col), "\n"))).alias("__lines"),
        F.regexp_count(F.col(text_col), F.lit(r"(?m)^[-*•]")).alias("__bullet"),
        F.regexp_count(F.col(text_col), F.lit(r"(?m)(\.\.\.|…)$")).alias("__ellip"),
        n_stop.alias("__stops"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__w"),
    )
    agg = exploded.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.length(word)).cast("long").alias("n_word_chars"),
        F.sum(word.rlike("[a-zA-Z]").cast("int")).cast("long").alias("n_alpha_words"),
        F.first("__sym").cast("long").alias("n_symbols"),
        F.first("__lines").cast("long").alias("n_lines"),
        F.first("__bullet").cast("long").alias("n_bullet_lines"),
        F.first("__ellip").cast("long").alias("n_ellipsis_lines"),
        F.first("__stops").cast("long").alias("n_stop_words"),
    )
    n, chars = F.col("n_words"), F.col("n_word_chars")
    kept = (
        (n >= 50)
        & (n <= 100_000)
        & (chars >= 3 * n)
        & (chars <= 10 * n)
        & (10 * F.col("n_symbols") <= n)
        & (10 * F.col("n_bullet_lines") <= F.col("n_lines"))
        & (10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines"))
        & (5 * F.col("n_alpha_words") >= 4 * n)
        & (F.col("n_stop_words") >= 2)
    )
    return agg.select(
        id_col, "n_words", "n_word_chars", "n_alpha_words", "n_symbols",
        "n_lines", "n_bullet_lines", "n_ellipsis_lines", "n_stop_words",
        kept.alias("kept"),
    )


def sliding_chunks(
    docs: DataFrame,
    *,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG/embedding prep
    step (LangChain/LlamaIndex text splitters, retrieval corpora):
    whitespace tokens windowed as [i*stride, i*stride+size) with
    ``size - stride`` tokens of overlap so no boundary sentence is
    lost to a hard cut. Complements ``chunk_tokens``'s DISJOINT
    chunks (built for dedup, where overlap would self-collide).

    Output: (id, chunk_id, n_chunk_tokens, chunk_text); every doc
    yields at least one chunk (short docs -> one partial window).
    Zero shuffles: split + one sequence explode + slice/array_join,
    all JVM codegen — chunking 100 TB is a narrow map stage."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # chunks = 1 + ceil(max(n - size, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(size), F.lit(0)) / F.lit(stride)
    ).cast("int")
    ex = docs.select(
        F.col(id_col),
        toks.alias("__t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    window = F.slice(F.col("__t"), F.col("chunk_id") * stride + 1, size)
    return ex.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(window).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def hashed_ngram_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """fastText-style linear quality classifier over HASHED word
    bigrams (Joulin et al. 2016, public; the quality-classifier step in
    CCNet/LLaMA-style curation): features are bigrams hashed into
    ``n_buckets`` buckets (the hashing trick — fixed model width at
    any vocabulary size), the model is a weight per bucket, and the
    doc score is the INTEGER sum of its bigram-bucket weights.

    ``weights`` is a (bucket BIGINT, weight BIGINT) model table —
    dimension-sized (n_buckets rows), joined broadcast-small against
    the compressed per-(doc,bucket) relation. When None, weights are
    derived deterministically from md5 of the bucket id (an
    engine-portable stand-in in [-1000, 1000] — the scoring plumbing
    is identical, only the training that produces real weights is
    external). Integer score, one final keep verdict (score > 0):
    bit-identical across engines and partitionings.

    Plan: bigram explode (zero-shuffle narrow map) -> per-(doc,bucket)
    count pre-agg (map-side combinable) -> broadcast-sized weight join
    -> per-doc roll-up. One doc-keyed shuffle chain, no Python."""
    bg = _bigram_rows(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.concat_ws(" ", "w1", "w2").alias("bigram")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("hb:"), F.col("bigram"))), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(n_buckets),
    )
    per_bucket = (
        bg.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if weights is None:
        w = (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("w:"), F.col("bucket").cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(2001),
            )
            - 1000
        )
        weighted = per_bucket.withColumn("weight", w)
    else:
        weighted = per_bucket.join(weights, on="bucket", how="left").withColumn(
            "weight", F.coalesce(F.col("weight"), F.lit(0)).cast("long")
        )
    scored = weighted.groupBy(id_col).agg(
        F.sum(F.col("n") * F.col("weight")).cast("long").alias("score"),
        F.sum("n").cast("long").alias("n_bigrams"),
    )
    return docs.select(F.col(id_col)).join(scored, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        (F.coalesce(F.col("score"), F.lit(0)) > 0).alias("keep"),
    )


def regex_token_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """GPT-2-style pre-tokenizer counts (Radford et al. 2019 describe
    the regex pre-split publicly): tokens are letter runs, digit runs,
    or single punctuation marks — the engine-portable core of the BPE
    pre-tokenization split ([A-Za-z]+|[0-9]+|single non-alnum), which
    tracks real BPE token counts far better than char/4 on code,
    numbers, and punctuation-heavy text. Per doc: the regex token
    count, its word/number/punct composition, and mean compact chars
    per token (the compression-ratio signal LM budget planning uses).
    Zero-shuffle narrow map, pure JVM regexp codegen; identical RE2/
    Java semantics for this pattern, so the DuckDB oracle replays it
    verbatim."""
    text = F.col(text_col)
    n_all = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    n_words = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+"), F.lit(0)))
    n_numbers = F.size(F.regexp_extract_all(text, F.lit("[0-9]+"), F.lit(0)))
    compact = F.length(F.regexp_replace(text, r"\s", ""))
    n_all_nz = F.greatest(n_all, F.lit(1))
    return docs.select(
        F.col(id_col),
        n_all.cast("long").alias("n_regex_tokens"),
        n_words.cast("long").alias("n_word_tokens"),
        n_numbers.cast("long").alias("n_number_tokens"),
        (n_all - n_words - n_numbers).cast("long").alias("n_punct_tokens"),
        F.round(compact / n_all_nz, 6).alias("chars_per_token"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranked retrieval over the corpus — the scoring side
    of ``inverted_index`` (Robertson & Zaragoza 2009, public; the
    Lucene default formula): per query term,
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` times the saturated
    tf ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``; the doc score
    is the sum over matched terms. The keyword-mining half of a RAG /
    hard-negative curation pipeline (the ANN operators are the dense
    half).

    Determinism: per-term contributions are computed as one fixed
    expression tree over exact integer inputs (tf, df, dl, N, sum_dl)
    and rounded to 8dp BEFORE the exact DECIMAL sum; the final score
    rounds to 6dp before the (score desc, id) tiebreak. ``ln`` is the
    one non-correctly-rounded IEEE op in the tree (unlike the ANN
    operators' sqrt), so cross-engine hash equality is
    probabilistic-but-overwhelming rather than guaranteed — this
    operator stays on the local bare gate by design.

    Plan: TWO passes over the raw text, only one of them exploded.
    Pass A is a narrow no-explode aggregation to ONE row — doc count,
    total token count, and per-term document frequencies via
    ``array_contains`` on the split array (no shuffle beyond the
    single-row agg). Pass B explodes tokens, filters to the query's
    terms BEFORE the only corpus shuffle (O(matching tokens)) and
    carries the doc length alongside. The df row broadcasts into the
    scoring join; the global top-k is TakeOrderedAndProject (O(k) per
    partition, no single-partition sort of the corpus). (The review
    caught the first version paying a second full explode for doc
    lengths; a melt variant re-paid it 3x through Catalyst's
    no-subplan-sharing — this shape is the one that scales.)"""
    terms = sorted({t.lower() for t in query_terms})
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    stats = docs.agg(
        # count(size(arr)) skips null-text docs, matching the
        # token-derived doc count the oracle computes
        F.count(F.size(arr)).cast("bigint").alias("n_docs"),
        F.sum(F.size(arr)).cast("bigint").alias("sum_dl"),
        *[
            F.sum(F.array_contains(arr, t).cast("bigint")).alias(f"__df{i}")
            for i, t in enumerate(terms)
        ],
    )
    base = spread(docs).select(
        F.col(id_col),
        F.size(arr).cast("bigint").alias("dl"),
        F.explode(arr).alias("token"),
    )
    tf = (
        base.filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(
            F.count("*").cast("bigint").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )
    df_of_term = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(t) for t in terms]),
            F.array(*[F.col(f"__df{i}") for i in range(len(terms))]),
        ),
        F.col("token"),
    )
    contrib = F.expr(
        f"round(ln(1.0d + (cast(n_docs as double) - cast(df as double) + 0.5d)"
        f" / (cast(df as double) + 0.5d))"
        f" * (cast(tf as double) * ({k1}d + 1.0d))"
        f" / (cast(tf as double) + {k1}d * (1.0d - {b}d"
        f" + {b}d * cast(dl as double)"
        f" / (cast(sum_dl as double) / cast(n_docs as double)))), 8)"
    )
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("df", df_of_term)
        .withColumn("contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("contrib").cast("decimal(28,8)")).cast("double"), 6
            ).alias("score"),
            F.count("*").cast("bigint").alias("n_terms_matched"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "rank", "score", "n_terms_matched"
    )


def vocab_coverage(
    docs: DataFrame,
    *,
    max_rank: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cumulative token-coverage curve by vocabulary rank — the
    tokenizer-sizing signal ("what vocab size covers 99% of corpus
    tokens"): for each of the top ``max_rank`` tokens by frequency
    (ties to the lexicographically smaller token, matching
    ``corpus_vocab_build``), the running total of corpus tokens the
    vocabulary prefix up to that rank covers, as an exact BIGINT and
    as a fraction of all tokens.

    Plan: one map-side-combinable token count shuffle; the top-N is a
    parallel TakeOrdered; the cumulative window then runs over the
    ALREADY-LIMITED max_rank rows (dimension-sized — the one place a
    single-partition window is fine), with the corpus total riding in
    as a broadcast scalar. Exact integers until the one final
    division."""
    tok = tokens(docs, id_col=id_col, text_col=text_col).filter(F.col("token") != "")
    c = tok.groupBy("token").agg(F.count("*").cast("long").alias("freq"))
    total = c.agg(F.sum("freq").cast("long").alias("total_tokens"))
    top = c.orderBy(F.col("freq").desc(), F.col("token").asc()).limit(max_rank)
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("cum_freq", F.sum("freq").over(
            Window.orderBy(F.col("freq").desc(), F.col("token").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "rank", "token", "freq", "cum_freq",
            F.round(
                F.col("cum_freq").cast("double") / F.col("total_tokens"), 6
            ).alias("coverage"),
        )
    )


def compression_ratio(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher/MassiveText
    "symbol-to-token" style redundancy signal (Rae et al. 2021, public
    report): highly compressible text is boilerplate/repetition, nearly
    incompressible text is noise or binary junk; curation keeps the
    middle. ``ratio = compressed_len / utf8_len`` (1.0 for empty
    docs — nothing to compress is "incompressible", not infinitely
    compressible).

    zlib has no JVM SQL surface, so this is one of the repo's few
    deliberately-Python operators: Arrow-batched ``mapInPandas``
    (whole Arrow batches cross the boundary once, same plan shape as
    the multimodal decoders — never a per-row UDF). Compressed LENGTH
    depends on the zlib build/level, so there is no cross-engine exact
    oracle; the registry entry is a documented rows-only check and the
    unit test pins ORDERING properties (repetitive < prose < random)
    rather than exact byte counts."""
    import zlib

    import pandas as pd

    src = docs.select(F.col(id_col), F.col(text_col))

    def batches(it):
        for pdf in it:
            texts = pdf[text_col]
            raw_len, comp_len, ratio = [], [], []
            for t in texts:
                b = (t or "").encode("utf-8")
                c = len(zlib.compress(b, level)) if b else 0
                raw_len.append(len(b))
                comp_len.append(c)
                ratio.append(round(c / len(b), 6) if b else 1.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],  # carry the input id dtype
                    "utf8_len": pd.Series(raw_len, dtype="int64"),
                    "compressed_len": pd.Series(comp_len, dtype="int64"),
                    "compression_ratio": pd.Series(ratio, dtype="float64"),
                }
            )

    # the id column keeps ITS OWN type (r6 review: astype('int64') +
    # a hardcoded 'long' schema crashed on the string doc ids every
    # other operator in the module supports)
    id_type = src.schema[id_col].dataType.simpleString()
    return src.mapInPandas(
        batches,
        f"{id_col} {id_type}, utf8_len long, compressed_len long, "
        "compression_ratio double",
    )
