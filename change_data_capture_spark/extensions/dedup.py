"""Document deduplication operators: exact, n-gram Jaccard, MinHash-LSH,
SimHash.

Scale design:
- exact dedup is a single hash-shuffle (groupBy md5);
- brute-force Jaccard is the O(n^2) *correctness baseline* — its
  shingle self-join explodes quadratically in group size and exists to
  validate the LSH paths at small scale;
- MinHash-LSH is the 100 TB path: per-doc signatures are one narrow
  agg over shingles (128 mins), banding turns all-pairs into an
  equi-join on (band, band-hash) buckets, and only bucket collisions
  are verified with exact Jaccard. With 32 bands x 4 rows a true
  pair at Jaccard 0.8 is missed with probability (1-0.8^4)^32 ~= 5e-8,
  so the verified output equals the brute-force output w.h.p. while
  doing ~linear work;
- SimHash is the cheaper candidate generator (one 64-bit signature,
  band-bucket join on 16-bit quarters, Hamming<=3 filter), again
  followed by exact verification.

All hashing is Spark's JVM xxhash64 — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism BEFORE a
    high-expansion stage (shingling explodes ~300 rows per doc). The
    scan sizer packs partitions by input bytes and cannot see the
    expansion factor, so a compact doc table would otherwise run the
    CPU-heavy stage on a handful of cores — true on a 1000-executor
    cluster exactly as on local[32]; the pre-shuffle moves only the
    small input."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)



def shingles(
    docs: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """Character n-gram shingles per document. The substrings are cut
    inside an array ``transform`` BEFORE the explode so each output row
    carries an n-char shingle, not a duplicated copy of the whole
    document (explode-then-substr costs O(doc_len) memory bandwidth
    per shingle row).

    ``distinct=True`` adds the set-semantics shuffle that exact Jaccard
    needs; MinHash callers pass False — min() over duplicate shingles
    is identical, and skipping the global distinct removes the one
    full-corpus shuffle from the signature path (the difference between
    a narrow scan and a 100 TB exchange).

    Formulation note: explode(sequence) + substr stays inside
    whole-stage codegen; the tempting transform(sequence, i ->
    substr(...)) is ~9x slower because higher-order functions are
    interpreted per element."""
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1))))
    # NULL-text docs are EXCLUDED from similarity entirely (r6 review,
    # confirmed by execution): substr(NULL) yields NULL shingles whose
    # xxhash64 is a non-null CONSTANT, so two content-less docs got
    # identical MinHash signatures, collided in every band, and the
    # exact verify then divided 0/0 (both shingle sets empty) — an
    # ANSI crash AND a violation of the equals-brute-force contract
    # (the brute-force path never pairs them: NULL join keys).
    out = (
        spread(docs)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.col(text_col), pos.alias("i"))
        .select(
            F.col(id_col), F.col(text_col).substr(F.col("i"), F.lit(n)).alias("sh")
        )
    )
    return out.distinct() if distinct else out


def exact_duplicates(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: (dup_id, keeper_id) pairs where
    keeper is the smallest id sharing the same md5(text)."""
    from pyspark.sql import Window

    keeper = F.min(id_col).over(Window.partitionBy(F.md5(F.col(text_col))))
    return (
        docs.select(F.col(id_col), keeper.alias("keeper_id"))
        .filter(F.col(id_col) != F.col("keeper_id"))
        .select(F.col(id_col).alias("dup_id"), "keeper_id")
    )


def _jaccard_on(sh: DataFrame, threshold: float, id_col: str) -> DataFrame:
    """Exact Jaccard over the full shingle self-join — the quadratic
    brute-force baseline. Candidate-restricted verification lives in
    ``_verify_pairs`` (which prunes docs BEFORE the shingle explode)."""
    # sh feeds three consumers (counts + both join sides): persist AND
    # materialize eagerly — within a single downstream action the
    # three scan stages race before any cache block registers and
    # each recomputes the subtree; a one-job materialization makes
    # the other two read from cache.
    sh = sh.persist()
    sh.count()
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.select(F.col(id_col).alias("a_id"), "sh")
    b = sh.select(F.col(id_col).alias("b_id"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("k"))
    )
    ca = counts.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    cb = counts.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    out = (
        inter.join(ca, "a_id")
        .join(cb, "b_id")
        .withColumn("jaccard", F.col("k") / (F.col("na") + F.col("nb") - F.col("k")))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )
    # materialize + release (same cache-lifetime contract as
    # _verify_pairs): the returned frame must not pin the shingle cache
    out = out.persist()
    out.count()
    sh.unpersist()
    return out


def jaccard_duplicates(
    docs: DataFrame, *, n: int = 5, threshold: float = 0.8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Brute-force n-gram Jaccard near-dup pairs (the quadratic
    correctness baseline)."""
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    return _jaccard_on(sh, threshold, id_col)


def jaccard_duplicates_prefix(
    docs: DataFrame,
    *,
    n: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT text near-dup at scale: the prefix-filtered AllPairs/
    PPJoin set-similarity self-join (recall 1, no banding, no
    probability) over character n-gram shingles — the third point in
    the text near-dup design space alongside the quadratic baseline
    (``jaccard_duplicates``) and the probabilistic MinHash path
    (``minhash_lsh_duplicates``): use this when the drop list must be
    AUDITABLY complete at a fixed threshold. Thin adapter over the
    shared binary implementation
    (``multimodal.payload_jaccard_duplicates``, stride 1 to match the
    text shingle definition exactly); returns
    (a_id, b_id, inter_shingles, union_shingles) integer counts, so
    the DuckDB oracle hashes bit-exact. The text column passes through
    UNENCODED: Spark's substring/length are character-based on
    strings, so shingles are CHARACTER n-grams exactly like
    ``jaccard_duplicates`` and the oracle, unicode included (encoding
    to UTF-8 bytes would split multibyte code points and diverge on
    non-ASCII text). Scale shape: shingle-grain df rank + prefix
    equi-join + candidate-bounded verify (plan-guarded, no all-pairs,
    no broadcast hints)."""
    from .multimodal import payload_jaccard_duplicates

    payloads = docs.select(F.col(id_col), F.col(text_col).alias("payload"))
    return payload_jaccard_duplicates(
        payloads,
        n=n,
        stride=1,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        id_col=id_col,
    )


def _verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    n: int,
    threshold: float,
    id_col: str,
    text_col: str,
    with_counts: bool = False,
) -> DataFrame:
    """Exact-Jaccard verification of candidate ``pairs``, shingling
    ONLY the candidate documents.

    The id semi-join runs against the narrow ``docs`` table BEFORE the
    shingle explode — Catalyst cannot push a semi-join below a
    Generate node, so handing the verifier a pre-exploded full-corpus
    shingle frame (the old shape) re-paid the whole O(corpus)
    explode+scan for a verify stage that touches O(collisions) docs.
    At 100 TB the difference is a second full-corpus pass vs a
    semi-join whose probe side is near-dup collisions only."""
    # Persist the PAIR LIST (small: one row per surviving candidate
    # pair) but do NOT materialize it eagerly: the single final action
    # drives candidate generation (band join + screen, over the
    # caller's cached signatures), the id union, the semi-join, and
    # the candidate-doc explode+fold in ONE job — identical subplans
    # (the two set-fold scans, the three pair scans) go through
    # Spark's exchange reuse instead of recomputing. Measured at
    # sf0.1: one fused job is ~30% faster end-to-end than the old
    # eager pairs.count() two-job shape (r5 A/B, warm-JIT controlled,
    # min-of-4 both orders); the earlier measurement that favored the
    # eager count predates the screen stage and no longer holds.
    pairs = pairs.persist()
    ids = (
        pairs.select(F.col("a_id").alias(id_col))
        .unionByName(pairs.select(F.col("b_id").alias(id_col)))
        .distinct()
    )
    # No broadcast hint: candidate-doc count is O(collisions), which a
    # template-heavy corpus can blow past driver memory — AQE
    # broadcasts it when it measures small (see _jaccard_on notes).
    cand_docs = docs.join(ids, id_col, "left_semi")
    sh = shingles(cand_docs, n=n, id_col=id_col, text_col=text_col, distinct=False)
    sets = sh.groupBy(id_col).agg(F.collect_set("sh").alias("shset"))
    a_sets = sets.select(F.col(id_col).alias("a_id"), F.col("shset").alias("sa"))
    b_sets = sets.select(F.col(id_col).alias("b_id"), F.col("shset").alias("sb"))
    # __k hoisted to a column so the intersection is computed once per
    # pair and the exact integer (k, na, nb) triple can ride along for
    # with_counts callers; jaccard's VALUE is unchanged (same integer
    # operands, same double division)
    cols = ["a_id", "b_id", F.round("jaccard", 6).alias("jaccard")]
    if with_counts:
        # the integers the score histogram bands on — exposing them
        # here saves that caller a full second shingle+self-join pass
        cols += [
            F.col("__k").cast("long").alias("inter_k"),
            F.col("__na").cast("long").alias("n_a"),
            F.col("__nb").cast("long").alias("n_b"),
        ]
    out = (
        pairs.join(a_sets, "a_id")
        .join(b_sets, "b_id")
        .withColumn("__k", F.size(F.array_intersect("sa", "sb")))
        .withColumn("__na", F.size("sa"))
        .withColumn("__nb", F.size("sb"))
        .withColumn(
            "jaccard",
            F.col("__k") / (F.col("__na") + F.col("__nb") - F.col("__k")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(*cols)
    )
    # Materialize the (small) verified result and RELEASE the pair
    # cache before returning: a lazily-returned frame would otherwise
    # pin the whole candidate-generation subtree's cache forever — in
    # a foreachBatch near-dup gate that's one leaked cache per
    # micro-batch for the stream's lifetime. persist+count (NOT
    # localCheckpoint, which sidesteps AQE and cost ~60% extra wall
    # time, measured): the returned frame IS the persisted result, so
    # long-lived callers can .unpersist() it once consumed — the
    # residual footprint is the few verified rows, not the pipeline.
    out = out.persist()
    out.count()
    pairs.unpersist()
    return out


def minhash_signatures(sh: DataFrame, *, k: int = 128, id_col: str = "doc_id") -> DataFrame:
    """k min-hash values per doc: one string xxhash64 pass over the
    shingles, then k fixed-width re-hashes of that 64-bit value seeded
    by the permutation index (overflow-free under ANSI mode, all JVM
    codegen).

    Measured dead end (do not retry): one-permutation hashing (bucket
    by ``h mod k``, min per (doc, bucket), densify empty buckets) cuts
    per-shingle hash work k-fold but was ~35% SLOWER end-to-end at
    sf0.1 — the k seeded hashes are cheap long->long codegen ops and
    the single groupBy's map-side combine already collapses each
    partition to one row per doc, whereas OPH inserts a (doc, bucket)
    shuffle of k rows per doc AND its shared densification fills
    inflated band collisions ~40x while dropping true pairs (recall
    252/256 on the sf0.1 fixture)."""
    with_h = sh.withColumn("__h", F.xxhash64("sh"))
    # One F.expr per aggregate, not per-node Column composition: the
    # Column API pays a Py4J socket round trip per function node, and
    # k=128 three-node aggregates cost ~1.3 s of pure build latency
    # (measured; the parsed trees are identical).
    mins = [F.expr(f"min(xxhash64(__h, {i})) as mh{i}") for i in range(k)]
    return with_h.groupBy(id_col).agg(*mins)


def minhash_lsh_duplicates(
    docs: DataFrame,
    *,
    n: int = 5,
    k: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
    _with_counts: bool = False,
) -> DataFrame:
    """MinHash + banded LSH candidates, exact-Jaccard verified.

    ``max_bucket_size`` enables the production-scale quadratic-blowup
    guard (see ``_cap_buckets``); default None keeps recall 1 so the
    output stays equal to the brute-force oracle.

    Output (a_id, b_id, jaccard) equals the brute-force
    ``jaccard_duplicates`` w.h.p. (see module docstring) — the LSH only
    changes WORK, not the answer, which is what lets the DuckDB oracle
    check it.
    """
    assert k % bands == 0
    rows = k // bands
    # Raw (non-distinct) shingles: the signature agg needs no set
    # semantics and the verify stage distincts only candidate docs.
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col, distinct=False)
    # Persisted AND eagerly materialized: the one verify action below
    # scans sig four times (two bucket sides + two screen joins);
    # without a one-job materialization those scans race before any
    # cache block registers and the expensive shingle+minhash agg
    # recomputes per scan.
    sig = minhash_signatures(sh, k=k, id_col=id_col).persist()
    sig.count()

    buckets = _cap_buckets(
        _band_buckets(sig, bands=bands, rows=rows, id_col=id_col), max_bucket_size
    )

    a = buckets.select(F.col(id_col).alias("a_id"), "band", "bh")
    b = buckets.select(F.col(id_col).alias("b_id"), "band", "bh")
    # The dedup of bucket collisions is an aggregation anyway, so count
    # matching bands while we're there and demand >= 2: a true J>=0.8
    # pair matches ~0.41*bands bands in expectation and misses the cut
    # with p ~= 6e-5 at 24 bands, while single-band coincidences — the
    # bulk of a template-heavy corpus's collisions — drop out before
    # the signature screen ever sees them. Same shuffle as distinct(),
    # strictly fewer output rows.
    candidates = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("__nb"))
        .filter(F.col("__nb") >= 2)
        .select("a_id", "b_id")
    )
    screened = _screen_candidates(sig, candidates, k=k, threshold=threshold, id_col=id_col)
    # _verify_pairs materializes its verified output before returning,
    # so by the time it returns the sig cache is no longer referenced
    # by anything lazy. It re-shingles from `docs`
    # (candidate docs only) rather than reusing `sh` — the semi-join
    # lands BELOW the explode that way, so the verify never re-pays
    # the full-corpus shingle scan the signature agg already did.
    out = _verify_pairs(
        docs, screened, n=n, threshold=threshold, id_col=id_col,
        text_col=text_col, with_counts=_with_counts,
    )
    sig.unpersist()
    return out


def _band_buckets(sig: DataFrame, *, bands: int, rows: int, id_col: str) -> DataFrame:
    """Explode a signature row into (id, band, band-hash) bucket rows —
    the LSH equi-join key. One SQL string = one Py4J call (see
    minhash_signatures)."""
    band_structs = ", ".join(
        "struct({b} as band, xxhash64({cols}) as bh)".format(
            b=b, cols=", ".join(f"mh{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    return sig.selectExpr(
        f"`{id_col}`", f"explode(array({band_structs})) as bk"
    ).select(id_col, "bk.band", "bk.bh")


def _cap_buckets(buckets: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop LSH buckets holding more than ``max_bucket_size`` docs —
    the quadratic-blowup guard every production LSH dedup runs at
    corpus scale. A boilerplate template family of M near-identical
    docs lands its members in the SAME band bucket, turning the bucket
    self-join into M^2 candidate pairs; at 100 TB one viral template
    (M ~ 10^6) would emit 10^12 pairs from a single bucket. Oversized
    buckets are near-exact families that exact dedup (md5) catches
    far cheaper, so dropping them trades recall only on pairs another
    operator already finds.

    Implemented as a count window over the bucket key — the shuffle it
    introduces hash-partitions on exactly the (band, bh) key the
    candidate self-join needs next, so the exchange is reused, not
    added. Deterministic (exact counts), default OFF (None) so the
    oracle-exact operators keep recall 1."""
    if max_bucket_size is None:
        return buckets
    from pyspark.sql import Window

    n = F.count(F.lit(1)).over(Window.partitionBy("band", "bh"))
    return (
        buckets.withColumn("__bn", n)
        .filter(F.col("__bn") <= int(max_bucket_size))
        .drop("__bn")
    )


def minhash_lsh_against(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    *,
    n: int = 5,
    k: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH dedup: near-dup pairs (a_id = NEW doc,
    b_id = CORPUS doc) of an incoming batch against an existing corpus
    — the daily-ingest shape, where re-running all-corpus dedup per
    batch would be O(corpus) wasted work. Ids of the two sets must be
    disjoint; the contract is enforced (anti-join below) rather than
    trusted, because an overlapping id would silently union two docs'
    shingle sets and corrupt every Jaccard it touches.

    Scale contract: the corpus side is touched exactly as the full
    operator touches it (one shingle scan -> signature agg -> bucket
    explode); in a production pipeline the corpus signatures/buckets
    are the PERSISTED index this function's ``sig/bucket`` subplans
    read from storage, so per-batch cost is O(new batch + collisions).
    Candidates join on (band, band-hash) across the two sides only —
    new-vs-new pairs are deliberately out of scope (they land in the
    next full-corpus pass, or a same-batch call of the symmetric
    operator)."""
    assert k % bands == 0
    rows = k // bands
    # Enforce the disjoint-id contract: a corpus row reusing a new-batch
    # id is dropped (left-anti on the id only — O(|new|) side, AQE
    # broadcasts it) so the unioned shingle/signature tables below can
    # never mix two documents under one id.
    corpus_docs = corpus_docs.join(
        new_docs.select(id_col).distinct(), id_col, "left_anti"
    )
    sh_new = shingles(new_docs, n=n, id_col=id_col, text_col=text_col, distinct=False)
    sh_old = shingles(corpus_docs, n=n, id_col=id_col, text_col=text_col, distinct=False)
    sig_new = minhash_signatures(sh_new, k=k, id_col=id_col).persist()
    sig_old = minhash_signatures(sh_old, k=k, id_col=id_col).persist()
    sig_new.count()
    sig_old.count()
    a = _cap_buckets(
        _band_buckets(sig_new, bands=bands, rows=rows, id_col=id_col), max_bucket_size
    ).select(F.col(id_col).alias("a_id"), "band", "bh")
    b = _cap_buckets(
        _band_buckets(sig_old, bands=bands, rows=rows, id_col=id_col), max_bucket_size
    ).select(F.col(id_col).alias("b_id"), "band", "bh")
    candidates = (
        a.join(b, ["band", "bh"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("__nb"))
        .filter(F.col("__nb") >= 2)
        .select("a_id", "b_id")
    )
    screened = _screen_candidates(
        sig_new.unionByName(sig_old), candidates, k=k, threshold=threshold, id_col=id_col
    )
    all_docs = new_docs.select(id_col, text_col).unionByName(
        corpus_docs.select(id_col, text_col)
    )
    out = _verify_pairs(
        all_docs, screened, n=n, threshold=threshold, id_col=id_col, text_col=text_col
    )
    sig_new.unpersist()
    sig_old.unpersist()
    return out


def _screen_candidates(
    sig: DataFrame,
    candidates: DataFrame,
    *,
    k: int,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Signature-estimate screen over LSH bucket candidates.

    Band collisions fire for mid-similarity pairs too (at J=0.5 a
    4-row band still matches with p~=6% somewhere across 24 bands),
    so a template-heavy corpus yields orders of magnitude more
    candidates than true pairs. The signature Jaccard ESTIMATE
    (matching-minhash fraction) screens them before the expensive
    exact verify: at k=96 a true J>=0.8 pair falls below
    threshold-0.2 with p~=5e-7 (sigma = sqrt(J(1-J)/k) ~= 0.04),
    while J<=0.5 impostors are cut with >97% probability. Survivors
    are exact-verified — the screen changes work, not the answer.

    Scale contract: the O(corpus) signature table must never carry a
    broadcast hint into these joins — the INNER join on candidate ids
    is itself the reduction (only candidate rows survive), and with no
    hints AQE broadcasts whichever side is actually small at runtime:
    the candidate list when collisions are rare, neither when a
    template-heavy corpus makes candidates huge — in which case both
    joins degrade to scale-safe shuffle joins instead of an O(corpus)
    broadcast OOM."""
    # selectExpr strings / one F.expr for the 2k+1 column expressions:
    # the per-Column form cost ~4.7 s of Py4J round trips per build at
    # k=96 (measured; identical parsed plans).
    a_sig = sig.selectExpr(
        f"`{id_col}` as a_id", *[f"mh{i} as a{i}" for i in range(k)]
    )
    b_sig = sig.selectExpr(
        f"`{id_col}` as b_id", *[f"mh{i} as b{i}" for i in range(k)]
    )
    matches = F.expr(" + ".join(f"if(a{i} = b{i}, 1, 0)" for i in range(k)))
    return (
        candidates.join(a_sig, "a_id")
        .join(b_sig, "b_id")
        .filter(matches >= int(max(threshold - 0.2, 0.0) * k))
        .select("a_id", "b_id")
    )


def duplicate_clusters(pairs: DataFrame, *, max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs: (doc_id, cluster_id)
    with cluster_id = the smallest doc id reachable through pair
    edges — the canonical-representative step every dedup pipeline
    runs after pair finding (keep one doc per cluster).

    Iterative min-label propagation, seeded one round ahead: labels
    START at min(own id, min neighbor id) — for the clique/star
    components template near-dups actually form, that IS the fixpoint,
    so the loop usually runs a single confirmation round (changed=0)
    instead of propagate+propagate+confirm. Longer chains still
    converge in O(diameter) rounds; each round is one shuffle of the
    label table (O(V+E)), and ``localCheckpoint`` cuts the lineage so
    plan size stays constant. Deterministic — no RNG, no ordering
    dependence — hence exactly reproducible by a transitive-closure
    SQL oracle."""
    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .unionByName(pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("nb"))
        .select(F.col("u").alias("id"), F.least("u", "nb").alias("label"))
        .persist()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nb_label"))
        )
        # carry the previous label through the checkpoint so convergence
        # detection is a filter+count on the already-materialized rows
        # instead of a second join of new vs old labels (halves the
        # shuffles per round). The checkpoint is LAZY (r11): the
        # convergence count is the round's first job anyway, and a
        # count over a lazy local checkpoint materializes (and stores)
        # the full label partitions as a side effect of the RDD
        # checkpoint contract — one job per round instead of an eager
        # checkpoint job plus a rescan-and-count job.
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nb_label", F.col("label"))).alias("label"),
                F.col("label").alias("prev"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("prev")).count()
        labels.unpersist()
        labels = new_labels.drop("prev")
        if changed == 0:
            break
    else:  # pragma: no cover - needs a >max_iter-diameter chain
        edges.unpersist()
        # refusing loudly beats silently splitting one real component
        # into several clusters (r6 review: a 30-doc drifting-template
        # chain exceeds 25 min-label hops)
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} rounds "
            f"({changed} labels still moving) — a component's diameter "
            f"exceeds max_iter; raise max_iter"
        )
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


SIMHASH_BITS = 60  # 15 md5 hex chars -> engine-portable BIGINT


def simhash_signatures(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash over whitespace tokens: per bit, majority vote of
    token-hash bits (explode + 60 conditional sums, all codegen).

    The token hash is the repo's ENGINE-PORTABLE md5 convention
    (``conv(substr(md5(t),1,15),16,10)`` == DuckDB
    ``('0x'||substr(md5(t),1,15))::BIGINT``, 60 bits), not xxhash64:
    SimHash candidate generation has recall < 1 by design, so the only
    way an independent engine can reproduce the OUTPUT bit-for-bit is
    to reproduce the signatures themselves — this is what promoted
    ``dedup_simhash`` from a rows-only check to a full hash-checked
    oracle row (r6). md5 costs more per token than xxhash64, but the
    operator is not on the bench headline and the dedup decision
    quality is hash-agnostic."""
    tok = spread(docs).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("t"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("bigint")
    )
    votes = [
        F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_duplicates(
    docs: DataFrame,
    *,
    hamming_max: int = 3,
    threshold: float = 0.8,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash-bucketed candidates (four 15-bit bands over the 60-bit
    signature; Hamming<=k must match at least one band exactly),
    Hamming-filtered, then exact Jaccard-verified so the output is
    comparable to the brute-force baseline."""
    sig = simhash_signatures(docs, id_col=id_col, text_col=text_col).persist()
    band_bits = SIMHASH_BITS // 4
    mask = (1 << band_bits) - 1
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright("simhash", band_bits * i).bitwiseAND(F.lit(mask)).alias("bh"),
        )
        for i in range(4)
    ]
    buckets = _cap_buckets(
        sig.select(
            F.col(id_col), F.col("simhash"), F.explode(F.array(*bands)).alias("bk")
        ).select(id_col, "simhash", "bk.band", "bk.bh"),
        max_bucket_size,
    )
    a = buckets.select(F.col(id_col).alias("a_id"), F.col("simhash").alias("sa"), "band", "bh")
    b = buckets.select(F.col(id_col).alias("b_id"), F.col("simhash").alias("sb"), "band", "bh")
    candidates = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= hamming_max)
        .select("a_id", "b_id")
        .distinct()
    )
    out = _verify_pairs(
        docs, candidates, n=n, threshold=threshold, id_col=id_col, text_col=text_col
    )
    sig.unpersist()
    return out


def cluster_weighted_sample(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "cws",
) -> DataFrame:
    """Soft dedup by cluster-weighted sampling (the SemDeDup/D4-family
    alternative to hard keep-one-per-cluster): every document keeps
    with probability 1 / |its near-dup cluster|, so each duplicate
    family contributes ~one document IN EXPECTATION while unique
    documents always survive — the sampling view of dedup used when a
    pipeline wants to down-weight rather than eliminate duplication.

    Deterministic and engine-exact: the keep decision is an INTEGER
    comparison ``md5_hash32(salt:doc_id) * cluster_size < 2^32``
    (P = 1/size exactly; the md5-derived 32-bit hash is the
    engine-portable content hash from ``scale._md5_hash32``, so a SQL
    oracle reproduces every decision bit-for-bit, and the decision is
    reshuffle-stable — no partition-local RNG). Clusters come from
    ``duplicate_clusters`` over the given near-dup ``pairs``; docs in
    no cluster form singletons (size 1, always kept).

    Output: (id, cluster_id, cluster_size, keep). Scale: one cluster
    aggregation + two equi-joins keyed by doc/cluster id; the integer
    product stays in range for cluster sizes < 2^31 (a single
    2-billion-doc duplicate family is already a data-quality incident,
    not a sampling problem)."""
    from .scale import _md5_hash32

    clusters = duplicate_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    j = (
        docs.select(F.col(id_col))
        .join(clusters.withColumnRenamed("doc_id", id_col), id_col, "left")
        .join(sizes, "cluster_id", "left")
    )
    size = F.coalesce(F.col("cluster_size"), F.lit(1).cast("long"))
    # Singleton fallback uses the doc's OWN id as its cluster id — no
    # cast: cluster ids inherit the id column's type (duplicate_clusters
    # labels are min doc ids), and a hard cast("long") crashes under
    # ANSI for the string ids every other dedup operator supports.
    cluster = F.coalesce(F.col("cluster_id"), F.col(id_col))
    u32 = _md5_hash32([F.lit(salt), F.col(id_col).cast("string")])
    return j.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        size.alias("cluster_size"),
        ((u32 * size) < F.lit(2**32).cast("bigint")).alias("keep"),
    )


def cluster_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Canonical-document selection — the step after clustering in
    every dedup pipeline: per duplicate cluster, KEEP the
    highest-quality member (ties to the smallest id, so the choice is
    deterministic) and mark the rest for dropping. One window over the
    cluster key; cluster sizes are small by construction (near-dup
    groups), so the partitioned sort never skews."""
    from pyspark.sql import Window

    j = clusters.join(scores, id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .select(
            F.col(id_col),
            F.col("cluster_id"),
            F.col(score_col),
            (F.col("__rn") == 1).alias("keep"),
        )
    )


def signature_changelog(
    docs: DataFrame,
    table_id: str,
    *,
    n: int = 5,
    k: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    version: int = 1,
) -> DataFrame:
    """Changelog that maintains a PERSISTED MinHash signature index as
    a catalog-managed table beside the corpus: apply it through the
    same engine as any CDC feed and the index inherits versioning,
    time travel, idempotent replay, and bucket-pruned reads for free.
    Emit one per ingested batch (after the batch passed dedup) with a
    fresh ``version``; rows are (id, mh0..mh{k-1}) BIGINTs — exact
    through the envelope's string round-trip."""
    from ..changelog import snapshot_changelog

    sigs = minhash_signatures(
        shingles(docs, n=n, id_col=id_col, text_col=text_col, distinct=False),
        k=k,
        id_col=id_col,
    )
    return snapshot_changelog(sigs, table_id, [id_col], insert_version=version)


def refresh_signature_index(
    spark,
    catalog,
    base_table: str,
    index_table: str,
    *,
    n: int = 5,
    k: int = 128,
    text_col: str = "text",
    from_version: int | None = None,
) -> dict:
    """Incremental refresh of a PERSISTED MinHash signature index
    (``signature_changelog`` table) after its base corpus table moved:
    diff the base between the index's recorded refresh watermark and
    the current catalog version (``TableCatalog.table_changes`` — a
    bucket-co-located PK diff, O(changed rows)), re-sign ONLY the
    inserted/updated documents, and emit DELETEs for ids that left the
    corpus. The standing corpus is never re-shingled — the same
    O(new + collisions) contract as ``minhash_lsh_against_index``,
    extended to the maintenance loop so ``apply.auto_maintain`` can
    keep the index fresh on a schedule (reference parity: the keyed
    sinks' stores rebuild secondary structures out-of-band;
    ``sink/CDCHBase.java`` leaves it to HBase entirely).

    Change versions stamp ``2*base_seq`` (deletes) / ``2*base_seq+1``
    (upserts) — monotone across refreshes and replay-idempotent within
    one, the ``derive.maintain_value_index`` convention. The refresh
    watermark (base catalog sequence version) persists in the INDEX
    table's meta under ``derived.refreshed_to``; ``from_version=None``
    self-derives from it, so a scheduled refresh needs no external
    state. Returns ``{"signed": n, "deleted": n, "refreshed_to": v}``
    (zero-work no-op when the base hasn't moved)."""
    from ..apply import apply_changelog
    from ..changelog import OP_DELETE, OP_INSERT, dml_records

    meta = catalog.meta(base_table)
    if meta is None or meta["schema"] is None:
        raise KeyError(f"unknown table {base_table!r}")
    (id_col,) = list(meta["pks"])  # doc-grain index: single-PK contract
    imeta = catalog.meta(index_table) or {}
    derived = dict(imeta.get("derived") or {})
    versions = catalog.versions(base_table)
    cur = int(versions[-1])
    frm = from_version if from_version is not None else int(derived.get("refreshed_to", 0) or 0)
    if frm >= cur:
        return {"signed": 0, "deleted": 0, "refreshed_to": frm, "resync": False}
    resync = frm not in versions  # diff basis vacuumed away, or frm==0
    if resync:
        # Full resync fallback — the ONLY correct move once the
        # incremental basis is gone: re-sign every current doc and
        # delete index ids no longer in the base. Never reachable
        # through auto_maintain (vacuum's protect_from keeps the
        # basis); covers manual vacuums and pre-first-version
        # registration.
        base = catalog.read(spark, base_table)
        upserted = base.select(id_col, text_col)
        gone = (
            catalog.read(spark, index_table)
            .select(id_col)
            .join(base.select(id_col), id_col, "left_anti")
            if imeta.get("current") is not None
            else upserted.select(id_col).limit(0)
        )
    else:
        changes = catalog.table_changes(spark, base_table, frm, cur).persist()
        upserted = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, text_col)
        gone = changes.filter(F.col("_change_type") == "delete").select(id_col)
    try:
        sigs = minhash_signatures(
            shingles(upserted, n=n, id_col=id_col, text_col=text_col, distinct=False),
            k=k,
            id_col=id_col,
        )
        ups = dml_records(
            sigs, index_table, [id_col], op=OP_INSERT, version=2 * cur + 1
        )
        dels = dml_records(
            gone, index_table, [id_col], op=OP_DELETE, version=2 * cur, keys_only=True
        )
        if resync:
            # the two sides are different frames (full base vs anti-join)
            signed = upserted.count()
            deleted = gone.count()
        else:
            # Both counts are conditional tallies over the SAME persisted
            # change diff — one aggregate action materializes the cache
            # and returns both, instead of two counts (r11).
            r = changes.agg(
                F.count(
                    F.when(
                        F.col("_change_type").isin("insert", "update_postimage"), 1
                    )
                ).alias("s"),
                F.count(F.when(F.col("_change_type") == "delete", 1)).alias("d"),
            ).first()
            signed, deleted = int(r["s"]), int(r["d"])
        if signed or deleted:
            apply_changelog(spark, dels.unionByName(ups), catalog)
    finally:
        if not resync:
            changes.unpersist()
    if derived.get("base"):
        # advance the registered watermark; an UNREGISTERED standalone
        # call (caller tracks from_version itself) must not synthesize
        # a partial derived record — maintenance_report would choke on
        # a record with no base
        catalog.update_meta(
            index_table,
            # apply may have rewritten the meta — merge into the fresh
            # read; the atomicity comes from update_meta's backend
            # contract (lock locally, conditional PUT remotely)
            lambda m: {**(m or imeta), "derived": {**derived, "refreshed_to": cur}},
        )
    return {"signed": signed, "deleted": deleted, "refreshed_to": cur, "resync": resync}


def minhash_lsh_against_index(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    corpus_docs: DataFrame,
    *,
    n: int = 5,
    k: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The persisted-index realization of ``minhash_lsh_against``'s
    scale contract: corpus signatures come from a MAINTAINED table
    (``signature_changelog`` applied into the catalog), so the corpus
    is never re-shingled or re-signed per batch, and its TEXT is
    touched only for docs that actually collide (the verify's
    semi-join lands below the shingle explode). Per-batch cost is
    O(new batch + collisions) against a standing corpus of any size —
    at 100 TB the difference between a daily job and a full re-scan.
    Output contract identical to ``minhash_lsh_against`` (a_id = new
    doc, b_id = corpus doc, exact-Jaccard verified), which is what
    lets the same cross-set brute-force oracle check it."""
    assert k % bands == 0
    rows = k // bands
    need = [f"mh{i}" for i in range(k)]
    missing = [c for c in need if c not in corpus_sigs.columns]
    if missing:
        raise ValueError(
            f"corpus_sigs lacks signature columns for k={k} "
            f"(first missing: {missing[0]}) — index built with a different k?"
        )
    # Disjoint-id contract on BOTH corpus sides (same reasoning as
    # minhash_lsh_against): an id present in both sets would union two
    # documents' shingle sets inside the exact-Jaccard verify and
    # corrupt every pair it touches — drop the corpus twin of any
    # new-batch id from the signatures AND the text side.
    new_ids = new_docs.select(id_col).distinct()
    corpus_sigs = corpus_sigs.select(id_col, *need).join(new_ids, id_col, "left_anti")
    corpus_docs = corpus_docs.join(new_ids, id_col, "left_anti")
    sh_new = shingles(new_docs, n=n, id_col=id_col, text_col=text_col, distinct=False)
    sig_new = minhash_signatures(sh_new, k=k, id_col=id_col).persist()
    sig_new.count()
    a = _cap_buckets(
        _band_buckets(sig_new, bands=bands, rows=rows, id_col=id_col), max_bucket_size
    ).select(F.col(id_col).alias("a_id"), "band", "bh")
    b = _cap_buckets(
        _band_buckets(corpus_sigs, bands=bands, rows=rows, id_col=id_col),
        max_bucket_size,
    ).select(F.col(id_col).alias("b_id"), "band", "bh")
    candidates = (
        a.join(b, ["band", "bh"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("__nb"))
        .filter(F.col("__nb") >= 2)
        .select("a_id", "b_id")
    )
    screened = _screen_candidates(
        sig_new.unionByName(corpus_sigs), candidates, k=k,
        threshold=threshold, id_col=id_col,
    )
    all_docs = new_docs.select(id_col, text_col).unionByName(
        corpus_docs.select(id_col, text_col)
    )
    out = _verify_pairs(
        all_docs, screened, n=n, threshold=threshold, id_col=id_col, text_col=text_col
    )
    sig_new.unpersist()
    return out


def cluster_size_report(
    docs: DataFrame, clusters: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Dedup impact report — the summary every dedup pipeline prints
    before anyone deletes anything: the cluster-SIZE histogram plus,
    per size, how many documents sit in such clusters and how many a
    keep-one-per-cluster policy would remove. Singletons (docs in no
    near-dup pair at all) appear as the size-1 row, so the histogram
    partitions the whole corpus and the removable column sums to the
    corpus-level reduction.

    ``clusters`` is ``duplicate_clusters`` output (docs with at least
    one pair). Two metadata-sized aggregations over the cluster table
    plus one corpus count — nothing here rescans text."""
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__sz"))
    hist = sizes.groupBy("__sz").agg(F.count(F.lit(1)).alias("n_clusters"))
    multi = hist.select(
        F.col("__sz").cast("bigint").alias("cluster_size"),
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        (F.col("__sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        ((F.col("__sz") - 1) * F.col("n_clusters")).cast("bigint").alias("n_removable"),
    )
    singles = (
        docs.agg(F.count(F.lit(1)).alias("__total"))
        .crossJoin(clusters.agg(F.count(F.lit(1)).alias("__clustered")))
        .select(
            F.lit(1).cast("bigint").alias("cluster_size"),
            (F.col("__total") - F.col("__clustered")).cast("bigint").alias("n_clusters"),
            (F.col("__total") - F.col("__clustered")).cast("bigint").alias("n_docs"),
            F.lit(0).cast("bigint").alias("n_removable"),
        )
    )
    return singles.unionByName(multi)


def jaccard_score_histogram_from_counts(
    pairs: DataFrame, *, buckets_per_unit: int = 20
) -> DataFrame:
    """Score histogram over pairs that already carry the exact
    (inter_k, n_a, n_b) shingle-set integers —
    ``minhash_lsh_duplicates(..., _with_counts=True)`` output. The
    band index is the SAME integer arithmetic as
    ``jaccard_score_histogram`` ((B*k) div (na+nb-k)), but the input
    integers come from the verify stage that already computed them, so
    the histogram is one projection + one aggregate over the verified
    pair rows instead of re-shingling the pair docs and re-joining the
    inverted index (a whole second O(near-dup docs) pipeline,
    measured ~7 s of dedup_score_histogram's 10 s at sf0.01)."""
    bucket = F.expr(f"({buckets_per_unit} * inter_k) div (n_a + n_b - inter_k)")
    return (
        pairs.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "bucket",
            (F.col("bucket").cast("double") / buckets_per_unit).alias("bucket_lo"),
            "n_pairs",
        )
    )


def jaccard_score_histogram(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    n: int = 5,
    buckets_per_unit: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup SCORE DISTRIBUTION over verified pairs — the
    threshold-tuning signal a dedup rollout reads before choosing its
    cut: how many pairs sit in each similarity band (a fat band just
    under the threshold means the knob is load-bearing; an empty one
    means it isn't). One row per 1/``buckets_per_unit`` band.

    The band index is INTEGER arithmetic on the exact shingle-set
    counts — ``(buckets_per_unit * k) div (na + nb - k)`` — never a
    float multiply of the rounded score, whose 1-ulp representation
    error flips bands at exact boundaries (0.35 * 20 is 6.999... in
    doubles but 7 in decimals; engines would disagree). Shingle sets
    are recomputed for PAIR DOCS ONLY (the `_verify_pairs` semi-join
    shape), so cost is O(near-dup docs), not O(corpus)."""
    # normalize pair orientation up front (r6 review, confirmed by
    # execution): the incremental paths (minhash_lsh_against[_index])
    # emit (new_id, corpus_id) pairs where a_id > b_id is routine, and
    # the a_id < b_id intersection filter silently dropped them from
    # the histogram
    pairs = pairs.select(
        F.least("a_id", "b_id").alias("a_id"),
        F.greatest("a_id", "b_id").alias("b_id"),
    )
    ids = (
        pairs.select(F.col("a_id").alias(id_col))
        .unionByName(pairs.select(F.col("b_id").alias(id_col)))
        .distinct()
    )
    cand = docs.join(ids, id_col, "left_semi")
    sh = shingles(cand, n=n, id_col=id_col, text_col=text_col, distinct=True)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    a = sh.select(F.col(id_col).alias("a_id"), "sh")
    b = sh.select(F.col(id_col).alias("b_id"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .join(pairs.select("a_id", "b_id"), ["a_id", "b_id"], "left_semi")
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("__k"))
    )
    ca = counts.select(F.col(id_col).alias("a_id"), F.col("__n").alias("__na"))
    cb = counts.select(F.col(id_col).alias("b_id"), F.col("__n").alias("__nb"))
    bucket = F.expr(f"({buckets_per_unit} * __k) div (__na + __nb - __k)")
    return (
        pairs.select("a_id", "b_id")
        .join(inter, ["a_id", "b_id"])
        .join(ca, "a_id")
        .join(cb, "b_id")
        .select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "bucket",
            (F.col("bucket").cast("double") / buckets_per_unit).alias("bucket_lo"),
            "n_pairs",
        )
    )
