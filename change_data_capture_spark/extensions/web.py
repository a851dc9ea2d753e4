"""Web-corpus curation operators: HTML boilerplate extraction and URL
canonicalization / URL-level deduplication.

Web-scrape pipelines run these BEFORE any content-level dedup: strip
markup so quality/langid/minhash see prose, and collapse the many URL
spellings of one page (tracking params, default ports, case-variant
hosts, trailing slashes) so a page crawled twice costs one document.

All pure Catalyst expressions — narrow maps plus (for URL dedup) one
hash-shuffle on the canonical URL, so both stream over a 100 TB crawl
table with zero Python in the loop. The regex cascades are deliberately
RE2-safe (inline (?si) flags, non-greedy, no backreferences in
patterns OR replacements) so the DuckDB oracle replays them verbatim;
replacement-string backrefs are avoided entirely because Spark (Java)
spells them ``$1`` while DuckDB (RE2) spells them ``\\1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Entity decode order matters: `&amp;` LAST so `&amp;lt;` decodes once
# to the literal `&lt;`, not twice to `<`.
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _clean_html_col(col: F.Column) -> F.Column:
    # the whole <head> subtree is boilerplate (title/meta/links); the
    # title is surfaced separately by html_extract
    out = F.regexp_replace(col, r"(?si)<head(\s[^>]*)?>.*?</head\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?si)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?si)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def html_extract(
    docs: DataFrame, *, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Markup -> prose: drop comments and <script>/<style> subtrees,
    strip remaining tags (replaced by spaces so adjacent words don't
    fuse), decode the six entities that dominate real HTML, collapse
    whitespace. Also surfaces the <title> text and the stripped/total
    length ratio — the standard "mostly boilerplate?" screen. One
    narrow map, no shuffle."""
    title = F.trim(
        F.regexp_replace(
            F.regexp_extract(F.col(html_col), r"(?si)<title[^>]*>(.*?)</title>", 1),
            r"\s+",
            " ",
        )
    )
    text = _clean_html_col(F.col(html_col))
    return docs.select(
        F.col(id_col),
        title.alias("title"),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
        F.round(
            F.length(text) / F.greatest(F.length(F.col(html_col)), F.lit(1)), 6
        ).alias("text_ratio"),
    )


_TRACKING_PARAM = r"(^|&)(utm_[^=&]*|fbclid|gclid|ref)=[^&]*"


def canonical_url(col: F.Column) -> F.Column:
    """One canonical spelling per page: lowercase scheme and host, drop
    the scheme-default port, drop the fragment, strip tracking params
    (utm_*, fbclid, gclid, ref), collapse a trailing slash. A string
    with no ``scheme://`` passes through VERBATIM — collapsing every
    malformed row to one synthetic key would dedup unrelated documents
    against each other, which is worse than not deduping them. Park-
    level heuristics (param reordering, mirror hosts) are out of scope
    — this is the deterministic normalization layer crawl dedup keys
    on."""
    scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = _canonical_hostport(col, scheme)
    path = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # query = text between the FIRST '?' before any '#' and the
    # fragment; an unanchored \? would also match a '?' inside the
    # fragment and resurrect fragment content as a query
    query = F.regexp_extract(col, r"^[^#]*?\?([^#]*)", 1)
    query = F.regexp_replace(query, _TRACKING_PARAM, "")
    query = F.regexp_replace(query, r"^&", "")
    return F.when(scheme == "", col).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
        )
    )


def _canonical_hostport(col: F.Column, scheme: F.Column) -> F.Column:
    """Lowercased host[:port] with only the scheme-DEFAULT port
    dropped — a non-default port is part of the origin and must
    survive both canonicalization and link resolution."""
    hostport = F.lower(F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return (
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )


def url_domain(col: F.Column) -> F.Column:
    """Registrable-host part of a URL (lowercased, port dropped)."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        r":[0-9]+$",
        "",
    )


def url_duplicates(
    docs: DataFrame, *, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """URL-level dedup: canonicalize, then per canonical URL keep the
    smallest doc id and report every other doc as a duplicate of it —
    same output contract as content-level ``dedup.exact_duplicates`` so
    the two compose into one drop list. One hash-shuffle on the
    canonical URL; crawl frontiers are effectively unskewed on full
    URLs, and a pathological hot URL still bounds the group to its
    recrawl count."""
    canon = docs.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("url_canon")
    ).filter(F.col("url_canon").isNotNull())
    # NULL urls are excluded, not grouped: Window.partitionBy puts all
    # nulls in ONE partition, which would report every url-less doc as
    # a duplicate of the smallest-id one — the synthetic-key collapse
    # canonical_url's contract forbids for malformed urls (r6 review)
    from pyspark.sql import Window

    keeper = F.min(id_col).over(Window.partitionBy("url_canon"))
    return (
        canon.withColumn("keeper_id", keeper)
        .filter(F.col(id_col) != F.col("keeper_id"))
        .select(F.col(id_col).alias("dup_id"), "keeper_id", "url_canon")
    )


def link_extract(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    base_url_col: str = "url",
) -> DataFrame:
    """Anchor/link extraction — the web-graph edge list behind link-
    based quality signals and crawl frontier expansion. One narrow map
    per doc (two regexp_extract_all passes zipped and exploded; the
    expansion factor is the per-page link count), no shuffle.

    Per link: the raw href, the anchor text (inner tags stripped), the
    href resolved against the page's own URL and canonicalized
    (absolute http(s) links, protocol-relative ``//host/...`` links
    taking the page's scheme, and root-relative paths resolved against
    the page's ORIGIN — scheme + host INCLUDING a non-default port;
    other schemes pass through verbatim), and whether it leaves the
    page's domain (null when not resolvable to a domain, e.g.
    mailto:)."""
    pat = r'(?si)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(pat), 1)
    texts = F.regexp_extract_all(F.col(html_col), F.lit(pat), 2)
    base_scheme = F.lower(
        F.regexp_extract(F.col(base_url_col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    base_netloc = _canonical_hostport(F.col(base_url_col), base_scheme)
    base_domain = url_domain(F.col(base_url_col))
    lk = docs.select(
        F.col(id_col),
        base_scheme.alias("__scheme"),
        base_netloc.alias("__base_netloc"),
        base_domain.alias("__base_dom"),
        F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("anchor"))).alias("lk"),
    ).select(
        id_col,
        "__scheme",
        "__base_netloc",
        "__base_dom",
        F.col("lk.href").alias("href"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("lk.anchor"), r"<[^>]+>", " "), r"\s+", " "
            )
        ).alias("anchor_text"),
    )
    abs_url = (
        # protocol-relative FIRST: '//host/path' takes the page scheme
        # (a bare startswith('/') test would misread it as a path)
        F.when(
            F.substring("href", 1, 2) == "//",
            F.concat(F.col("__scheme"), F.lit(":"), F.col("href")),
        )
        .when(
            F.substring("href", 1, 1) == "/",
            F.concat(
                F.col("__scheme"), F.lit("://"), F.col("__base_netloc"), F.col("href")
            ),
        )
        .when(F.col("href").rlike(r"(?i)^https?://"), F.col("href"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        lk.withColumn("__abs", abs_url)
        .select(
            id_col,
            "href",
            "anchor_text",
            F.when(F.col("__abs").isNotNull(), canonical_url(F.col("__abs")))
            .otherwise(F.col("href"))
            .alias("href_resolved"),
            F.when(
                F.col("__abs").isNotNull(),
                url_domain(F.col("__abs")) != F.col("__base_dom"),
            )
            .otherwise(F.lit(None).cast("boolean"))
            .alias("is_external"),
        )
    )


def domain_cap(
    docs: DataFrame,
    *,
    k: int,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Per-domain document cap — the anti-monoculture step crawl
    curation applies after URL dedup: keep at most ``k`` docs per
    domain, chosen by a deterministic content-independent order
    (md5 of the doc id, ties to the id) so the kept set is
    reshuffle-stable and grows stably as the crawl grows. Returns
    every doc with its in-domain rank and the keep verdict, so callers
    can either filter kept or audit what a cap would drop. One window
    over the domain key; post-URL-dedup domain groups are bounded by a
    site's page count, and the cap itself means only the first k rows
    per group matter."""
    from pyspark.sql import Window

    ranked = docs.select(
        F.col(id_col),
        url_domain(F.col(url_col)).alias("domain"),
    ).withColumn(
        "cap_rank",
        F.row_number().over(
            Window.partitionBy("domain").orderBy(
                F.md5(F.col(id_col).cast("string")), F.col(id_col)
            )
        ),
    )
    return ranked.select(
        id_col,
        "domain",
        F.col("cap_rank").cast("long").alias("cap_rank"),
        (F.col("cap_rank") <= k).alias("kept"),
    )


def domain_stats(
    docs: DataFrame, *, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Per-domain crawl profile (docs, distinct canonical pages,
    recrawl ratio) — the table a per-domain cap or mixture policy is
    derived from. One aggregation keyed by domain; the long tail of
    domains dominates row count so the groupBy is naturally spread."""
    canon = docs.select(
        F.col(id_col),
        url_domain(F.col(url_col)).alias("domain"),
        canonical_url(F.col(url_col)).alias("url_canon"),
    )
    return canon.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("url_canon").alias("n_pages"),
        # greatest(.., 1): the NULL-domain group's countDistinct is 0
        # (countDistinct skips nulls) and the division would die with
        # DIVIDE_BY_ZERO under ANSI (r6 review; same guard as
        # html_extract's text-length ratio)
        F.round(
            F.count(F.lit(1))
            / F.greatest(F.countDistinct("url_canon"), F.lit(1)),
            6,
        ).alias("recrawl_ratio"),
    )


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = 85,
    iters: int = 3,
) -> DataFrame:
    """Link-graph PageRank — the crawl-prioritization / page-quality
    signal a web corpus is weighted by (CommonCrawl publishes exactly
    this over its host graph). Pregel-shaped on DataFrames: each
    iteration is one join of the rank table onto the edge list keyed
    by source (both sides hash-partitioned on the node id, so AQE
    reuses the exchange across iterations) plus one aggregation keyed
    by destination — O(V+E) per round, 2 shuffles, no broadcast of
    anything O(V). ``localCheckpoint`` cuts the lineage each round so
    the plan stays constant-size at any iteration count.

    Engine-exact by construction: ranks live as BIGINT parts-per-
    trillion and every step is integer arithmetic (floor division for
    the out-degree split and the damping factor), so a SQL oracle
    unrolling the same iterations reproduces the hashes bit-for-bit —
    no float drift, no rounding-mode divergence. Dangling nodes keep
    the simplified-PageRank convention (their mass is not
    redistributed), which the oracle mirrors.
    """
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    scale = 10**12
    base = (scale * (100 - damping_pct)) // (100 * n)
    ranks = nodes.select("id", F.lit(scale // n).cast("long").alias("rank"))
    for it in range(iters):
        contribs = (
            e.join(ranks.join(outdeg, ranks.id == outdeg.src).select(
                "id", F.expr("rank div outdeg").alias("give")), e.src == F.col("id"))
            .groupBy("dst")
            .agg(F.sum("give").alias("incoming"))
        )
        # Intermediate rounds checkpoint LAZILY (r11): the lineage cut
        # (LogicalRDD) happens at construction either way, but only the
        # LAST round pays an eager materialization job — it must run
        # while the edge/node caches are still alive (the unpersist
        # below), and it computes the lazy intermediate checkpoints as
        # dependencies in the same job instead of one job per round.
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (F.lit(base) + F.expr(
                    f"({damping_pct} * coalesce(incoming, 0L)) div 100"
                )).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=(it == iters - 1))
        )
    e.unpersist()
    nodes.unpersist()
    return ranks.select("id", F.col("rank").alias("rank_ppt"))


def pagerank_full(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = 85,
    max_iters: int = 6,
    eps_ppt: int = 1_000_000,
) -> DataFrame:
    """PageRank with the two standard-convention knobs ``pagerank``
    deliberately simplifies away:

    - **Dangling-mass redistribution**: each round, the rank mass
      sitting on nodes with no out-edges is split uniformly across ALL
      nodes (the Brin/Page convention) instead of leaking out of the
      system — a real web graph is full of crawl-frontier leaves, and
      without this the total mass (and therefore every rank) decays.
    - **L1-delta early stop**: the loop ends once one round moves less
      than ``eps_ppt`` total rank (parts-per-trillion), so a
      fast-mixing graph doesn't pay for ``max_iters`` rounds.

    Integer-exact like ``pagerank`` (BIGINT parts-per-trillion, floor
    division everywhere) so the unrolled SQL oracle reproduces it
    bit-for-bit. The early stop is oracle-safe because a FIXED
    ``max_iters`` unrolling with a per-round freeze flag (once any
    round's delta <= eps, later rounds copy ranks through unchanged)
    computes exactly what the broken-out loop computes.

    Scale: per round, one extra O(dangling) semi-join + 1-row
    aggregate folded into the rank update plan (broadcast of a single
    row), and the convergence check is an aggregate over the
    already-materialized (localCheckpoint) rank table — the only
    driver-side value is that one delta per round, same contract as
    ``dedup.duplicate_clusters``."""
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    dangling = nodes.join(outdeg, nodes.id == outdeg.src, "left_anti")
    scale = 10**12
    base = (scale * (100 - damping_pct)) // (100 * n)
    ranks = nodes.select("id", F.lit(scale // n).cast("long").alias("rank"))
    for _ in range(max_iters):
        dsum = dangling.join(ranks, "id").agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dsum")
        )
        contribs = (
            e.join(
                ranks.join(outdeg, ranks.id == outdeg.src).select(
                    "id", F.expr("rank div outdeg").alias("give")
                ),
                e.src == F.col("id"),
            )
            .groupBy("dst")
            .agg(F.sum("give").alias("incoming"))
        )
        prev = ranks.select(F.col("id").alias("__pid"), F.col("rank").alias("prev"))
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .join(prev, nodes.id == F.col("__pid"))
            .crossJoin(F.broadcast(dsum))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(incoming, 0L) + dsum div {n})) div 100"
                    )
                ).cast("long").alias("rank"),
                "prev",
            )
            # lazy (r11): the delta aggregate below is the round's
            # first job anyway and materializes the checkpoint as a
            # side effect — one job per round, not checkpoint + rescan
            .localCheckpoint(eager=False)
        )
        delta = ranks.select(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("d")).first()["d"]
        ranks = ranks.drop("prev")
        if delta is not None and int(delta) <= eps_ppt:
            break
    e.unpersist()
    nodes.unpersist()
    outdeg.unpersist()
    return ranks.select("id", F.col("rank").alias("rank_ppt"))


def hits(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
) -> DataFrame:
    """Kleinberg's HITS hubs-and-authorities (JACM 1999, public) — the
    directory-page / content-page decomposition PageRank can't see: a
    page that LINKS to many high-authority pages is a good hub (a
    curated index), a page linked FROM many good hubs is a good
    authority. The web-curation use beside ``pagerank``: keep
    authorities as content, treat extreme hub-only pages as link farms
    / boilerplate candidates.

    Run in the UNNORMALIZED integer form: HITS's per-step
    normalization is a positive scalar that never changes the RANKING
    (only the display scale), so the loop stays in pure BIGINT —
    hub_0 = 1 everywhere; each round
    ``auth(p) = sum(hub(q) : q->p)`` then
    ``hub(p) = sum(auth(r) : p->r)``. After k rounds the counts equal
    the number of alternating paths into/out of each node — exact
    integers the unrolled SQL oracle reproduces bit-for-bit, no float
    drift, no normalization-order ambiguity. Display scores divide by
    the corpus max at the END (two exact BIGINTs, one double
    division) so thresholds see the conventional [0, 1] scale.

    Overflow headroom: counts grow by ~(max in-degree x max
    out-degree) per round; with the default 2 rounds BIGINT holds up
    to degree products of ~3e4 per round (9e18 total). For deeper
    runs or degree-skewed 100 TB graphs, cap degrees upstream
    (``domain_cap``) or lower ``iters`` — documented knob, same
    contract as ``pagerank``'s fixed-round integer arithmetic.

    Scale: per round two hash-shuffled join+agg pairs keyed by src/dst
    (the exact Pregel shape of ``pagerank``), lineage cut per round by
    ``localCheckpoint``; nothing driver-side but the two final max
    scalars (broadcast single-row join)."""
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    hub = nodes.select("id", F.lit(1).cast("long").alias("hub"))
    auth = nodes.select("id", F.lit(0).cast("long").alias("auth"))
    for _ in range(iters):
        a = (
            e.join(hub.withColumnRenamed("id", "__hid"), e.src == F.col("__hid"))
            .groupBy("dst")
            .agg(F.sum("hub").alias("__a"))
        )
        auth = nodes.join(a, nodes.id == a.dst, "left").select(
            "id", F.coalesce("__a", F.lit(0)).cast("long").alias("auth")
        )
        h = (
            e.join(auth.withColumnRenamed("id", "__aid"), e.dst == F.col("__aid"))
            .groupBy("src")
            .agg(F.sum("auth").alias("__h"))
        )
        hub = (
            nodes.join(h, nodes.id == h.src, "left")
            .select("id", F.coalesce("__h", F.lit(0)).cast("long").alias("hub"))
            # lazy (r11): the eager scores checkpoint below computes the
            # per-round hub checkpoints as dependencies in ONE job
            # (lineage is still cut per round at construction)
            .localCheckpoint(eager=False)
        )
    # cut the final lineage BEFORE releasing the edge/node caches (the
    # same contract as pagerank's per-round checkpoints): the joined
    # scores feed both the maxima aggregate and the projection, so
    # without this the edge-distinct shuffles would recompute twice
    # after unpersist
    scores = auth.join(hub, "id").localCheckpoint()
    maxima = scores.agg(F.max("auth").alias("__am"), F.max("hub").alias("__hm"))
    out = (
        scores
        .crossJoin(F.broadcast(maxima))
        .select(
            "id",
            F.col("auth").alias("auth_paths"),
            F.col("hub").alias("hub_paths"),
            F.when(
                F.col("__am") > 0,
                F.round(F.col("auth").cast("double") / F.col("__am"), 9),
            ).alias("auth_score"),
            F.when(
                F.col("__hm") > 0,
                F.round(F.col("hub").cast("double") / F.col("__hm"), 9),
            ).alias("hub_score"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


def blocklist_filter(
    docs: DataFrame,
    rules: DataFrame,
    *,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """URL/domain blocklist gate — the UT1-style exclusion step C4 and
    RefinedWeb run before any content filtering (and the reference's
    table-whitelist filter inverted to a denylist, CDC.java allow-list
    semantics): every doc gets a keep/drop verdict plus the rule that
    fired.

    ``rules`` carries (pattern, kind): kind='domain' blocks the exact
    registrable host AND every subdomain of it (suffix match on label
    boundaries); kind='url_prefix' blocks canonical URLs starting with
    the pattern. Both legs stay equi-joins at any rule-list size:

    - the domain leg explodes each doc's host into its dotted suffixes
      (bounded by label count, <= ~6 on real hosts) and equi-joins
      suffix == pattern — never a LIKE/endswith theta-join;
    - the prefix leg equi-joins on the RULE's own domain first, so the
      residual ``startswith`` runs on a candidate set already confined
      to that domain's docs.

    Matched rules collapse to a deterministic min() per doc; one
    doc-keyed shuffle total on top of the joins. The rule table is
    dimension-sized, so AQE broadcasts it without an explicit hint."""
    canon = docs.select(
        F.col(id_col),
        canonical_url(F.col(url_col)).alias("url_canon"),
    ).withColumn("domain", url_domain(F.col("url_canon")))

    dom_rules = rules.filter(F.col("kind") == "domain").select(
        F.col("pattern").alias("__pat")
    )
    # the PATTERN goes through the same canonicalization as the doc
    # urls it is compared against (r6 review): a raw mixed-case or
    # slash-terminated rule ('http://Ads.Example.com/banner/') would
    # never prefix-match a canonical url and silently under-block
    pre_rules = rules.filter(F.col("kind") == "url_prefix").select(
        F.col("pattern").alias("rule"),
        canonical_url(F.col("pattern")).alias("__pat"),
        url_domain(F.col("pattern")).alias("__pat_dom"),
    )

    # dotted-suffix explode: 'a.b.example.com' -> that + 'b.example.com'
    # + 'example.com' + 'com' (substring_index from the right keeps
    # label alignment for free)
    n_labels = F.size(F.split(F.col("domain"), r"\."))
    suffixes = canon.select(
        F.col(id_col),
        "domain",
        F.explode(F.sequence(F.lit(1), n_labels)).alias("__k"),
    ).select(
        F.col(id_col),
        F.expr("substring_index(domain, '.', -__k)").alias("__suffix"),
    )
    dom_hits = suffixes.join(
        dom_rules, suffixes["__suffix"] == dom_rules["__pat"]
    ).select(F.col(id_col), F.col("__pat").alias("rule"))

    pre_hits = (
        canon.join(pre_rules, canon["domain"] == pre_rules["__pat_dom"])
        .filter(F.col("url_canon").startswith(F.col("__pat")))
        .select(F.col(id_col), "rule")  # report the rule AS WRITTEN
    )

    matches = (
        dom_hits.unionByName(pre_hits)
        .groupBy(id_col)
        .agg(F.min("rule").alias("matched_rule"))
    )
    return canon.join(matches, on=id_col, how="left").select(
        F.col(id_col),
        "domain",
        F.col("matched_rule").isNotNull().alias("blocked"),
        "matched_rule",
    )
