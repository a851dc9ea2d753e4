"""Web-curation operators: HTML boilerplate extraction, URL
canonicalization / URL-level dedup, per-domain crawl stats.

Hand-built golden cases pin the cascade ordering (scripts stripped
BEFORE tags, entities decoded AFTER tags) and each canonicalization
rule individually; the oracle queries (web_html_extract, web_url_dedup,
web_domain_stats) cross-check the same expressions against DuckDB at
corpus shape."""

from pyspark.sql import functions as F

from change_data_capture_spark.extensions import web


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_html_extract_strips_scripts_before_tags(spark):
    html = (
        '<html><head><title> My  Page </title><style>p {color:red}</style></head>'
        '<body><!-- note --><h1>Head</h1><p>one <b>two</b></p>'
        '<script>if (1 < 2) { x = "</p>"; }</script>tail</body></html>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = _one(web.html_extract(df))
    assert r.title == "My Page"
    # whole <head> subtree dropped (title surfaced separately); script
    # body (with its bare '<' and '</p>' literal) fully gone; tags
    # replaced by spaces so words never fuse
    assert r.text == "Head one two tail"
    assert r.n_chars == len(r.text)
    assert 0 < r.text_ratio < 1


def test_html_extract_decodes_entities_after_tags(spark):
    # entity decode AFTER tag strip: encoded markup survives as text
    html = "<p>a &lt;b&gt; &amp;amp; &quot;q&quot; &#39;s&#39;&nbsp;z</p>"
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = _one(web.html_extract(df))
    assert r.text == 'a <b> &amp; "q" \'s\' z'
    assert r.title == ""


def test_canonical_url_rules(spark):
    cases = [
        # lowercase scheme+host, strip default port, add root path
        ("HTTPS://Ex.COM:443", "https://ex.com/"),
        ("http://EX.com:80/a", "http://ex.com/a"),
        # non-default port kept; path case kept
        ("https://ex.com:8443/A/B/", "https://ex.com:8443/A/B"),
        # fragment dropped, tracking params dropped, real params kept
        ("https://ex.com/p?utm_source=x&id=3&gclid=g#top", "https://ex.com/p?id=3"),
        # all-tracking query collapses to no query
        ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
        ("https://ex.com/p?ref=rss", "https://ex.com/p"),
        # a '?' INSIDE the fragment is fragment content, not a query
        ("https://ex.com/p#sec?x=1", "https://ex.com/p"),
        # schemeless/malformed rows pass through verbatim — collapsing
        # them all to one synthetic key would dedup unrelated docs
        ("example.com/a", "example.com/a"),
        ("other.org/b", "other.org/b"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(web.canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_duplicates_keep_smallest_id(spark):
    df = spark.createDataFrame(
        [
            (1, "https://Ex.com/a?utm_x=1"),
            (2, "HTTPS://ex.com:443/a"),
            (3, "https://ex.com/a/"),
            (4, "https://ex.com/b"),
        ],
        "doc_id long, url string",
    )
    out = web.url_duplicates(df).orderBy("dup_id").collect()
    assert [(r.dup_id, r.keeper_id, r.url_canon) for r in out] == [
        (2, 1, "https://ex.com/a"),
        (3, 1, "https://ex.com/a"),
    ]


def test_domain_stats_counts_recrawls(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x"),
            (2, "https://A.com:443/x/"),
            (3, "https://a.com/y"),
            (4, "http://b.org/z"),
        ],
        "doc_id long, url string",
    )
    rows = {r.domain: r for r in web.domain_stats(df).collect()}
    assert rows["a.com"].n_docs == 3
    assert rows["a.com"].n_pages == 2
    assert rows["a.com"].recrawl_ratio == 1.5
    assert rows["b.org"].n_docs == 1 and rows["b.org"].n_pages == 1


def test_link_extract_resolves_and_classifies(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "https://My.Site.com/page",
                '<p><a href="/a/b?utm_x=1">In <b>here</b></a>'
                '<a class="z" href="HTTP://Other.ORG:80/c">out</a>'
                '<a href="mailto:x@y.z">mail</a>'
                '<a href="#frag">skip-me-not</a></p>',
            ),
            (2, "https://my.site.com/", "<p>no links</p>"),
        ],
        "doc_id long, url string, html string",
    )
    rows = web.link_extract(df).orderBy("doc_id", "href").collect()
    got = [(r.href, r.anchor_text, r.href_resolved, r.is_external) for r in rows]
    assert got == [
        ("#frag", "skip-me-not", "#frag", None),  # not resolvable -> verbatim
        ("/a/b?utm_x=1", "In here", "https://my.site.com/a/b", False),
        ("HTTP://Other.ORG:80/c", "out", "http://other.org/c", True),
        ("mailto:x@y.z", "mail", "mailto:x@y.z", None),
    ]
    # linkless docs simply contribute no edges
    assert all(r.doc_id == 1 for r in rows)


def test_link_extract_protocol_relative_and_port_preserving(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "https://ex.com:8443/page",
                '<p><a href="//CDN.other.net/x.js">cdn</a>'
                '<a href="/api/v1">api</a></p>',
            ),
        ],
        "doc_id long, url string, html string",
    )
    rows = {r.href: r for r in web.link_extract(df).collect()}
    # protocol-relative: page scheme attached, NOT treated as a path
    assert rows["//CDN.other.net/x.js"].href_resolved == "https://cdn.other.net/x.js"
    assert rows["//CDN.other.net/x.js"].is_external is True
    # root-relative: resolved against the page ORIGIN incl. its
    # non-default port
    assert rows["/api/v1"].href_resolved == "https://ex.com:8443/api/v1"
    assert rows["/api/v1"].is_external is False


def test_domain_cap_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"https://{'a' if i % 2 else 'b'}.com/p{i}") for i in range(20)],
        "doc_id long, url string",
    )
    out = web.domain_cap(df, k=3)
    rows = out.collect()
    assert len(rows) == 20  # every doc is ranked, kept or not
    kept = [r for r in rows if r.kept]
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.domain, []).append(r.cap_rank)
    assert all(len(v) == 3 and sorted(v) == [1, 2, 3] for v in by_dom.values())
    # reshuffle-stable: same verdicts from a repartitioned input
    again = {
        (r.doc_id, r.kept)
        for r in web.domain_cap(df.repartition(7), k=3).collect()
    }
    assert again == {(r.doc_id, r.kept) for r in rows}


def test_canonical_url_idempotent_on_generated_urls(spark):
    """canon(canon(u)) == canon(u): a canonicalized URL must survive a
    second pass unchanged, for every combination of scheme/host case,
    default and explicit ports, path depth/trailing slashes, tracking
    and real params, and fragments — the invariant that makes the
    dedup key stable when pipelines re-ingest their own output."""
    import itertools

    urls = []
    for scheme, host, port, path, q, frag in itertools.product(
        ("https", "HTTP"),
        ("Ex.COM", "sub.ex.org"),
        ("", ":443", ":8080"),
        ("", "/", "/A/b/", "/p"),
        ("", "?utm_a=1", "?id=2&utm_b=x&z=3", "?utm_a=1&utm_b=2"),
        ("", "#frag"),
    ):
        urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(web.canonical_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", web.canonical_url(F.col("c1")).alias("c2")
    ).filter(F.col("c1") != F.col("c2"))
    bad = twice.collect()
    assert bad == [], bad[:5]


def test_web_plans_stay_jvm_side_and_narrow(spark, sf_dir):
    from change_data_capture_spark import registry

    qs = registry.queries()
    for name in ("web_html_extract", "web_url_dedup", "web_domain_stats"):
        plan = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
    # HTML extraction is a pure narrow map — no shuffle at any scale
    plan = (
        qs["web_html_extract"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pagerank_hand_computed_one_iteration(spark):
    # A(1)->B(2), A->C(3), B->C, C->A; n=3, outdeg A=2, B=1, C=1.
    # r0 = 10^12 // 3 = 333333333333 each; base = 15*10^12 // 300.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {
        r.id: r.rank_ppt for r in web.pagerank(edges, iters=1).collect()
    }
    base = (10**12 * 15) // (100 * 3)
    assert got == {
        1: base + (85 * 333333333333) // 100,          # from C
        2: base + (85 * (333333333333 // 2)) // 100,   # from A (half)
        3: base + (85 * (333333333333 // 2 + 333333333333)) // 100,
    }


def test_pagerank_mass_conserved_and_deterministic(spark):
    # ring + chords: every node has out-links, so total mass stays
    # within n units of floor-division loss of the full 10^12 per round
    edges = spark.createDataFrame(
        [(i, (i + 1) % 7) for i in range(7)]
        + [(i, (i + 3) % 7) for i in range(7)],
        "src long, dst long",
    )
    r1 = web.pagerank(edges, iters=3)
    r2 = web.pagerank(edges.repartition(13), iters=3)
    rows1 = sorted((r.id, r.rank_ppt) for r in r1.collect())
    rows2 = sorted((r.id, r.rank_ppt) for r in r2.collect())
    assert rows1 == rows2, "pagerank must be partitioning-invariant"
    total = sum(v for _, v in rows1)
    # floor losses only: <= (edges + nodes + 1) units per iteration
    assert 10**12 - 3 * (14 + 7 + 1) <= total <= 10**12


def _pagerank_full_reference(edge_list, damping_pct=85, max_iters=6, eps_ppt=1_000_000):
    """Integer-exact Python replay of web.pagerank_full."""
    e = sorted(set(edge_list))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    scale = 10**12
    base = (scale * (100 - damping_pct)) // (100 * n)
    ranks = {i: scale // n for i in nodes}
    for _ in range(max_iters):
        dsum = sum(r for i, r in ranks.items() if i not in outdeg)
        incoming = {i: 0 for i in nodes}
        for u, v in e:
            incoming[v] += ranks[u] // outdeg[u]
        new = {
            i: base + (damping_pct * (incoming[i] + dsum // n)) // 100 for i in nodes
        }
        delta = sum(abs(new[i] - ranks[i]) for i in nodes)
        ranks = new
        if delta <= eps_ppt:
            break
    return ranks


def test_pagerank_full_redistributes_dangling_mass(spark):
    # 1 -> 2 -> 3; node 3 is dangling. Without redistribution its mass
    # leaks; with it, totals stay near 1.0 and match the int reference.
    edge_list = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.id: r.rank_ppt
        for r in web.pagerank_full(edges, max_iters=4, eps_ppt=0).collect()
    }
    want = _pagerank_full_reference(edge_list, max_iters=4, eps_ppt=0)
    assert got == want, f"{got} != {want}"
    # mass conservation (up to floor-division dust): 3 nodes, ~1e12
    assert sum(got.values()) > 10**12 - 100

    # the simplified convention leaks the dangling mass instead
    leaky = {r.id: r.rank_ppt for r in web.pagerank(edges, iters=4).collect()}
    assert sum(leaky.values()) < sum(got.values())


def test_hits_hand_computed_two_rounds(spark):
    # A(1)->B(2), A->C(3), B->C, C->A; hub_0 = 1 everywhere.
    # round 1: auth = in-degree (A:1 B:1 C:2); hub A:3 B:2 C:1
    # round 2: auth A:1 B:3 C:5; hub A:8 B:5 C:1; maxima am=5 hm=8
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {r["id"]: r for r in web.hits(edges, iters=2).collect()}
    assert {i: got[i]["auth_paths"] for i in (1, 2, 3)} == {1: 1, 2: 3, 3: 5}
    assert {i: got[i]["hub_paths"] for i in (1, 2, 3)} == {1: 8, 2: 5, 3: 1}
    assert got[3]["auth_score"] == 1.0 and got[1]["hub_score"] == 1.0
    assert got[2]["auth_score"] == round(3 / 5, 9)
    assert got[2]["hub_score"] == round(5 / 8, 9)
    assert got[1]["auth_score"] == round(1 / 5, 9)
    assert got[3]["hub_score"] == round(1 / 8, 9)


def test_hits_deterministic_under_repartition(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 11) for i in range(40)]
        + [(i, (i + 1) % 13) for i in range(40)],
        "src long, dst long",
    )
    a = sorted(tuple(r) for r in web.hits(edges, iters=2).collect())
    b = sorted(tuple(r) for r in web.hits(edges.repartition(17), iters=2).collect())
    assert a == b, "hits must be partitioning-invariant"


def test_pagerank_full_early_stop_matches_fixed_depth(spark):
    # A 4-cycle is at its fixpoint immediately (uniform ranks, outdeg 1
    # everywhere): round 1 moves ~nothing, so the loop must stop early
    # and STILL equal the frozen fixed-depth unrolling (i.e. running
    # with max_iters=1 gives the same answer as max_iters=6).
    edge_list = [(1, 2), (2, 3), (3, 4), (4, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    deep = {r.id: r.rank_ppt for r in web.pagerank_full(edges, max_iters=6).collect()}
    shallow = {r.id: r.rank_ppt for r in web.pagerank_full(edges, max_iters=1).collect()}
    want = _pagerank_full_reference(edge_list, max_iters=6)
    assert deep == want == shallow


def test_pagerank_matches_python_int_reference(spark):
    """Independent check (not the SQL oracle, which shares the
    formula): replay the simplified-convention integer PageRank in
    plain Python over a random-ish graph and require bit equality."""
    edge_list = [(i, (i * 7 + 3) % 23) for i in range(40)] + [
        (i, (i * 13 + 5) % 17) for i in range(40)
    ]
    edge_list = [(u, v) for u, v in edge_list if u != v]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.id: r.rank_ppt for r in web.pagerank(edges, iters=3).collect()}

    e = sorted(set(edge_list))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    scale = 10**12
    base = (scale * 15) // (100 * n)
    ranks = {i: scale // n for i in nodes}
    for _ in range(3):
        incoming = {i: 0 for i in nodes}
        for u, v in e:
            incoming[v] += ranks[u] // outdeg[u]
        ranks = {i: base + (85 * incoming[i]) // 100 for i in nodes}
    assert got == ranks


def test_url_domain_matches_urllib_reference(spark):
    """Independent fuzz check: for well-formed URLs, url_domain must
    agree with Python's urllib hostname (+ the parsing conventions the
    docstring claims: lowercase, port dropped). Userinfo URLs are out
    of the operator's documented scope (crawl corpora don't carry
    credentials) and are excluded."""
    import random
    from urllib.parse import urlsplit

    rng = random.Random(99)
    schemes = ["http", "https", "HTTP", "ftp"]
    hosts = ["Example.COM", "sub.domain.org", "xn--bcher-kva.ch", "192.168.0.1", "a.b.c.d.e.museum"]
    ports = ["", ":80", ":443", ":8080", ":65535"]
    paths = ["", "/", "/a/b", "/a%20b/c", "/index.html"]
    queries = ["", "?x=1", "?utm_source=t&x=2", "?a=b#frag", "#only-frag"]
    urls = []
    for _ in range(60):
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + rng.choice(queries)
        )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["d"]
        for r in df.select("url", web.url_domain(F.col("url")).alias("d")).collect()
    }
    for u in urls:
        want = (urlsplit(u).hostname or "").lower()
        assert got[u] == want, f"{u}: {got[u]!r} != {want!r}"


def test_blocklist_domain_rule_matches_label_suffixes_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://bad.example.com/a"),
            (2, "https://www.deep.bad.example.com/b"),
            (3, "https://notbad.example.com/c"),  # substring, NOT a label suffix
            (4, "https://bad.example.com.evil.org/d"),  # suffix is evil.org
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("bad.example.com", "domain")], "pattern string, kind string"
    )
    out = {r.doc_id: r for r in web.blocklist_filter(docs, rules).collect()}
    assert out[1].blocked and out[1].matched_rule == "bad.example.com"
    assert out[2].blocked  # any-depth subdomain
    assert not out[3].blocked  # 'notbad.example.com' must not suffix-match
    assert not out[4].blocked  # label alignment, not substring containment


def test_blocklist_url_prefix_confined_to_rule_domain(spark):
    docs = spark.createDataFrame(
        [
            (1, "HTTPS://Site.ORG:443/ads/banner?utm_x=1"),  # canonicalizes into the prefix
            (2, "https://site.org/adstext"),  # prefix '/ads' rule: startswith DOES match
            (3, "https://other.org/ads/banner"),  # same path, wrong domain
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("https://site.org/ads", "url_prefix")], "pattern string, kind string"
    )
    out = {r.doc_id: r for r in web.blocklist_filter(docs, rules).collect()}
    assert out[1].blocked  # noise (case, :443, utm) erased before the prefix test
    assert out[2].blocked  # documented plain-prefix semantics (use '/ads/' to bound)
    assert not out[3].blocked


def test_blocklist_min_rule_deterministic_and_unmatched_null(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.b.com/x"), (2, "https://clean.net/y")],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("b.com", "domain"), ("a.b.com", "domain")], "pattern string, kind string"
    )
    out = {r.doc_id: r for r in web.blocklist_filter(docs, rules).collect()}
    assert out[1].matched_rule == "a.b.com"  # min() of the two matches
    assert out[2].matched_rule is None and not out[2].blocked


def test_url_duplicates_never_groups_null_urls(spark):
    """r6 review: url-less docs must not collapse into one synthetic
    NULL-key group and report each other as duplicates."""
    from change_data_capture_spark.extensions import web

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "http://a.com/x"), (4, "http://a.com/x")],
        "doc_id long, url string",
    )
    got = {(r["dup_id"], r["keeper_id"]) for r in web.url_duplicates(docs).collect()}
    assert got == {(4, 3)}


def test_domain_stats_survives_null_urls(spark):
    """r6 review: the NULL-domain group's countDistinct is 0 — the
    recrawl ratio must not DIVIDE_BY_ZERO under ANSI."""
    from change_data_capture_spark.extensions import web

    docs = spark.createDataFrame(
        [(1, None), (2, "http://a.com/x"), (3, "http://a.com/x")],
        "doc_id long, url string",
    )
    got = {r["domain"]: (r["n_docs"], r["n_pages"]) for r in web.domain_stats(docs).collect()}
    assert got["a.com"] == (2, 1)
    assert got[None] == (1, 0)


def test_blocklist_prefix_rules_are_canonicalized(spark):
    """r6 review: a raw mixed-case slash-terminated url_prefix rule
    must match canonicalized doc urls (silent under-blocking), and the
    report carries the rule AS WRITTEN."""
    from change_data_capture_spark.extensions import web

    docs = spark.createDataFrame(
        [(1, "http://ads.example.com/banner/x.gif"), (2, "http://ok.example.com/p")],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("http://Ads.Example.com/banner/", "url_prefix")], "pattern string, kind string"
    )
    got = {r["doc_id"]: (r["blocked"], r["matched_rule"])
           for r in web.blocklist_filter(docs, rules).collect()}
    assert got[1] == (True, "http://Ads.Example.com/banner/")
    assert got[2] == (False, None)
