"""URL/domain layer (crawl front gate) and DSIR importance resampling."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dataweb_spark.functions import dsir as DS
from dataweb_spark.functions import urls as U


def _urls_df(spark, urls):
    pdf = pd.DataFrame({"doc_id": range(len(urls)), "url": urls})
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("raw,want", [
    # case: scheme+host lowered, userinfo/path/query untouched
    ("HTTP://WWW.Example.COM/A/b?Q=X", "http://www.example.com/A/b?Q=X"),
    ("ftp://User@Files.Site.ORG/d/", "ftp://User@files.site.org/d"),
    # fragment, default ports
    ("http://h.com/x#sec", "http://h.com/x"),
    ("http://h.com:80/x", "http://h.com/x"),
    ("https://h.com:443/x", "https://h.com/x"),
    ("http://h.com:8080/x", "http://h.com:8080/x"),   # non-default kept
    # tracking params: adjacent runs, leading, trailing, sole
    ("http://h/p?utm_a=1&utm_b=2&utm_c=3&x=1", "http://h/p?x=1"),
    ("http://h/p?x=1&utm_a=1&ref_src=z", "http://h/p?x=1"),
    ("http://h/p?utm_a=1", "http://h/p"),
    ("http://h/?utm_a=1&utm_b=2", "http://h/"),
    ("http://h/p?gclid=9&fbclid=8&id=3", "http://h/p?id=3"),
    # bare ref is FUNCTIONAL (GitHub ?ref=<branch>) — kept
    ("http://h/p?ref=main&utm_a=1", "http://h/p?ref=main"),
    # trailing slash: stripped on non-root, kept on root
    ("http://h.com/a/b/", "http://h.com/a/b"),
    ("http://h.com/", "http://h.com/"),
    ("http://h.com/a/?x=1", "http://h.com/a?x=1"),
    # schemeless / relative / junk: pass through UNCHANGED (fixed point)
    ("example.com/page", "example.com/page"),
    ("/relative/Path/", "/relative/Path/"),
    ("Example.COM?utm_a=1#frag", "Example.COM?utm_a=1#frag"),
    ("", ""),
])
def test_normalize_url_cases(spark, raw, want):
    got = _urls_df(spark, [raw]).select(
        U.normalize_url("url").alias("n")).collect()[0].n
    assert got == want


def test_registered_domain_and_host_path(spark):
    cases = {
        "http://news.bbc.co.uk/story": ("news.bbc.co.uk", "bbc.co.uk",
                                        "/story"),
        "https://a.b.example.com/x/y": ("a.b.example.com", "example.com",
                                        "/x/y"),
        "http://localhost/x": ("localhost", "localhost", "/x"),
        "http://1.2.3.4:99/x": ("1.2.3.4", "1.2.3.4", "/x"),
        "http://Shop.Com.AU.example.com.au/p":
            ("shop.com.au.example.com.au", "example.com.au", "/p"),
    }
    rows = _urls_df(spark, list(cases)).select(
        "url", U.url_host("url").alias("h"),
        U.registered_domain("url").alias("d"),
        U.url_path("url").alias("p")).collect()
    for r in rows:
        h, d, p = cases[r.url]
        assert (r.h, r.d, r.p) == (h, d, p), r.url


_PSL_RULES = ["// test PSL snippet", "", "com", "uk", "co.uk", "jp",
              "io", "github.io", "ck", "*.ck", "!www.ck"]


def _psl_df(spark):
    return spark.createDataFrame(pd.DataFrame({"rule": _PSL_RULES}))


def test_registered_domain_psl_modes(spark):
    """PSL mode resolves what the heuristic can't: private suffixes
    (github.io), wildcard rules (*.ck), exception rules (!www.ck),
    unknown TLDs via the default rule — while agreeing with the
    heuristic on the plain cases."""
    cases = {
        "http://a.b.example.com/x": "example.com",       # plain
        "http://news.bbc.co.uk/s": "bbc.co.uk",          # multi-part
        # private suffix: user pages are distinct publishers
        "http://user1.github.io/p": "user1.github.io",
        "http://deep.user2.github.io/p": "user2.github.io",
        # wildcard *.ck: every label under ck is a public suffix
        "http://shop.foo.ck/x": "shop.foo.ck",
        # exception !www.ck beats the wildcard: www.ck is registrable
        "http://sub.www.ck/x": "www.ck",
        "http://www.ck/x": "www.ck",
        # default rule: unknown TLD → last two labels
        "http://x.y.unknowntld/x": "y.unknowntld",
        # host IS a public suffix → whole host (convention)
        "http://github.io/": "github.io",
        # IP literal passes through whole
        "http://1.2.3.4/x": "1.2.3.4",
    }
    df = _urls_df(spark, list(cases))
    got = {r.url: r.domain for r in
           U.registered_domain_psl(df, _psl_df(spark)).collect()}
    assert got == cases
    # row count preserved (no dup rows from the candidate explode)
    assert U.registered_domain_psl(df, _psl_df(spark)).count() == len(cases)


from hypothesis import given as _given, settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402


@_settings(max_examples=20, deadline=None)
@_given(labels=_st.lists(
    _st.sampled_from(["a", "bb", "www", "user", "shop"]),
    min_size=1, max_size=4),
    tld=_st.sampled_from(["com", "co.uk", "github.io", "ck", "unknown"]))
def test_registered_domain_psl_agrees_with_spec(spark, labels, tld):
    """Cross-check the Spark PSL resolution against a pure-Python
    reference implementation of the publicsuffix.org algorithm on
    generated hosts — including exception (!www.ck) and wildcard
    (*.ck) interactions the heuristic tier can't express."""
    host = ".".join(labels + [tld])
    url = f"http://{host}/x"

    def ref_psl(host):
        hl = host.split(".")
        rules = []
        for raw in _PSL_RULES:
            raw = raw.strip()
            if not raw or raw.startswith("//"):
                continue
            exc = raw.startswith("!")
            rules.append((raw.lstrip("!").split("."), exc))
        matches = []
        for rl, exc in rules:
            if len(rl) > len(hl):
                continue
            tail = hl[-len(rl):]
            if all(a == b or (a == "*" and not exc)
                   for a, b in zip(rl, tail)):
                matches.append((rl, exc))
        excs = [m for m in matches if m[1]]
        if excs:
            ps = len(excs[0][0]) - 1
        elif matches:
            ps = max(len(rl) for rl, _ in matches)
        else:
            ps = 1
        if len(hl) <= ps:
            return host
        return ".".join(hl[-(ps + 1):])

    got = U.registered_domain_psl(
        _urls_df(spark, [url]), _psl_df(spark)).collect()[0].domain
    assert got == ref_psl(host), (host, got, ref_psl(host))


def test_domain_caps_deterministic_and_bounded(spark):
    urls = [f"http://big.com/p{i}" for i in range(40)] \
        + [f"http://small.org/q{i}" for i in range(3)]
    df = _urls_df(spark, urls)
    capped = U.domain_caps(df, max_per_domain=5)
    by_dom = {r.domain: r.n for r in
              capped.groupBy("domain").agg(F.count("*").alias("n"))
              .collect()}
    assert by_dom == {"big.com": 5, "small.org": 3}
    # determinism: same input → same kept set (hash order, not
    # partition order)
    kept1 = sorted(r.doc_id for r in capped.select("doc_id").collect())
    kept2 = sorted(r.doc_id for r in
                   U.domain_caps(df.repartition(7), max_per_domain=5)
                   .select("doc_id").collect())
    assert kept1 == kept2


def test_politeness_waves_schedule_and_cap(spark):
    """Wave assignment: per_wave URLs per domain per wave, admission
    order preserved (md5/id without a prior), cap drops late waves."""
    urls = [f"http://big.com/p{i}" for i in range(7)] \
        + [f"http://small.org/q{i}" for i in range(3)]
    df = _urls_df(spark, urls)
    out = U.politeness_waves(df, per_wave=2, max_per_domain=6)
    rows = out.collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(r)
    # cap: big.com loses 1 of 7; small.org keeps all 3
    assert len(by_dom["big.com"]) == 6 and len(by_dom["small.org"]) == 3
    for dom, rs in by_dom.items():
        waves = {}
        for r in rs:
            waves.setdefault(r.wave, []).append(r.wave_slot)
        for w, slots in waves.items():
            assert len(slots) <= 2 and sorted(slots) == list(
                range(len(slots))), (dom, w, slots)
        assert sorted(waves) == list(range(len(waves)))
    # the capped SET equals domain_caps' admission (same contract)
    kept_caps = sorted(r.doc_id for r in
                       U.domain_caps(df, max_per_domain=6).collect())
    assert sorted(r.doc_id for r in rows) == kept_caps
    # within a domain, (wave, slot) order IS the admission order:
    # md5(norm), id — replicate for big.com
    import hashlib
    norm = {r.doc_id: u for r, u in zip(
        df.orderBy("doc_id").collect(), urls)}
    big = sorted((r.wave, r.wave_slot, r.doc_id)
                 for r in by_dom["big.com"])
    admit = sorted((hashlib.md5(norm[i].encode()).hexdigest(), i)
                   for i in range(7))[:6]
    assert [d for _, _, d in big] == [i for _, i in admit]
    with pytest.raises(ValueError):
        U.politeness_waves(df, per_wave=0)


def test_politeness_waves_priority_and_single_exchange(spark):
    """With a prior, wave 0 holds the highest-score URLs; the whole
    schedule costs ONE exchange (the domain window — wave/slot are
    arithmetic on its row_number, no second shuffle)."""
    import re
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(10)),
        "url": [f"http://ccc.net/a{i}" for i in range(10)]}))
    pr = spark.createDataFrame(pd.DataFrame(
        {"url_norm": ["http://ccc.net/a7", "http://ccc.net/a3"],
         "score": [5, 9]}))
    out = U.politeness_waves(df, per_wave=2, priority=pr)
    w0 = sorted(r.doc_id for r in out.where("wave = 0").collect())
    assert w0 == [3, 7]  # score desc: a3 (9) then a7 (5)
    assert out.where("wave_slot >= 2 or wave >= 5").count() == 0
    assert {"domain", "wave", "wave_slot"} <= set(out.columns)
    # plan: exactly one exchange in the no-prior path
    plain = U.politeness_waves(df, per_wave=3)
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_parse_sitemaps_kinds_entities_and_mandatory_loc(spark):
    """urlset vs sitemapindex kinds, attribute-bearing tags, entity
    decode, whitespace trim, loc-less drop (index gap survives),
    changefreq case-fold, priority cast, malformed junk yields zero
    rows rather than crashing."""
    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        '<url><loc> http://a.com/p?x=1&amp;y=2 </loc>'
        '<lastmod>2024-01-05</lastmod><changefreq>Daily</changefreq>'
        '<priority>0.8</priority></url>'
        '<url><lastmod>2024-01-01</lastmod></url>'   # no loc -> dropped
        '<url><loc>http://a.com/q</loc></url></urlset>')
    index = ('<sitemapindex><sitemap><loc>http://a.com/s1.xml.gz</loc>'
             '<lastmod>2024-02-01T10:00:00+00:00</lastmod></sitemap>'
             '<sitemap><loc>http://a.com/s2.xml.gz</loc></sitemap>'
             '</sitemapindex>')
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "not xml at all"),
         (4, "<urlset><url><loc></loc></url></urlset>")],
        "site_id long, xml string")
    out = U.parse_sitemaps(df)
    rows = {(r.site_id, r.entry_idx): r for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 2), (2, 0), (2, 1)}
    r0 = rows[(1, 0)]
    assert r0.loc == "http://a.com/p?x=1&y=2"       # decoded + trimmed
    assert r0.url_norm == "http://a.com/p?x=1&y=2"
    assert (r0.lastmod, r0.changefreq, r0.priority) \
        == ("2024-01-05", "daily", 0.8)
    assert not r0.is_index
    r20 = rows[(2, 0)]
    assert r20.is_index and r20.loc == "http://a.com/s1.xml.gz"
    assert r20.lastmod == "2024-02-01T10:00:00+00:00"
    assert rows[(1, 2)].priority is None
    # plan: map-only — no exchange anywhere (linear at 100 TB)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_parse_sitemaps_entity_order_apos_and_bad_priority(spark):
    """r12 review fixes: &amp; decodes LAST ('&amp;lt;' → '&lt;', never
    '<'); the protocol's &apos; decodes; a non-numeric <priority> yields
    NULL (try_cast) instead of an ANSI cast crashing the whole seed
    job."""
    xml = ('<urlset>'
           "<url><loc>http://a.com/o&apos;brien?x=1&amp;lt;2</loc>"
           '<priority>high</priority></url>'
           '<url><loc>http://a.com/p</loc>'
           '<priority>0,8</priority></url></urlset>')
    df = spark.createDataFrame([(1, xml)], "site_id long, xml string")
    rows = {r.entry_idx: r for r in U.parse_sitemaps(df).collect()}
    assert rows[0].loc == "http://a.com/o'brien?x=1&lt;2"
    assert rows[0].priority is None and rows[1].priority is None


def test_blocklist_filter_drops_by_registered_domain(spark):
    df = _urls_df(spark, ["http://ok.com/a", "http://bad.com/b",
                          "http://www.bad.com/c", "http://fine.org/d"])
    blocked = spark.createDataFrame(pd.DataFrame({"domain": ["bad.com"]}))
    kept = sorted(r.url for r in
                  U.blocklist_filter(df, blocked).select("url").collect())
    assert kept == ["http://fine.org/d", "http://ok.com/a"]


def test_dsir_selects_target_like_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("lang") == "en")
    n_en = target.count()
    n_all = docs.count()
    sel = DS.dsir_select(docs, target, 20)
    picked = sel.join(docs.select("doc_id", "lang"), "doc_id")
    en_frac = picked.where(F.col("lang") == "en").count() / 20
    # selection must beat the base rate by a wide margin
    assert en_frac >= min(0.99, n_en / n_all + 0.25)
    # weights are integer-exact and the cut is the true top-k
    w = DS.dsir_weights(docs, target)
    top = [r.doc_id for r in
           w.orderBy(F.col("weight_e4").desc(), "doc_id").limit(20)
           .collect()]
    assert sorted(top) == sorted(r.doc_id for r in sel.collect())


def test_dsir_weights_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    w = DS.dsir_weights(docs, docs.limit(10))
    assert dict(w.dtypes) == {"doc_id": "bigint", "n_grams": "bigint",
                              "weight_e4": "bigint"}
    # every doc with >= 2 tokens gets exactly one weight row
    from dataweb_spark.functions.text import tokens
    n_expected = docs.where(F.size(tokens("text")) >= 2).count()
    assert w.count() == n_expected


# ---------------------------------------------------------------------------
# property tests: normalization idempotency + parser fuzz
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_URL_CHARS = st.text(
    alphabet="abcXYZ019-._~:/?#@&=%", min_size=0, max_size=40)


@settings(max_examples=25, deadline=None)
@given(scheme=st.sampled_from(["http", "HTTPS", "Ftp", ""]),
       host=st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
       rest=_URL_CHARS)
def test_normalize_url_is_idempotent(spark, scheme, host, rest):
    """normalize(normalize(u)) == normalize(u): the canonical form is a
    fixed point — URL dedup keyed on it is stable under re-ingestion.
    Includes SCHEMELESS inputs (scheme='' → bare 'host/rest'), which
    must pass through unchanged rather than sprouting '://' prefixes."""
    from pyspark.sql import functions as F
    url = f"{scheme}://{host}/{rest}" if scheme else f"{host}/{rest}"
    df = _urls_df(spark, [url])
    once = df.select(U.normalize_url("url").alias("u"))
    row = once.select(
        "u", U.normalize_url(F.col("u")).alias("u2")).collect()[0]
    assert row.u2 == row.u, (url, row.u, row.u2)


@settings(max_examples=25, deadline=None)
@given(junk=st.text(min_size=0, max_size=60))
def test_url_parsers_never_crash(spark, junk):
    """Arbitrary junk (no scheme, control chars, empty) must flow
    through host/domain/normalize without task failure — a crawl's URL
    column is never clean."""
    rows = _urls_df(spark, [junk]).select(
        U.url_host("url").alias("h"), U.registered_domain("url").alias("d"),
        U.normalize_url("url").alias("n"), U.url_path("url").alias("p")
    ).collect()
    assert len(rows) == 1
    # no valid scheme:// prefix → normalize is the identity, never
    # '://'+junk (the pre-r9 bug the guard closes)
    import re
    if not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", junk):
        assert rows[0].n == junk


# ---------------------------------------------------------------------------
# streaming crawl gate
# ---------------------------------------------------------------------------

def test_streaming_crawl_gate_caps_across_batches(spark, tmp_path):
    """Cross-batch frontier admission: per-domain caps count admitted
    URLs from EARLIER batches, canonical-URL dedup spans batches,
    blocklisted domains never admit, and a replayed batch admits
    nothing twice."""
    import pandas as pd
    state = str(tmp_path / "state")
    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")

    def _batch(rows):
        pdf = pd.DataFrame({"doc_id": [r[0] for r in rows],
                            "url": [r[1] for r in rows]})
        spark.createDataFrame(pdf).write.mode("append").parquet(drop)

    def _drain():
        schema = spark.read.parquet(drop).schema
        stream = (spark.readStream.schema(schema)
                  .format("parquet").load(drop))
        blocked = spark.createDataFrame(pd.DataFrame({"d": ["bad.com"]}))
        q = U.streaming_crawl_gate(stream, state, cp, blocked=blocked,
                                   max_per_domain=5)
        assert q.awaitTermination(300)

    _batch([(i, f"http://aaa.com/p{i}") for i in range(7)]
           + [(100 + i, f"http://bbb.org/q{i}") for i in range(2)]
           + [(200, "http://bad.com/x")])
    _drain()
    adm = spark.read.parquet(f"{state}/admitted")
    by = {r.domain: r.n for r in
          adm.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert by == {"aaa.com": 5, "bbb.org": 2}

    # batch 2: aaa.com is at cap (0 admits), bbb.org has 3 slots left,
    # a duplicate of an ADMITTED url dedups away cross-batch
    dup_url = adm.where("domain = 'aaa.com'").limit(1).collect()[0].url_norm
    _batch([(300 + i, f"http://aaa.com/r{i}") for i in range(3)]
           + [(400 + i, f"http://bbb.org/s{i}") for i in range(4)]
           + [(500, dup_url)])
    _drain()
    adm2 = spark.read.parquet(f"{state}/admitted")
    by2 = {r.domain: r.n for r in
           adm2.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert by2 == {"aaa.com": 5, "bbb.org": 5}
    assert adm2.count() == adm2.select("url_norm").distinct().count()

    # replay: the same rows arrive again as new files — every canonical
    # URL is either admitted (dedups away) or its domain is capped
    _batch([(600 + i, f"http://aaa.com/p{i}") for i in range(7)])
    _drain()
    assert spark.read.parquet(f"{state}/admitted").count() == 10
    # the incremental counts table tracks the admitted state exactly
    cnt = {r.domain: r.used for r in
           spark.read.parquet(f"{state}/counts").collect()}
    assert cnt == {"aaa.com": 5, "bbb.org": 5}


def test_streaming_crawl_gate_admission_never_reaggregates_state(
        spark, tmp_path):
    """The per-batch admission plan scans the admitted state exactly
    ONCE (the cross-batch URL anti-join, which no counter can replace)
    and takes per-domain capacity from the maintained counts table —
    the full-state groupBy re-aggregation of the r9 shape is gone, so
    per-batch capacity cost is O(domains), not O(admitted rows)."""
    import pandas as pd
    admitted_path = str(tmp_path / "admitted")
    counts_path = str(tmp_path / "counts")
    (spark.createDataFrame(pd.DataFrame(
        {"id": [1], "url_norm": ["http://a.com/x"], "domain": ["a.com"]}))
     .write.parquet(admitted_path))
    (spark.createDataFrame(pd.DataFrame(
        {"domain": ["a.com"], "used": [1]}))
     .write.parquet(counts_path))
    cand = (spark.createDataFrame(pd.DataFrame(
        {"doc_id": [2], "url": ["http://a.com/y"]}))
        .withColumn("_norm", U.normalize_url("url"))
        .withColumn("_dom", U.registered_domain("url")))
    keep = U._admit_batch(cand, spark.read.parquet(admitted_path),
                          spark.read.parquet(counts_path), 5, "doc_id")
    plan = keep._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    # exactly two parquet scans: admitted once (url_norm only — the
    # anti-join, column-pruned) and counts once (the capacity lookup);
    # file paths are truncated in toString, so identify by ReadSchema
    assert len(scans) == 2, plan
    assert sum("url_norm:string" in ln and "domain" not in ln
               for ln in scans) == 1, plan
    assert sum("used:bigint" in ln for ln in scans) == 1, plan
    # and nothing aggregates: capacity comes straight from counts, the
    # admitted state is never re-aggregated
    assert "HashAggregate" not in plan, plan


def test_streaming_crawl_gate_counts_self_heal(spark, tmp_path):
    """A crash between the admitted append and the counts overwrite
    leaves counts short; the next batch detects sum(used) !=
    count(admitted) and rebuilds counts from the admitted state, so
    caps stay exact."""
    import pandas as pd
    state = str(tmp_path / "state")
    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")

    def _drain():
        schema = spark.read.parquet(drop).schema
        stream = (spark.readStream.schema(schema)
                  .format("parquet").load(drop))
        q = U.streaming_crawl_gate(stream, state, cp, max_per_domain=4)
        assert q.awaitTermination(300)

    (spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(3)),
         "url": [f"http://a.com/p{i}" for i in range(3)]}))
     .write.mode("append").parquet(drop))
    _drain()
    # simulate the crash window: wipe counts back to empty
    (spark.createDataFrame([], "domain string, used bigint")
     .write.mode("overwrite").parquet(f"{state}/counts"))
    # next batch brings 3 more a.com URLs; capacity must be 4-3=1,
    # which only holds if counts were rebuilt from the admitted state
    (spark.createDataFrame(pd.DataFrame(
        {"doc_id": [10, 11, 12],
         "url": [f"http://a.com/q{i}" for i in range(3)]}))
     .write.mode("append").parquet(drop))
    _drain()
    assert spark.read.parquet(f"{state}/admitted").count() == 4
    cnt = {r.domain: r.used for r in
           spark.read.parquet(f"{state}/counts").collect()}
    assert cnt == {"a.com": 4}


def test_compact_frontier_state_preserves_admitted_set(spark, tmp_path):
    """Many small per-batch appends → one compaction pass shrinks the
    admitted table's file count without changing its contents, and the
    gate keeps admitting correctly against the compacted state."""
    import os

    import pandas as pd
    state = str(tmp_path / "state")
    drop = str(tmp_path / "drop")

    def _drain(cp):
        schema = spark.read.parquet(drop).schema
        stream = (spark.readStream.schema(schema)
                  .format("parquet").load(drop))
        q = U.streaming_crawl_gate(stream, state, str(tmp_path / cp),
                                   max_per_domain=10)
        assert q.awaitTermination(300)

    # 6 separate drains (fresh checkpoint each) → 6 append file sets
    for b in range(6):
        (spark.createDataFrame(pd.DataFrame(
            {"doc_id": [b * 10 + i for i in range(2)],
             "url": [f"http://d{b}.com/p{i}" for i in range(2)]}))
         .write.mode("append").parquet(drop))
        _drain(f"cp{b}")

    def _files():
        return [f for f in os.listdir(f"{state}/admitted")
                if f.endswith(".parquet")]

    before = spark.read.parquet(f"{state}/admitted")
    rows_before = {(r.id, r.url_norm, r.domain) for r in before.collect()}
    n_files_before = len(_files())
    assert n_files_before >= 6  # one file set per batch accumulated

    n_files = U.compact_frontier_state(spark, state)
    assert n_files == len(_files()) < n_files_before

    after = spark.read.parquet(f"{state}/admitted")
    assert {(r.id, r.url_norm, r.domain) for r in after.collect()} \
        == rows_before

    # the gate still works against the compacted state: d0.com has 8
    # slots left, a duplicate of an admitted URL dedups away
    (spark.createDataFrame(pd.DataFrame(
        {"doc_id": [900, 901],
         "url": ["http://d0.com/p0", "http://d0.com/new"]}))
     .write.mode("append").parquet(drop))
    _drain("cp_post")
    assert spark.read.parquet(f"{state}/admitted").count() \
        == len(rows_before) + 1


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309)
# ---------------------------------------------------------------------------

_ROBOTS_A = """# comment line
User-agent: testbot
Disallow: /private/
Allow: /private/ok*
Disallow: /tmp$

User-agent: *
Disallow: /
"""

_ROBOTS_B = """User-agent: otherbot
User-agent: *
Disallow: /blocked*
Allow:
"""


def _robots_df(spark):
    return spark.createDataFrame(pd.DataFrame({
        "domain": ["a.com", "b.org"],
        "robots_txt": [_ROBOTS_A, _ROBOTS_B]}))


def test_parse_robots_groups_and_agent_precedence(spark):
    """Exact-agent groups beat * groups (a.com ignores its catch-all);
    stacked UA lines share one group (b.org's rules apply via *);
    comments and empty Allow are dropped."""
    rules = {(r.domain, r.rule, r.path) for r in
             U.parse_robots(_robots_df(spark)).collect()}
    assert rules == {
        ("a.com", "disallow", "/private/"),
        ("a.com", "allow", "/private/ok*"),
        ("a.com", "disallow", "/tmp$"),
        ("b.org", "disallow", "/blocked*"),
    }


def test_robots_filter_longest_match_and_anchors(spark):
    rules = U.parse_robots(_robots_df(spark))
    urls = [
        ("http://a.com/public/x", True),       # no matching rule → allow
        ("http://a.com/private/secret", False),  # disallow /private/
        ("http://a.com/private/ok/page", True),  # allow wins (longer)
        ("http://a.com/tmp", False),             # trailing $ anchors
        ("http://a.com/tmpfile", True),          # $ means EXACT end
        ("http://www.a.com/private/x", False),   # registered-domain key
        ("http://b.org/blocked/page", False),    # * spans
        ("http://b.org/fine", True),
        ("http://c.net/anything", True),         # no rules at all
    ]
    df = _urls_df(spark, [u for u, _ in urls])
    kept = {r.url for r in
            U.robots_filter(df, rules).select("url").collect()}
    for u, want in urls:
        assert (u in kept) == want, u


def test_row_id_col_retires_nondeterministic_key(spark):
    """r12 (VERDICT item 4): with a caller-supplied ``row_id_col`` the
    PSL/robots winner re-aggregates key on data, not on
    ``monotonically_increasing_id()`` — stable under stage retries by
    construction. Proven two ways: the nondeterministic expression is
    GONE from the plan, and the result is invariant across adversarial
    re-partitionings/orderings of the same input (the shuffled-input
    shape the fallback path's precondition forbids)."""
    import pandas as pd
    urls = [f"http://u{i}.sub{i % 3}.github.io/p{i}" for i in range(60)]
    base = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(60)), "url": urls}))
    psl = _psl_df(spark)
    variants = [base, base.repartition(11),
                base.repartition(7, "url")
                    .sortWithinPartitions(F.desc("doc_id"))]
    got = []
    for v in variants:
        out = U.registered_domain_psl(v, psl, row_id_col="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "monotonically" not in plan, plan
        got.append(sorted((r.doc_id, r.domain)
                          for r in out.select("doc_id", "domain")
                          .collect()))
    assert got[0] == got[1] == got[2] and len(got[0]) == 60

    rules = spark.createDataFrame(pd.DataFrame({
        "domain": ["a.com"], "rule": ["disallow"], "path": ["/bad"]}))
    rdf = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(40)),
        "url": [f"http://a.com/{'bad' if i % 2 else 'ok'}{i}"
                for i in range(40)]}))
    kept = []
    for v in (rdf, rdf.repartition(9)
                     .sortWithinPartitions(F.desc("url"))):
        out = U.robots_filter(v, rules, row_id_col="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "monotonically" not in plan, plan
        kept.append(sorted(r.doc_id for r in out.collect()))
    assert kept[0] == kept[1] == [i for i in range(40) if i % 2 == 0]
    # contract edge: duplicate row ids COLLAPSE (documented) — rows
    # without identity belong on the fallback path
    dup = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 1], "url": ["http://x.github.io/a"] * 2}))
    assert U.registered_domain_psl(dup, psl, row_id_col="doc_id") \
            .count() == 1
    assert U.registered_domain_psl(dup, psl).count() == 2


def test_robots_filter_literal_metachars_safe(spark):
    """Regex specials in rule paths match LITERALLY (a '.' must not
    become any-char), and a mid-pattern $ is literal."""
    rules = spark.createDataFrame(pd.DataFrame({
        "domain": ["a.com"] * 2,
        "rule": ["disallow", "disallow"],
        "path": ["/file.php", "/pa$th"]}))
    df = _urls_df(spark, ["http://a.com/file.php", "http://a.com/fileXphp",
                          "http://a.com/pa$th/x"])
    kept = {r.url for r in
            U.robots_filter(df, rules).select("url").collect()}
    assert kept == {"http://a.com/fileXphp"}


def test_robots_filter_matches_path_plus_query(spark):
    """RFC 9309 matching targets the path PLUS query: rules of the
    common 'Disallow: /*?sessionid=' / '/search?q=*' shape must fire on
    query strings (matching the bare path silently admits them)."""
    rules = spark.createDataFrame(pd.DataFrame({
        "domain": ["a.com"] * 3,
        "rule": ["disallow", "disallow", "allow"],
        "path": ["/*?sessionid=", "/search?q=*", "/search?q=safe"]}))
    urls = [
        ("http://a.com/page?sessionid=42", False),   # query rule fires
        ("http://a.com/page", True),                 # no query, no match
        ("http://a.com/?sessionid=1", False),        # empty path → '/'
        ("http://a.com/search?q=x", False),          # q=* spans
        ("http://a.com/search?q=safe", True),        # longer allow wins
        ("http://a.com/search", True),               # bare path unaffected
    ]
    df = _urls_df(spark, [u for u, _ in urls])
    kept = {r.url for r in
            U.robots_filter(df, rules).select("url").collect()}
    for u, want in urls:
        assert (u in kept) == want, u


def test_robots_filter_modes_agree(spark):
    """broadcast=True and broadcast=False are the same operator at two
    plan shapes — identical admitted sets on the full rule-matrix
    fixture (longest-match, anchors, allow-ties, query matching)."""
    rules = U.parse_robots(_robots_df(spark))
    urls = ["http://a.com/public/x", "http://a.com/private/secret",
            "http://a.com/private/ok/page", "http://a.com/tmp",
            "http://a.com/tmpfile", "http://b.org/blocked/page",
            "http://b.org/fine", "http://c.net/anything"]
    df = _urls_df(spark, urls)
    a = {r.url for r in U.robots_filter(df, rules).collect()}
    b = {r.url for r in
         U.robots_filter(df, rules, broadcast=False).collect()}
    assert a == b and a  # same verdicts, non-empty


def test_robots_filter_preserves_duplicate_rows(spark):
    """The winner re-aggregate keys on a transient row id, so two
    IDENTICAL input rows both survive (a groupBy over all columns would
    silently collapse them — a semantic drift from the pure-column
    filters this gate sits beside)."""
    rules = spark.createDataFrame(pd.DataFrame({
        "domain": ["a.com"], "rule": ["disallow"], "path": ["/no"]}))
    df = _urls_df(spark, ["http://a.com/yes", "http://a.com/yes",
                          "http://a.com/no"])
    got = [r.url for r in U.robots_filter(df, rules).collect()]
    assert sorted(got) == ["http://a.com/yes", "http://a.com/yes"]


def test_psl_domain_preserves_duplicate_rows(spark):
    """Same row-id re-aggregate contract for registered_domain_psl."""
    psl = spark.createDataFrame(pd.DataFrame({"rule": ["com"]}))
    df = _urls_df(spark, ["http://x.a.com/p", "http://x.a.com/p"])
    got = U.registered_domain_psl(df, psl).collect()
    assert [r.domain for r in got] == ["a.com", "a.com"]


def test_streaming_crawl_gate_priority_admission(spark, tmp_path):
    """Authority-prioritized gate (VERDICT r10 item 6): under a tight
    cap the HIGH-authority URLs are admitted first (score desc, md5/id
    tiebreak), remaining capacity in later batches still honors the
    prior, and unscored URLs rank below any scored one."""
    import pandas as pd
    state = str(tmp_path / "state")
    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")
    pr = spark.createDataFrame(pd.DataFrame({
        "url_norm": [f"http://aaa.com/p{i}" for i in range(8)],
        "score": [10 * (8 - i) for i in range(8)]}))

    def _batch(rows):
        pdf = pd.DataFrame({"doc_id": [r[0] for r in rows],
                            "url": [r[1] for r in rows]})
        spark.createDataFrame(pdf).write.mode("append").parquet(drop)

    def _drain():
        schema = spark.read.parquet(drop).schema
        stream = (spark.readStream.schema(schema)
                  .format("parquet").load(drop))
        q = U.streaming_crawl_gate(stream, state, cp, max_per_domain=3,
                                   priority=pr)
        assert q.awaitTermination(300)

    # batch 1: candidates p5..p0 arrive "worst-first" — admission must
    # pick the 3 best scores (p0, p1, p2), not arrival or hash order
    _batch([(i, f"http://aaa.com/p{5 - i}") for i in range(6)])
    _drain()
    adm = {r.url_norm for r in
           spark.read.parquet(f"{state}/admitted").collect()}
    assert adm == {"http://aaa.com/p0", "http://aaa.com/p1",
                   "http://aaa.com/p2"}

    # batch 2 on a fresh domain: a scored URL beats unscored ones even
    # when its md5 would lose the hash lottery
    pr2 = spark.createDataFrame(pd.DataFrame(
        {"url_norm": ["http://bbb.org/z9"], "score": [1]}))
    _batch([(100 + i, f"http://bbb.org/z{i}") for i in range(10)])
    schema = spark.read.parquet(drop).schema
    stream = (spark.readStream.schema(schema)
              .format("parquet").load(drop))
    q = U.streaming_crawl_gate(stream, state, cp, max_per_domain=1,
                               priority=pr2)
    assert q.awaitTermination(300)
    bbb = {r.url_norm for r in spark.read.parquet(f"{state}/admitted")
           .where("domain = 'bbb.org'").collect()}
    assert bbb == {"http://bbb.org/z9"}


def test_priority_admission_single_state_scan(spark, tmp_path):
    """The priority join must not break the single-admitted-scan /
    no-reaggregation contract: the plan gains exactly one extra scan
    (the prior table) and still never aggregates state."""
    import pandas as pd
    admitted_path = str(tmp_path / "admitted")
    counts_path = str(tmp_path / "counts")
    prior_path = str(tmp_path / "prior")
    (spark.createDataFrame(pd.DataFrame(
        {"id": [1], "url_norm": ["http://a.com/x"], "domain": ["a.com"]}))
     .write.parquet(admitted_path))
    (spark.createDataFrame(pd.DataFrame(
        {"domain": ["a.com"], "used": [1]}))
     .write.parquet(counts_path))
    (spark.createDataFrame(pd.DataFrame(
        {"url_norm": ["http://a.com/y"], "score": [7]}))
     .write.parquet(prior_path))
    cand = (spark.createDataFrame(pd.DataFrame(
        {"doc_id": [2], "url": ["http://a.com/y"]}))
        .withColumn("_norm", U.normalize_url("url"))
        .withColumn("_dom", U.registered_domain("url")))
    keep = U._admit_batch(cand, spark.read.parquet(admitted_path),
                          spark.read.parquet(counts_path), 5, "doc_id",
                          priority=spark.read.parquet(prior_path))
    # plan BEFORE collect: the post-execution AQE string prints every
    # scan twice (final + initial plan sections)
    plan = keep._jdf.queryExecution().executedPlan().toString()
    assert [r.url_norm for r in keep.collect()] == ["http://a.com/y"]
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 3, plan   # admitted + counts + prior, once each
    assert sum("score" in ln for ln in scans) == 1, plan
    assert "HashAggregate" not in plan, plan


def test_domain_caps_priority_matches_streaming_order(spark):
    """domain_caps(priority=...) and the gate share one ordering
    implementation — the batch face picks score-desc/md5/id too."""
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(10)),
        "url": [f"http://ccc.net/a{i}" for i in range(10)]}))
    pr = spark.createDataFrame(pd.DataFrame(
        {"url_norm": ["http://ccc.net/a7", "http://ccc.net/a3"],
         "score": [5, 9]}))
    kept = U.domain_caps(df, max_per_domain=2, priority=pr)
    assert sorted(r.doc_id for r in kept.collect()) == [3, 7]
    assert set(kept.columns) == {"doc_id", "url", "domain"}


def test_normalize_url_idempotent_on_20k_adversarial_batch(spark):
    """Batched fixed-point hammer: one Spark job over 20k seeded
    adversarial URLs (embedded spaces, brackets, quotes, %-runs, odd
    schemes) — far more coverage per second than per-example property
    runs; the r10 trailing-slash-run bug class would surface here."""
    import random
    from pyspark.sql import functions as F
    rng = random.Random(11)
    chars = "abcXYZ019-._~:/?#@&=%+ \t[]{}\\^`<>\"'|;,!$()*"
    urls = []
    for i in range(20000):
        scheme = rng.choice(["http", "HTTPS", "Ftp", "", "ht tp",
                             "http:", "//"])
        host = "".join(rng.choice("aB0.-:") for _ in range(
            rng.randint(0, 12)))
        rest = "".join(rng.choice(chars) for _ in range(rng.randint(0, 30)))
        u = f"{scheme}://{host}/{rest}" if scheme else f"{host}/{rest}"
        urls.append((i, u))
    df = spark.createDataFrame(urls, "i long, url string")
    bad = (df.select(U.normalize_url("url").alias("u"))
             .select("u", U.normalize_url(F.col("u")).alias("u2"))
             .where("u2 is distinct from u"))
    assert bad.count() == 0, bad.limit(3).collect()


def test_parse_sitemaps_totality_on_20k_junk_batch(spark):
    """Batched totality hammer (the URL-normalize pattern): 20k seeded
    adversarial XML bodies — truncated tags, nested/unclosed entries,
    entity soup, control bytes, giant attrs — must parse in ONE job
    with zero crashes, and every emitted row keeps the invariants
    (non-empty loc, entry_idx ≥ 0, priority NULL-or-double)."""
    import random
    rng = random.Random(23)
    frags = ["<urlset>", "</urlset>", "<sitemapindex>", "</sitemapindex>",
             "<url>", "</url>", "<sitemap>", "</sitemap>",
             "<loc>", "</loc>", "<loc attr='x'>", "<lastmod>",
             "</lastmod>", "<priority>", "</priority>", "<changefreq>",
             "</changefreq>", "http://a.com/p", "&amp;", "&apos;",
             "&#39;", "not a tag <", "]]>", "<!--", "-->", "\x01\x02",
             "0.8", "high", "9" * 40, " ", "<loc></loc>",
             "<url><loc>http://b.org/q</loc></url>"]
    rows = []
    for i in range(20000):
        n = rng.randint(0, 14)
        rows.append((i, "".join(rng.choice(frags) for _ in range(n))))
    df = spark.createDataFrame(rows, "site_id long, xml string")
    out = U.parse_sitemaps(df).select(
        "site_id", "entry_idx", "loc", "priority").collect()
    for r in out:
        assert r.loc != "" and r.entry_idx >= 0
        assert r.priority is None or isinstance(r.priority, float)


def test_politeness_waves_matches_python_replay(spark):
    """Property: the full (domain, wave, slot) schedule equals a
    brute-force python replay of the admission contract (md5 order, per
    wave cap, domain cap) on a randomized multi-domain frontier."""
    import hashlib
    import random
    rng = random.Random(7)
    urls = {}
    for i in range(300):
        dom = f"d{rng.randint(0, 11)}.com"
        urls[i] = f"http://{dom}/p{i}"
    df = spark.createDataFrame(
        [(i, u) for i, u in urls.items()], "doc_id long, url string")
    got = {r.doc_id: (r.domain, r.wave, r.wave_slot) for r in
           U.politeness_waves(df, per_wave=3, max_per_domain=8)
           .collect()}
    # replay: per domain, order by (md5(normalized url), id)
    by_dom: dict = {}
    for i, u in urls.items():
        dom = u.split("//")[1].split("/")[0]
        by_dom.setdefault(dom, []).append(
            (hashlib.md5(u.encode()).hexdigest(), i))
    want = {}
    for dom, lst in by_dom.items():
        for rank, (_, i) in enumerate(sorted(lst)[:8]):
            want[i] = (dom, rank // 3, rank % 3)
    assert got == want


def test_robots_directives_delay_binding_and_sitemaps(spark):
    """Crawl-delay binds by the SAME group algebra as the rules (exact
    agent beats *), max of several binding delays, non-numeric ignored;
    Sitemap lines are group-INDEPENDENT (bind from any group, doc order,
    dup-deduped); directive-free domains keep a NULL/empty row."""
    bodies = {
        # exact group delay beats the * group's
        "a.com": ("User-agent: *\nCrawl-delay: 9\nDisallow: /x\n"
                  "User-agent: testbot\nCrawl-delay: 2.5\n"
                  "Sitemap: http://a.com/s1.xml\n"
                  "User-agent: testbot\nCrawl-delay: 4\n"
                  "Sitemap: http://a.com/s2.xml\n"
                  "Sitemap: http://a.com/s1.xml"),   # dup -> kept once
        # only * group; non-numeric delay ignored
        "b.org": ("User-agent: *\nCrawl-delay: fast\nDisallow: /y\n"
                  "Sitemap: http://b.org/map.xml"),
        # no directives at all
        "c.net": "User-agent: *\nDisallow: /z",
        # sitemap inside a NON-binding group still binds
        "d.io": ("User-agent: otherbot\nCrawl-delay: 7\n"
                 "Sitemap: http://d.io/deep.xml"),
    }
    df = spark.createDataFrame(list(bodies.items()),
                               "domain string, robots_txt string")
    out = {r.domain: r for r in U.robots_directives(df).collect()}
    assert out["a.com"].crawl_delay == 4.0          # max of 2.5 and 4
    assert out["a.com"].sitemaps == ["http://a.com/s1.xml",
                                     "http://a.com/s2.xml"]
    assert out["b.org"].crawl_delay is None         # 'fast' ignored
    assert out["b.org"].sitemaps == ["http://b.org/map.xml"]
    assert out["c.net"].crawl_delay is None and out["c.net"].sitemaps == []
    # otherbot's delay does NOT bind for testbot; its sitemap DOES
    assert out["d.io"].crawl_delay is None
    assert out["d.io"].sitemaps == ["http://d.io/deep.xml"]
    assert len(out) == 4                            # one row per domain


def test_robots_directives_feed_wave_offsets(spark):
    """The crawl-loop composition: directives → politeness waves →
    not-before fetch offsets (wave · coalesce(delay, default)) — pure
    arithmetic on the broadcast directives table, no extra window."""
    bodies = [("slow.com", "User-agent: *\nCrawl-delay: 10"),
              ("fast.com", "User-agent: *\nDisallow:")]
    dirs = U.robots_directives(spark.createDataFrame(
        bodies, "domain string, robots_txt string"))
    urls = [f"http://slow.com/p{i}" for i in range(5)] + \
           [f"http://fast.com/q{i}" for i in range(5)]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    waved = U.politeness_waves(df, per_wave=2)
    out = (waved.join(F.broadcast(dirs), "domain", "left")
           .withColumn("not_before_s",
                       F.col("wave")
                       * F.coalesce("crawl_delay", F.lit(1.0))))
    rows = {(r.domain, r.wave): r.not_before_s for r in out.collect()}
    assert rows[("slow.com", 2)] == 20.0
    assert rows[("fast.com", 2)] == 2.0             # default 1s


def test_robots_directives_matches_duckdb_replay(spark, sf_dir):
    """Full replay over synthesized per-domain bodies — the r13 oracle
    shape. domain = doc_id % 6 deliberately MISALIGNS with the body
    variants (%3 delay, %2 sitemap, %5 exact-agent group), so most
    domains merge SEVERAL distinct bodies: the reference replays the
    documented multi-row semantics — bodies ordered by md5(body),
    exact-agent groups anywhere suppress * groups everywhere (domain-
    wide), delay = max over binding groups of all bodies, sitemaps
    dedup-first-occurrence in (body md5, line) order."""
    import hashlib
    import os
    import re as _re

    import duckdb
    synth = """
select 's' || (doc_id % 6) || '.com' as domain,
       'User-agent: *' || chr(10)
       || case when doc_id % 3 = 0
               then 'Crawl-delay: ' || (doc_id % 7) || chr(10)
               else '' end
       || 'Disallow: /p' || (doc_id % 4) || chr(10)
       || case when doc_id % 2 = 0
               then 'Sitemap: http://s' || (doc_id % 6)
                    || '.com/m' || (doc_id % 5) || '.xml' || chr(10)
               else '' end
       || case when doc_id % 5 = 0
               then 'User-agent: testbot' || chr(10)
                    || 'Crawl-delay: 2.5' || chr(10) else '' end
       as robots_txt
from documents where doc_id < 30"""
    from dataweb_spark.queries import register_views
    register_views(spark, sf_dir)
    bodies = spark.sql(synth.replace("chr(10)", "char(10)"))
    got = {r.domain: (r.crawl_delay, list(r.sitemaps)) for r in
           U.robots_directives(bodies).collect()}
    # partition-layout invariance of the multi-row merge
    again = {r.domain: (r.crawl_delay, list(r.sitemaps)) for r in
             U.robots_directives(bodies.repartition(7)).collect()}
    assert got == again

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')")
    by_dom: dict = {}
    for dom, body in con.execute(synth).fetchall():
        by_dom.setdefault(dom, []).append(body)

    def ref(bodies_for_dom):
        # documented merge: bodies in md5 order; groups per body;
        # exact-beats-* decided across ALL bodies; max binding delay;
        # sitemaps first-occurrence in (md5, line) order
        ordered = sorted(bodies_for_dom,
                         key=lambda b: hashlib.md5(b.encode()).hexdigest())
        all_groups, maps, seen = [], [], set()
        for body in ordered:
            cur, prev_ua = None, False
            for ln in body.split("\n"):
                ln = _re.sub(r"#.*$", "", ln).strip()
                m = _re.match(r"^([A-Za-z-]+)\s*:\s*(.*)$", ln)
                if not m:
                    prev_ua = False
                    continue
                k, v = m.group(1).lower(), m.group(2).strip()
                if k == "user-agent":
                    if not prev_ua:
                        cur = {"uas": set(), "delays": []}
                        all_groups.append(cur)
                    cur["uas"].add(v.lower())
                    prev_ua = True
                    continue
                prev_ua = False
                if k == "crawl-delay" and cur is not None:
                    try:
                        cur["delays"].append(float(v))
                    except ValueError:
                        pass
                if k == "sitemap" and v and v not in seen:
                    seen.add(v)
                    maps.append(v)
        exact = [g for g in all_groups if "testbot" in g["uas"]]
        use = exact if exact else [g for g in all_groups
                                   if "*" in g["uas"]]
        ds = [d for g in use for d in g["delays"]]
        return (max(ds) if ds else None), maps

    want = {d: ref(bs) for d, bs in by_dom.items()}
    assert got == want and len(want) == 6


def test_streaming_crawl_gate_recovers_missing_counts(spark, tmp_path):
    """r16: the counts table is now swapped into place by rename — a
    crash between the delete and the rename leaves NO counts dir at all.
    The gate must treat an unreadable counts table like a short one:
    rebuild from the admitted state and keep caps exact."""
    import shutil

    import pandas as pd
    state = str(tmp_path / "state")
    drop = str(tmp_path / "drop")
    cp = str(tmp_path / "cp")

    def _drain():
        schema = spark.read.parquet(drop).schema
        stream = (spark.readStream.schema(schema)
                  .format("parquet").load(drop))
        q = U.streaming_crawl_gate(stream, state, cp, max_per_domain=4)
        assert q.awaitTermination(300)

    (spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(3)),
         "url": [f"http://a.com/p{i}" for i in range(3)]}))
     .write.mode("append").parquet(drop))
    _drain()
    # simulate the new crash window: counts dir gone entirely
    shutil.rmtree(f"{state}/counts")
    (spark.createDataFrame(pd.DataFrame(
        {"doc_id": [10, 11, 12],
         "url": [f"http://a.com/q{i}" for i in range(3)]}))
     .write.mode("append").parquet(drop))
    _drain()
    assert spark.read.parquet(f"{state}/admitted").count() == 4
    cnt = {r.domain: r.used for r in
           spark.read.parquet(f"{state}/counts").collect()}
    assert cnt == {"a.com": 4}
