"""URL / domain layer — the crawl FRONT half's first gate.

Every web-scale corpus pipeline (C4, RefinedWeb, FineWeb, Dolma) starts
by normalizing page URLs, extracting the registered domain, dropping
blocklisted hosts, and capping how many pages any one domain may
contribute (a handful of mega-domains otherwise dominate the token
mix). This module expresses all four as codegen column expressions and
narrow-key shuffles:

* :func:`url_host` / :func:`url_path` — pure ``regexp_extract`` parses
  (kept in the Java∩RE2 regex subset so a SQL oracle replays them);
* :func:`registered_domain` — last-two-labels heuristic with the common
  multi-part public suffixes (co.uk, com.au, ...) special-cased; a full
  public-suffix list is a broadcast join away, the shape is identical;
* :func:`normalize_url` — lowercase scheme+host, strip fragment,
  default ports, tracking params (``utm_*``/``fbclid``/``gclid``),
  empty query remnants and trailing slashes — the canonical form URL
  dedup keys on;
* :func:`domain_caps` — deterministic per-domain page cap: hash-ordered
  ``row_number`` per registered domain (one shuffle on the domain key;
  hot mega-domains are exactly what AQE skew-join/salting notes in
  SCALE.md address — the cap itself SHRINKS the skew downstream);
* :func:`blocklist_filter` — anti-join against a (small, broadcast)
  blocked-domain table.

Everything is map-only except the two narrow-key joins; page bodies
never shuffle. No counterpart in the reference repo (its sources are
SQL engines / file directories) — part of the greenfield LLM-pipeline
layer, like all of ``functions/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Multi-part public suffixes common enough for the heuristic tier; the
# real PSL is ~9k rows — broadcast-join it in production, same plan.
MULTI_PART_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za", "com.sg", "com.hk",
]

# tracking params stripped by normalize_url (lowercase-compared).
# Deliberately NOT bare ``ref``: on many major sites it is a functional
# parameter (GitHub's ``?ref=<branch>`` selects different content), so
# stripping it would collapse distinct pages onto one canonical URL and
# URL dedup would wrongly drop them. ``ref_src``/``ref_url`` (Twitter
# embed attribution) are tracking-only and safe to strip.
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|msclkid|ref_src|ref_url)"


def url_host(col: str | Column = "url") -> Column:
    """Lowercased host (no scheme, userinfo, port, path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))


def url_path(col: str | Column = "url") -> Column:
    """Path component ('' when absent); query/fragment excluded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)


def url_query(col: str | Column = "url") -> Column:
    """Query component without the ``?`` ('' when absent); fragment
    excluded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*\?([^#]*)", 1)


def registered_domain(col: str | Column = "url") -> Column:
    """Registered (pay-level) domain of the URL's host: the last two
    labels, or three when the last two form a known multi-part public
    suffix (``news.bbc.co.uk`` → ``bbc.co.uk``). IP hosts pass through
    whole."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2),
                        F.element_at(parts, -1))
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    multi = F.lit(False)
    for suf in MULTI_PART_SUFFIXES:
        multi = multi | (last2 == suf)
    return (F.when(is_ip | (n <= 2), host)
             .when(multi & (n >= 3), last3)
             .otherwise(last2))


def registered_domain_psl(df: DataFrame, psl: DataFrame,
                          url_col: str = "url", out_col: str = "domain",
                          max_labels: int = 8,
                          row_id_col: str | None = None) -> DataFrame:
    """Registered (pay-level) domain via a REAL public-suffix list —
    the production-grade tier :func:`registered_domain`'s 20-suffix
    heuristic stands in for. Implements the PSL algorithm
    (publicsuffix.org/list): among all rules matching a suffix of the
    host, an exception rule (``!www.ck``) prevails outright (public
    suffix = the rule minus its leftmost label), otherwise the longest
    match wins — literal rules (``co.uk``, ``github.io``) match their
    exact labels, wildcard rules (``*.ck``) match any value of the
    leftmost label. No match → default rule ``*`` (the bare TLD). The
    registered domain is the public suffix plus one label; hosts that
    ARE a public suffix (and IP literals) pass through whole, matching
    the heuristic's convention.

    ``psl`` is a one-column DataFrame of raw rule strings (comment /
    blank lines tolerated; "private" section rules like ``github.io``
    are deliberately honored — for dedup/cap purposes user subdomains
    of a shared host ARE distinct publishers).

    Engine shape: each host emits its ≤ ``max_labels`` label-suffix
    candidates (literal + wildcard form) via posexplode — a narrow
    (row, candidate) stream — broadcast-hash-joined against the ~9k-row
    rule table, then one re-aggregate on the row key picks the winning
    rule. One narrow shuffle total; host strings ride through, page
    bodies should be projected away by the caller first at 100 TB.
    Every expression is JVM-side and replayable as a SQL oracle.

    Row identity: ``row_id_col`` (RECOMMENDED on production paths)
    names a caller column that uniquely keys each row — a document id,
    a content hash — making the winner re-aggregate a pure function of
    the data: stable under stage retries, shuffles, and speculative
    tasks, no preconditions. Without it, the key falls back to
    ``monotonically_increasing_id()``, a nondeterministic expression —
    then rows must arrive with deterministic partition contents (any
    scan / narrow pipeline qualifies). If the input sits directly on a
    nondeterministically-ordered shuffle, a stage retry can re-deal ids
    and split or merge winner groups; pass ``row_id_col`` (or interpose
    a localCheckpoint) in that case. Duplicate ``row_id_col`` values
    collapse those rows into one output row — use the fallback when
    rows genuinely have no identity."""
    rules = (psl.select(F.trim(F.col(psl.columns[0])).alias("raw"))
             .where((F.col("raw") != "") & ~F.col("raw").startswith("//"))
             .select(F.regexp_replace("raw", r"^!", "").alias("rule"),
                     F.col("raw").startswith("!").alias("is_exc")))

    host = url_host(url_col)
    # the winner re-aggregate keys on a transient row id, not the input
    # columns: exact-duplicate input rows stay distinct and
    # non-groupable column types (map) pass through untouched
    rid = (F.col(row_id_col) if row_id_col is not None
           else F.monotonically_increasing_id())
    out = df.withColumn("_rid", rid) \
            .withColumn("_psl_host", host)
    parts = F.split(F.col("_psl_host"), r"\.")
    n = F.size(parts)
    is_ip = F.col("_psl_host").rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    # candidate i = the last-i-label suffix, i = 1..min(n, max_labels);
    # emit its literal form and (for i >= 2) the wildcard form that a
    # `*.`-rule would match
    cand = (out.select(
        "*",
        F.explode(F.sequence(F.lit(1), F.least(n, F.lit(max_labels))))
         .alias("_i")))
    suffix = F.array_join(F.slice(F.split(F.col("_psl_host"), r"\."),
                                  -F.col("_i"), F.col("_i")), ".")
    wild = F.concat(F.lit("*."), F.array_join(
        F.slice(F.split(F.col("_psl_host"), r"\."),
                -(F.col("_i") - 1), F.col("_i") - 1), "."))
    cand = cand.withColumn("_suffix", suffix).withColumn(
        "_forms", F.when(F.col("_i") >= 2,
                         F.array(F.col("_suffix"), wild))
                   .otherwise(F.array(F.col("_suffix"))))
    cand = cand.select("*", F.explode("_forms").alias("_form"))
    hits = (cand.join(F.broadcast(rules),
                      cand["_form"] == rules["rule"], "left")
            # a wildcard rule must not claim the literal candidate and
            # vice versa; exceptions are literal-only per the spec
            .where(F.col("rule").isNull()
                   | (F.col("rule").startswith("*.")
                      == F.col("_form").startswith("*."))
                   | F.col("is_exc"))
            .withColumn(
                "_ps_len",
                F.when(F.col("rule").isNull(), F.lit(None))
                 .when(F.col("is_exc"), F.col("_i") - 1)
                 .otherwise(F.col("_i"))))
    winner = (hits.groupBy("_rid")
              .agg(*[F.first(c).alias(c) for c in df.columns],
                   F.first("_psl_host").alias("_psl_host"),
                   F.max(F.when(F.col("rule").isNotNull(),
                                F.struct(F.col("is_exc"),
                                         F.col("_ps_len"))))
                   .alias("_w")))
    ps_len = F.coalesce(F.col("_w._ps_len"), F.lit(1))
    wparts = F.split(F.col("_psl_host"), r"\.")
    wn = F.size(wparts)
    dom = (F.when(is_ip | (wn <= ps_len), F.col("_psl_host"))
            .otherwise(F.array_join(
                F.slice(wparts, -(ps_len + 1), ps_len + 1), ".")))
    return (winner.withColumn(out_col, dom)
            .drop("_w", "_psl_host", "_rid"))


def normalize_url(col: str | Column = "url") -> Column:
    """Canonical URL form for exact URL dedup:

    1. lowercase the scheme and host (userinfo/path/query stay
       case-sensitive per RFC 3986);
    2. drop the fragment;
    3. drop default ports (``:80`` for http, ``:443`` for https);
    4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
       ``msclkid``, ``ref``): the query string is split on ``&``,
       filtered with an array lambda and rejoined — order-robust for
       ANY number of adjacent tracking params, unlike a global
       regexp_replace whose scan never revisits replaced text;
    5. drop one trailing slash from a non-root path.

    Inputs WITHOUT a valid ``scheme://`` prefix (schemeless, relative,
    or junk values — common in real crawl URL columns) pass through
    UNCHANGED: the scheme/host/tail decomposition below only holds for
    absolute URLs, and rebuilding from empty extracts would prepend
    ``://`` on every application, breaking the fixed-point contract URL
    dedup keys on across re-ingestion generations.

    Regexes stay in the Java∩RE2 subset (group captures, no
    lookaround) — map-only, all JVM-side (the array-lambda filter is a
    codegen-fallback expression, still no Python), exactly replayable
    as a SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    # 1. lowercase scheme and host[:port] ONLY — userinfo, path and
    # query are case-sensitive per RFC 3986
    scheme = F.lower(F.regexp_extract(
        c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    userinfo = F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/@?#]*@)", 1)
    hostport = F.lower(F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]*)", 1))
    tail = F.regexp_replace(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]*", "")
    u = F.concat(scheme, F.lit("://"), userinfo, hostport, tail)
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. default ports (group-capture, not lookahead — RE2 has none)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?].*)?$", "$1$2")
    # 4. tracking params via split → filter → rejoin
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike("^" + TRACKING_PARAM_RE + "="))
    u = F.when(F.size(kept) > 0,
               F.concat(base, F.lit("?"), F.array_join(kept, "&"))) \
         .otherwise(base)
    # 5. trailing slashes on a non-root path — the WHOLE run in one
    # pass (`/+`), not one slash per application: stripping singly made
    # 'http://h/x//' normalize to different strings on first and second
    # application, breaking the fixed-point contract (hypothesis-found)
    u = F.regexp_replace(u, r"(://[^/?#]+/[^?#]*?)/+(\?|$)", "$1$2")
    # schemeless/junk guard: the decomposition above is only valid for
    # absolute URLs — anything else is its own canonical form
    return F.when(scheme == "", c).otherwise(u)


def _priority_order(df: DataFrame, priority: DataFrame | None,
                    score_col: str, id_col: str):
    """(df', order_exprs) for authority-prioritized admission: left-join
    the per-URL prior on the canonical URL (``df`` must carry
    ``_norm``), order by score DESC (absent → 0), then the md5 hash,
    then id. Shared by :func:`domain_caps` and the streaming gate so
    both faces admit the identical set.

    Precondition: ``priority`` holds ONE row per canonical URL — the
    shape a score-building aggregate emits. A duplicate key would
    multiply its candidate row through the left join (each copy gets
    its own row_number, so one document could consume several cap
    slots); aggregate the prior upstream — re-aggregating a
    full-crawl-sized prior here on every batch would be the wrong
    trade."""
    if priority is None:
        return df, [F.md5("_norm"), id_col]
    pr = priority.select(
        F.col(priority.columns[0]).alias("_norm"),
        F.col(score_col).cast("bigint").alias("_score"))
    return (df.join(pr, "_norm", "left"),
            [F.desc(F.coalesce(F.col("_score"), F.lit(0))),
             F.md5("_norm"), id_col])


def domain_caps(df: DataFrame, url_col: str = "url",
                max_per_domain: int = 100,
                id_col: str = "doc_id",
                priority: DataFrame | None = None,
                score_col: str = "score") -> DataFrame:
    """FineWeb-style per-domain contribution cap: keep at most
    ``max_per_domain`` pages per registered domain, chosen by a
    DETERMINISTIC hash order (md5 of the normalized URL, id tiebreak —
    md5 is engine-portable, so a SQL oracle replays the exact same
    choice) so reruns and engines agree — never "first N seen", which
    is partition-order-dependent. One shuffle on the (narrow) domain
    key; page bodies ride along once — at 100 TB, project down to
    (id, url) first, cap, then semi-join bodies back.

    ``priority`` (first column = canonical URL, ``score_col`` = bigint
    authority prior — ``graph.anchor_profile``-style in-link counts or
    ``graph.pagerank_integer`` scores) makes the cap fill with the
    HIGHEST-authority pages first (score DESC, md5/id tiebreak —
    still fully deterministic): real pipelines fetch high-harvest URLs
    first under politeness caps instead of hash-lottery order. URLs
    absent from the table score 0. The join adds one narrow shuffle on
    the canonical-URL key (AQE broadcasts a small prior table). The
    prior must hold ONE row per canonical URL (see
    :func:`_priority_order` — duplicates would let one document consume
    several cap slots)."""
    ranked = (df.withColumn("_dom", registered_domain(url_col))
                .withColumn("_norm", normalize_url(url_col)))
    ranked, order = _priority_order(ranked, priority, score_col, id_col)
    ranked = ranked.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("_dom").orderBy(*order)))
    return (ranked.where(F.col("_rn") <= max_per_domain)
            .drop("_norm", "_rn", "_score")
            .withColumnRenamed("_dom", "domain"))


def politeness_waves(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id", per_wave: int = 10,
                     max_per_domain: int | None = None,
                     priority: DataFrame | None = None,
                     score_col: str = "score",
                     keep_score: bool = False) -> DataFrame:
    """Per-domain politeness *scheduling* on the frontier — the sequel
    to :func:`domain_caps`' admission: assign every admitted URL a fetch
    ``wave`` (0-based) such that each registered domain contributes at
    most ``per_wave`` URLs per wave. A downstream fetcher executes wave
    0 across all domains in parallel, waits out the crawl-delay, then
    wave 1, … — rate-limit-ready batches with no runtime coordination,
    because the schedule is a pure function of the frontier (the
    reference relay's scheduler state machine is runtime; here the
    100 TB-friendly form is a precomputed deterministic assignment).

    Ordering inside a domain is the exact :func:`domain_caps` /
    ``_admit_batch`` admission contract (``priority`` score DESC when
    given, then md5 of the canonical URL, then ``id_col``) — so with a
    prior, wave 0 holds each domain's highest-authority pages and the
    SAME set that a ``max_per_domain``-capped admission would keep
    fills the earliest waves. ``max_per_domain`` (optional) drops
    everything past the cap, i.e. waves ≥ ``max_per_domain/per_wave``.

    Emits the input columns plus ``domain``, ``wave`` and ``wave_slot``
    (0-based position inside the domain's wave — fetchers that thread
    per-domain connections use it as the request index).
    ``keep_score=True`` (with a ``priority``) also emits the prior's
    score as ``score`` (0 for unlisted URLs) — it is already joined for
    the ordering, so keeping it is free, while re-deriving it downstream
    would cost a second normalize + join over the full frontier.

    Shape at 100 TB: ONE exchange — the same single domain-partitioned
    window ``domain_caps`` already pays; wave/slot are arithmetic on
    that window's row_number (no second window, no re-shuffle), and the
    optional prior join is an AQE-broadcast on the narrow canonical-URL
    key. Plan-asserted in ``tests/test_urls_dsir.py``.
    """
    if per_wave < 1:
        raise ValueError("per_wave must be >= 1")
    if keep_score and priority is None:
        raise ValueError("keep_score=True requires a priority frame — "
                         "without one there is no score to keep")
    ranked = (df.withColumn("_dom", registered_domain(url_col))
                .withColumn("_norm", normalize_url(url_col)))
    ranked, order = _priority_order(ranked, priority, score_col, id_col)
    ranked = ranked.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("_dom").orderBy(*order)))
    if max_per_domain is not None:
        ranked = ranked.where(F.col("_rn") <= max_per_domain)
    out = (ranked
           .withColumn("wave",
                       F.expr(f"cast((_rn - 1) div {int(per_wave)} "
                              "as int)"))
           .withColumn("wave_slot",
                       F.pmod(F.col("_rn") - 1, F.lit(per_wave))
                        .cast("int")))
    if keep_score:
        out = out.withColumn(
            "score", F.coalesce(F.col("_score"), F.lit(0)).cast("bigint"))
    return (out.drop("_norm", "_rn", "_score")
               .withColumnRenamed("_dom", "domain"))


def parse_sitemaps(df: DataFrame, id_col: str = "site_id",
                   xml_col: str = "xml") -> DataFrame:
    """Sitemap XML → seed rows (sitemaps.org protocol) — the crawl
    stack's seed-discovery operator: a fetched ``sitemap.xml`` becomes
    one row per entry, ready for the frontier gates (normalize → caps →
    robots → priority → waves).

    Handles BOTH document kinds: a ``<urlset>`` yields its ``<url>``
    entries, a ``<sitemapindex>`` yields its ``<sitemap>`` child
    pointers (flagged ``is_index`` so the fetcher knows to recurse).
    Per entry: ``entry_idx`` (document order), ``loc`` (entity-decoded —
    the protocol REQUIRES ``&`` in URLs be escaped as ``&amp;``),
    ``url_norm`` (the canonical form, shared with the rest of the
    gates), ``lastmod`` (string as published; cast downstream — the
    protocol allows date-only and full W3C datetime), ``changefreq``,
    and ``priority`` (double, NULL when absent). Entries with no
    ``<loc>`` are dropped (the protocol makes it mandatory).

    Shape at 100 TB: three nested regexp/array stages, all JVM codegen,
    map-only — no shuffle; one sitemap file is one row in, ≤50k rows out
    (the protocol's own cap per file). The same regex-tier trade as
    ``text.html_extract_tables``: real-world XML is messy, a conformant
    parser would be a UDF — the regex tier covers the protocol grammar
    and stays whole-stage-codegen.
    """
    c = F.col(xml_col)
    is_index = c.rlike("(?is)<\\s*sitemapindex")
    # `<url(?:\s[^>]*)?>` tolerates attributes but cannot match
    # `<urlset ...>` (the next char would have to be whitespace or '>');
    # likewise `<sitemap...>` vs `<sitemapindex>`
    url_blocks = F.expr(
        f"regexp_extract_all({xml_col}, "
        r"'(?is)<url(?:\\s[^>]*)?>(.*?)</url\\s*>', 1)")
    map_blocks = F.expr(
        f"regexp_extract_all({xml_col}, "
        r"'(?is)<sitemap(?:\\s[^>]*)?>(.*?)</sitemap\\s*>', 1)")
    out = df.select(
        F.col(id_col), is_index.alias("is_index"),
        F.when(is_index, map_blocks).otherwise(url_blocks).alias("_e"))
    out = out.select(
        id_col, "is_index",
        F.posexplode("_e").alias("entry_idx", "_entry"))

    def child(tag: str) -> Column:
        return F.regexp_extract(
            "_entry", f"(?is)<{tag}\\s*>\\s*(.*?)\\s*</{tag}\\s*>", 1)

    # the five predefined XML entities the protocol's escaping table
    # names (&amp; &apos; &quot; &gt; &lt;) plus the numeric apostrophe;
    # &amp; decodes LAST so a literal '&amp;lt;' in a URL yields '&lt;',
    # not '<' (same order contract as text.HTML_ENTITIES)
    loc = child("loc")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    out = (out.withColumn("loc", loc)
              .where(F.col("loc") != "")
              .withColumn("url_norm", normalize_url("loc"))
              .withColumn("lastmod",
                          F.nullif(child("lastmod"), F.lit("")))
              .withColumn("changefreq",
                          F.nullif(F.lower(child("changefreq")),
                                   F.lit("")))
              .withColumn("priority",
                          F.nullif(child("priority"), F.lit(""))
                           .try_cast("double"))
              .drop("_entry"))
    return out


def parse_robots(df: DataFrame, domain_col: str = "domain",
                 body_col: str = "robots_txt",
                 agent: str = "testbot") -> DataFrame:
    """Parse robots.txt bodies (RFC 9309) into per-domain rule rows
    ``(domain, rule, path)`` with ``rule ∈ {allow, disallow}`` for the
    given user agent — entirely in DataFrame ops, no Python in the
    path:

    * lines explode with their position; ``User-agent`` lines open a
      group unless the previous line was also a UA line (RFC: stacked
      UA lines share one group) — the group id is a running count of
      group-opening lines, one window per domain on the line index;
    * a group applies when it names ``agent`` (case-insensitive exact
      product token) or ``*``; per RFC, if any group names the agent
      exactly, the ``*`` groups are ignored — the most specific match
      wins (decided per domain with one bounded aggregate);
    * ``Allow:``/``Disallow:`` lines in applying groups become rule
      rows; empty-path ``Disallow:`` (allow-all idiom) is dropped;
      comments (#…) and unknown directives are ignored.

    Robots bodies are small (RFC caps parsing at 500 KiB) and one per
    domain — the output is a bounded rule table, broadcastable into
    :func:`robots_filter`."""
    grouped, applying = _robots_groups(df, domain_col, body_col, agent)
    return (grouped.where(F.col("key").isin("allow", "disallow")
                          & (F.col("val") != ""))
            .join(applying, ["domain", "grp"])
            .select("domain", F.col("key").alias("rule"),
                    F.col("val").alias("path")))


def _robots_groups(df: DataFrame, domain_col: str, body_col: str,
                   agent: str) -> tuple[DataFrame, DataFrame]:
    """Shared robots.txt line/group machinery: returns ``(grouped,
    applying)`` where ``grouped`` is one row per non-comment line with
    ``(domain, _bh, idx, key, val, grp)`` and ``applying`` names the
    ``(domain, grp)`` groups that bind for ``agent`` (exact product
    token beats ``*`` per DOMAIN, RFC 9309).

    A domain normally has ONE body (one robots.txt per host); when the
    input carries several rows for a domain (mixed snapshots), the
    bodies are treated as one logical file in a DETERMINISTIC order —
    by md5 of the body text, never ingest/partition order — with lines
    keyed (body-hash, line-idx) so per-row indexes can never collide,
    groups never span body boundaries (a leading UA line always opens a
    fresh group even after a trailing UA line of the previous body),
    and exact-agent groups in ANY body suppress ``*`` groups in all of
    them (the conservative domain-wide reading)."""
    from pyspark.sql import Window

    lines = (df.select(F.col(domain_col).alias("domain"),
                       F.md5(F.coalesce(F.col(body_col), F.lit("")))
                        .alias("_bh"),
                       F.posexplode(F.split(body_col, r"\r?\n"))
                        .alias("idx", "line"))
             .withColumn("line", F.trim(F.regexp_replace("line",
                                                         r"#.*$", "")))
             .withColumn("key", F.lower(F.regexp_extract(
                 "line", r"^([A-Za-z-]+)\s*:", 1)))
             .withColumn("val", F.trim(F.regexp_extract(
                 "line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1))))
    w = Window.partitionBy("domain").orderBy("_bh", "idx")
    is_ua = F.col("key") == "user-agent"
    prev_ua = F.lag(is_ua, 1, False).over(w)
    prev_bh = F.lag("_bh", 1).over(w)
    opener = is_ua & (~prev_ua
                      | ~prev_bh.eqNullSafe(F.col("_bh")))
    grouped = (lines.withColumn(
        "grp", F.sum(opener.cast("int")).over(w)))
    # which groups apply: exact-agent groups if any exist, else * groups
    ua = (grouped.where(is_ua)
          .select("domain", "grp", F.lower(F.col("val")).alias("ua")))
    flags = (ua.groupBy("domain", "grp")
             .agg(F.max((F.col("ua") == agent.lower()).cast("int"))
                  .alias("has_exact"),
                  F.max((F.col("ua") == "*").cast("int")).alias("has_star")))
    dom_exact = (flags.groupBy("domain")
                 .agg(F.max("has_exact").alias("dom_exact")))
    applying = (flags.join(dom_exact, "domain")
                .where((F.col("has_exact") == 1)
                       | ((F.col("dom_exact") == 0)
                          & (F.col("has_star") == 1)))
                .select("domain", "grp"))
    return grouped, applying


def robots_directives(df: DataFrame, domain_col: str = "domain",
                      body_col: str = "robots_txt",
                      agent: str = "testbot") -> DataFrame:
    """Per-domain non-rule robots.txt directives — the two every real
    crawler consumes beside allow/disallow:

    * ``crawl_delay`` (double seconds, NULL when absent/invalid) — the
      de-facto ``Crawl-delay:`` extension, read from the groups that
      BIND for ``agent`` (exact-token groups beat ``*``, the same RFC
      9309 group algebra as :func:`parse_robots` — shared
      implementation, so rules and delay can never disagree about which
      group applies). When several binding groups request different
      delays the MAXIMUM binds — the polite reading (a smaller value
      would under-wait one group's request). Non-numeric values
      (``Crawl-delay: fast``) are ignored (try_cast), never a crash.
    * ``sitemaps`` (array of URL strings, document order within a body,
      duplicates removed keeping first occurrence) — ``Sitemap:`` lines
      are GROUP-INDEPENDENT per the sitemaps.org protocol: they bind
      for every agent wherever they appear in the file, so they are
      read from ALL lines, not just binding groups. Feed them to
      :func:`parse_sitemaps` after fetching — the seed-discovery loop.

    A domain normally contributes ONE body; several rows for one domain
    merge as one logical file in a deterministic content-hash body
    order (see :func:`_robots_groups`): delay = max over the binding
    groups of every body, exact-agent groups anywhere suppress ``*``
    groups everywhere, and the sitemap array orders by (body md5, line)
    — stable across runs/partitionings, but NOT ingest order, which a
    distributed input does not have.

    One row per input domain (domains with neither directive keep a row
    with NULL delay + empty array — the caller's politeness DEFAULT
    applies). Same bounded shape as the rule table: broadcastable, and
    ``wave · coalesce(crawl_delay, default)`` turns
    :func:`politeness_waves`' wave numbers into not-before fetch
    offsets with zero extra shuffles.
    """
    grouped, applying = _robots_groups(df, domain_col, body_col, agent)
    delays = (grouped.where((F.col("key") == "crawl-delay")
                            & (F.col("val") != ""))
              .join(applying, ["domain", "grp"])
              .withColumn("_d", F.col("val").try_cast("double"))
              .where(F.col("_d").isNotNull())
              .groupBy("domain")
              .agg(F.max("_d").alias("crawl_delay")))
    maps = (grouped.where((F.col("key") == "sitemap")
                          & (F.col("val") != ""))
            .groupBy("domain", "val")
            .agg(F.min(F.struct("_bh", "idx")).alias("_first"))
            .groupBy("domain")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_first", "val"))),
                lambda s: s["val"]).alias("sitemaps")))
    base = df.select(F.col(domain_col).alias("domain")).distinct()
    return (base.join(delays, "domain", "left")
                .join(maps, "domain", "left")
                .select("domain", "crawl_delay",
                        F.coalesce("sitemaps",
                                   F.array().cast("array<string>"))
                         .alias("sitemaps")))


def robots_filter(df: DataFrame, rules: DataFrame,
                  url_col: str = "url",
                  broadcast: bool = True,
                  row_id_col: str | None = None) -> DataFrame:
    """Drop URLs a robots rule table forbids (RFC 9309 matching): among
    the rules of the URL's registered domain whose path pattern matches
    the URL's path-plus-query, the LONGEST pattern wins, ``allow``
    beating ``disallow`` on equal length; a URL with no matching rule
    (or no rules at all for its domain) is allowed. Patterns support
    the two RFC metacharacters: ``*`` (any span) and a trailing ``$``
    (end anchor); everything else — including a non-final ``$`` —
    matches literally. Pattern translation stays in the Java∩RE2 regex
    subset.

    Patterns match against the PATH PLUS QUERY (``/search?q=x``), per
    RFC 9309 §2.2.2 and every production matcher — rules of the common
    ``Disallow: /*?sessionid=`` / ``Disallow: /search?q=*`` shape must
    be able to fire; matching the bare path would silently admit
    everything they forbid. Empty path normalizes to ``/`` before the
    query is appended.

    Shape: each URL meets only its own domain's rules (equi-join on the
    domain key), the pattern test is one JVM ``rlike`` over the handful
    of candidate rules, and one re-aggregate on a transient row id
    picks the winner (keying on the row id, not the input columns,
    keeps exact-duplicate rows distinct and tolerates non-groupable
    column types like map). ``broadcast=True`` force-broadcasts the
    rule table — right for a curated domain subset, where it is at most
    a few hundred MB. For a FULL crawl's rules (10⁷–10⁸ domains × ~10
    rules each ≈ tens of GB) pass ``broadcast=False``: the join then
    shuffles both sides on the narrow domain key instead of OOMing
    every executor on the broadcast. Project page bodies away first at
    100 TB.

    Row identity: same contract as :func:`registered_domain_psl` —
    pass ``row_id_col`` (a unique caller key: doc id, content hash) on
    production paths to make the winner re-aggregate retry/shuffle-
    stable with no preconditions; without it the key falls back to
    ``monotonically_increasing_id()`` and the input must have
    deterministic partition contents (scans and narrow pipelines do;
    localCheckpoint first if feeding straight from a
    nondeterministically-ordered shuffle)."""
    anchored = F.col("path").endswith("$")
    body = F.when(anchored,
                  F.expr("substring(path, 1, length(path) - 1)")) \
            .otherwise(F.col("path"))
    esc = F.regexp_replace(body, r"([.^+?(){}\[\]\\|$])", r"\\$1")
    pat = F.concat(F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
                   F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    rul = rules.select(F.col("domain").alias("_dom"),
                       (F.col("rule") == "allow").alias("_allow"),
                       F.length("path").alias("_plen"), pat.alias("_pat"))
    path = F.when(url_path(url_col) == "", "/").otherwise(url_path(url_col))
    query = url_query(url_col)
    target = F.when(query == "", path) \
              .otherwise(F.concat(path, F.lit("?"), query))
    rid = (F.col(row_id_col) if row_id_col is not None
           else F.monotonically_increasing_id())
    base = df.withColumn("_rid", rid) \
             .withColumn("_dom", registered_domain(url_col)) \
             .withColumn("_path", target)
    hits = (base.join(F.broadcast(rul) if broadcast else rul,
                      "_dom", "left")
            .withColumn(
                "_verdict",
                F.when(F.col("_pat").isNotNull()
                       & F.expr("_path rlike _pat"),
                       F.struct(F.col("_plen"), F.col("_allow")))))
    won = (hits.groupBy("_rid")
           .agg(*[F.first(c).alias(c) for c in df.columns],
                F.max("_verdict").alias("_w")))
    return won.where(F.col("_w").isNull() | F.col("_w._allow")) \
              .drop("_w", "_rid")


def _admit_batch(cand: DataFrame, admitted: DataFrame, counts: DataFrame,
                 max_per_domain: int, id_col: str,
                 priority: DataFrame | None = None,
                 score_col: str = "score") -> DataFrame:
    """One micro-batch's admission plan (factored out so plan tests can
    assert its shape): anti-join the candidates' canonical URLs against
    the admitted state — the ONLY admitted-state scan — and fill each
    domain's remaining capacity (``max_per_domain − counts.used``) in
    deterministic order: authority-prior score DESC when ``priority``
    is given (:func:`domain_caps` semantics — high-harvest URLs first
    under the politeness cap), then md5, then id. ``counts`` is the
    maintained per-domain count table; the admitted state is never
    re-aggregated here."""
    from pyspark.sql import Window

    fresh = cand.join(
        admitted.select(F.col("url_norm").alias("_norm")),
        "_norm", "left_anti")
    fresh, order = _priority_order(fresh, priority, score_col, id_col)
    used = counts.select(F.col("domain").alias("_dom"),
                         F.col("used").alias("_used"))
    wd = Window.partitionBy("_dom").orderBy(*order)
    return (fresh.withColumn("_rn", F.row_number().over(wd))
            .join(used, "_dom", "left")
            .where(F.col("_rn")
                   <= max_per_domain - F.coalesce("_used", F.lit(0)))
            .select(F.col(id_col).alias("id"),
                    F.col("_norm").alias("url_norm"),
                    F.col("_dom").alias("domain")))


def streaming_crawl_gate(stream_df: DataFrame, state_path: str,
                         checkpoint: str,
                         blocked: DataFrame | None = None,
                         max_per_domain: int = 100,
                         url_col: str = "url", id_col: str = "doc_id",
                         priority: DataFrame | None = None,
                         score_col: str = "score"):
    """Streaming crawl-frontier admission gate — the URL layer's
    streaming face, same one-implementation rule as the text and media
    gates (``dedup_index.streaming_ingest_gate``,
    ``media_index.streaming_media_gate``): ``readStream →
    foreachBatch(gate → admit)`` over exactly the batch URL operators.

    Per micro-batch: normalize URLs, drop blocklisted registered
    domains (broadcast anti-join), collapse within-batch canonical-URL
    duplicates (min id), drop URLs whose canonical form is already
    admitted (cross-batch URL dedup), then enforce the per-domain cap
    ACROSS batches: each domain's remaining capacity is
    ``max_per_domain − already_admitted(domain)``, and the batch's
    candidates fill it in deterministic md5 order (the same
    hash-not-arrival order as :func:`domain_caps`, so a re-played or
    re-partitioned batch admits the same set) — or, with ``priority``
    (canonical URL → bigint authority prior: anchor in-link counts,
    integer PageRank; ONE row per URL, see :func:`_priority_order`),
    highest-authority first with md5/id as the tiebreak, so the
    politeness cap is spent on high-harvest URLs. State is TWO on-disk
    parquet tables: ``{state_path}/admitted`` (id, url_norm, domain)
    and ``{state_path}/counts`` (domain, used) — the per-domain counts
    are maintained INCREMENTALLY (old counts ∪ the batch's admit counts,
    re-aggregated), so per-batch capacity lookup costs O(domains), not
    a re-aggregation scan of the whole admitted state. The one
    remaining admitted-state scan per batch is the cross-batch URL
    anti-join, which no counter can replace. The stream restarts from
    the checkpoint with nothing to rebuild.

    Replay idempotency: ``foreachBatch`` is at-least-once — admitted
    rows are staged durably under the checkpoint before the append
    (appending refreshes the state table, which would invalidate the
    very plan that computed the admits — the dedup-gate lesson), and a
    replay's rows anti-join away on their already-admitted canonical
    URLs. Counts self-heal: a crash between the admitted append and the
    counts overwrite (or mid-overwrite) leaves ``sum(used)`` short of
    the admitted row count — the next batch detects the mismatch (two
    narrow/metadata-only aggregates) and rebuilds counts from the
    admitted table once. Precondition: the canonical URL is the stable
    dedup key.

    Returns the started StreamingQuery (caller awaits / stops)."""
    import os

    from pyspark.sql import Window

    def _gate(batch: DataFrame, _epoch: int) -> None:
        spark_b = batch.sparkSession
        cand = (batch.withColumn("_norm", normalize_url(url_col))
                     .withColumn("_dom", registered_domain(url_col)))
        if blocked is not None:
            cand = cand.join(
                F.broadcast(blocked.select(
                    F.col(blocked.columns[0]).alias("_dom"))),
                "_dom", "left_anti")
        wb = Window.partitionBy("_norm").orderBy(id_col)
        cand = (cand.withColumn("_rn", F.row_number().over(wb))
                    .where(F.col("_rn") == 1).drop("_rn"))
        admitted = spark_b.read.parquet(f"{state_path}/admitted")
        # consistency guard: admitted.count() is parquet-footer-only and
        # the counts sum is O(domains) — if they disagree, a previous
        # batch crashed between the admitted append and the counts
        # swap; rebuild counts from admitted once (recovery scan). r16:
        # a counts table that cannot be READ at all (crash between the
        # swap's delete and rename — or mid-overwrite on the pre-r16
        # path, a window the old code could not recover from) lands on
        # the same rebuild path instead of failing the stream.
        n_admitted = admitted.count()
        try:
            counts = spark_b.read.parquet(f"{state_path}/counts")
            n_counted = counts.agg(
                F.coalesce(F.sum("used"), F.lit(0))).first()[0]
        except Exception:
            counts, n_counted = None, -1
        rebuilt = n_counted != n_admitted
        if rebuilt or counts is None:
            counts = admitted.groupBy("domain").agg(
                F.count("*").cast("bigint").alias("used"))
            rebuilt = True
        keep = _admit_batch(cand, admitted, counts, max_per_domain,
                            id_col, priority=priority,
                            score_col=score_col)
        staging = os.path.join(checkpoint, "_gate_staging")
        keep.write.mode("overwrite").parquet(staging)
        staged = spark_b.read.parquet(staging)
        # incremental counts: old counts ∪ staged deltas, re-aggregated
        # — staged to a second dir first (the overwrite would otherwise
        # invalidate the very plan reading the old counts)
        new_counts = (counts.unionByName(
            staged.groupBy("domain").agg(
                F.count("*").cast("bigint").alias("used")))
            .groupBy("domain").agg(F.sum("used").alias("used")))
        cstaging = os.path.join(checkpoint, "_counts_staging")
        # the admitted append and the counts staging write are
        # independent once `staged` is durable (both read ONLY staged +
        # the old counts table), so overlap them — the per-batch cost is
        # fixed job overhead, not data (r15; guide §2.6, the same
        # pattern as dedup_index.append_batch). EXCEPT on the recovery
        # path: a rebuilt `counts` plan reads the admitted table the
        # append mutates, so that rare batch stays sequential.
        from dataweb_spark.functions.dedup_index import _concurrent_writes
        admit_write = lambda: (staged.write.mode("append")
                               .parquet(f"{state_path}/admitted"))
        cstage_write = lambda: (new_counts.write.mode("overwrite")
                                .parquet(cstaging))
        if rebuilt:
            cstage_write()
            admit_write()
        else:
            _concurrent_writes(admit_write, cstage_write)
        # r16 (guide §6): the final counts already sit complete in the
        # staging dir — RENAME them into place instead of re-reading and
        # re-writing them through one more full Spark job per batch (the
        # read-back overwrite was ~1 job of pure fixed overhead). Crash
        # windows: before the delete ⇒ counts stale (sum short ⇒ the
        # guard rebuilds); between delete and rename ⇒ counts missing
        # (the guard's read fallback rebuilds) — strictly no worse than
        # the old mid-overwrite window, which left a partial dir the old
        # code could not even read. A failed rename (checkpoint and
        # state_path on different filesystems) falls back to the copy
        # job.
        jvm = spark_b._jvm
        jc = jvm.org.apache.hadoop.fs.Path(f"{state_path}/counts")
        js = jvm.org.apache.hadoop.fs.Path(cstaging)
        fs = jc.getFileSystem(spark_b._jsc.hadoopConfiguration())
        moved = False
        try:
            fs.delete(jc, True)
            moved = bool(fs.rename(js, jc))
        except Exception:  # noqa: BLE001 — any FS refusal → copy path
            moved = False
        if not moved:
            (spark_b.read.parquet(cstaging)
             .write.mode("overwrite").parquet(f"{state_path}/counts"))

    # initialize empty state so the first batch's reads succeed — the
    # id column's type is DERIVED from the stream's id_col (a hardcoded
    # bigint plus, say, a string id would create a mixed-schema parquet
    # directory whose later reads resolve nondeterministically)
    spark = stream_df.sparkSession
    id_type = stream_df.schema[id_col].dataType.simpleString()
    try:
        spark.read.parquet(f"{state_path}/admitted")
    except Exception:
        (spark.createDataFrame(
            [], f"id {id_type}, url_norm string, domain string")
         .write.mode("overwrite").parquet(f"{state_path}/admitted"))
    try:
        spark.read.parquet(f"{state_path}/counts")
    except Exception:
        (spark.createDataFrame([], "domain string, used bigint")
         .write.mode("overwrite").parquet(f"{state_path}/counts"))

    return (stream_df.writeStream
            .foreachBatch(_gate)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def compact_frontier_state(spark, state_path: str,
                           target_file_mb: int = 256) -> int:
    """Periodic maintenance for :func:`streaming_crawl_gate` state: every
    micro-batch APPENDS one file set to ``{state_path}/admitted``, so a
    long-lived crawl accumulates one small parquet file per batch and the
    per-batch cross-batch anti-join pays listing/task-scheduling overhead
    instead of IO — the same small-file problem the dedup index solves
    with ``dedup_index.compact_index``. Rewrites the admitted table to
    ~``target_file_mb`` files via :func:`scale.compact_parquet`
    (staged + atomic swap, crash leaves the original intact); returns the
    new file count. The counts table needs no compaction — the gate
    overwrites it wholesale every batch, so it never accumulates files.

    Run BETWEEN gate runs (the stream stopped, or between availableNow
    drains): the gate's staged-append discipline assumes it is the only
    writer of the state tables."""
    from dataweb_spark.functions.scale import compact_parquet

    return compact_parquet(spark, f"{state_path}/admitted",
                           target_file_mb=target_file_mb)


def blocklist_filter(df: DataFrame, blocked: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Drop pages whose REGISTERED domain is blocklisted (UT1-style
    adult/malware lists): broadcast anti-join on the domain key — the
    list is ~1M rows at worst, always the small side."""
    dom = registered_domain(url_col).alias("_dom")
    return (df.withColumn("_dom", dom)
              .join(F.broadcast(blocked.select(
                  F.col(blocked.columns[0]).alias("_dom"))),
                  "_dom", "left_anti")
              .drop("_dom"))
