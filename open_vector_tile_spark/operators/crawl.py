"""Polite crawl-frontier scheduling — fetch waves under per-host courtesy.

A Common-Crawl-style frontier cannot fetch a host's pages back-to-back:
politeness caps simultaneous requests per host.  The standard batch
formulation assigns every URL a WAVE number such that (a) no host
contributes more than ``per_host`` URLs to one wave and (b) higher-
priority URLs fetch in earlier waves.  A host-hash stagger offsets each
host's first wave so wave 0 is not dominated by the frontier's largest
hosts arriving in lockstep.

Scale shape (10^12-URL frontier):
- one shuffle on ``host`` for the per-host ranking window (the frontier's
  natural partitioning — the same key a fetcher fleet shards on);
- the stagger is a pure column expression (md5 slice), no extra shuffle;
- determinism: rank ties break on the URL string, so wave assignment is
  reproducible across runs and partitionings — a restarted scheduler
  re-derives the identical plan (the resume/checkpoint story depends on
  this).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "schedule_crawl", "parse_robots", "robots_filter", "parse_sitemaps",
    "url_template", "detect_traps", "recrawl_priority",
]


def schedule_crawl(
    frontier: DataFrame,
    *,
    per_host: int = 1,
    stagger: int = 1,
    host_col: str = "host",
    url_col: str = "url",
    priority: Column | None = None,
) -> DataFrame:
    """Assign each frontier row a fetch ``wave`` (0-based).

    ``priority``: higher fetches earlier (defaults to URL order only).
    ``per_host``: max URLs one host contributes to a single wave.
    ``stagger``: hosts start at offset ``md5_slice(host) % stagger``
    (1 = no stagger), de-synchronizing large hosts without changing any
    host's internal order — the md5 slice is the repo's portable hash
    idiom (engine-reproducible, unlike hash()/crc32 variants).

    Returns the input plus ``host_rank`` (1-based within host) and
    ``wave``.  Within a host, waves are monotone in priority.
    """
    if per_host < 1:
        raise ValueError(f"per_host must be >= 1, got {per_host}")
    if stagger < 1:
        raise ValueError(f"stagger must be >= 1, got {stagger}")
    order = [F.asc(url_col)]
    if priority is not None:
        order = [F.desc_nulls_last(priority), F.asc(url_col)]
    # NULL hosts window together as one pseudo-host already; hash the same
    # marker the sampling helpers use so their wave is a NUMBER, not NULL —
    # md5(NULL) is NULL and a NULL wave silently drops the row from every
    # wave-equality fetch (cf. sampling.stable_frac_hex's null-key marker)
    host_key = F.coalesce(
        F.col(host_col).cast("string"), F.lit("\x00<null-host>")
    )
    w = Window.partitionBy(host_key).orderBy(*order)
    ranked = frontier.withColumn("host_rank", F.row_number().over(w))
    offset = (
        F.conv(F.substring(F.md5(host_key), 1, 4), 16, 10).cast("long") % stagger
    )
    wave = (
        F.floor((F.col("host_rank") - 1) / per_host).cast("long") + offset
    ).alias("wave")
    return ranked.withColumn("wave", wave)


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """robots.txt bodies -> one row per applicable path rule:
    ``(host, directive in {'allow','disallow'}, prefix, rule_len)``.

    Group semantics follow the robots exclusion protocol: a rule line
    belongs to the group opened by the block of consecutive ``User-agent``
    lines immediately above it, and applies when any UA line in that block
    names ``user_agent`` (default ``*``; matched case-insensitively,
    exact token — no UA substring matching).  Comments (``#...``), CR, and
    surrounding whitespace are stripped; ``Allow:``/``Disallow:`` with an
    empty value is a no-op per spec and is dropped.  Wildcard ``*``/``$``
    PATTERN rules are NOT interpreted (prefix semantics only — the
    original protocol; documented simplification).

    Shape at scale: one shuffle on ``host`` feeds the two line windows
    (block-start lag + running section sum); everything else is map-side
    regexp.  Bodies are per-host dim data — tiny next to a frontier.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col).cast("string"), "\n")).alias(
            "idx", "_raw"
        ),
    ).select(
        "host",
        "idx",
        # strip comments, CR, and edge whitespace: the grammar's canonical line
        F.trim(F.regexp_replace(F.regexp_replace("_raw", "#.*", ""), "\r", "")).alias(
            "line"
        ),
    )
    ua_val = F.regexp_extract(F.col("line"), r"(?i)^user-agent\s*:\s*(\S*)", 1)
    directive = F.lower(F.regexp_extract(F.col("line"), r"(?i)^(allow|disallow)\s*:", 1))
    prefix = F.regexp_extract(F.col("line"), r"(?i)^(?:allow|disallow)\s*:\s*(\S*)", 1)
    marked = lines.select(
        "host",
        "idx",
        (ua_val != "").alias("is_ua"),
        F.lower(ua_val).alias("ua"),
        directive.alias("directive"),
        prefix.alias("prefix"),
    )
    w = Window.partitionBy("host").orderBy("idx")
    # a UA line NOT preceded by another UA line opens a new group
    block_start = F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
    sec = marked.withColumn(
        "section", F.sum(block_start.cast("int")).over(w)
    )
    star_sections = (
        sec.filter(F.col("is_ua") & (F.col("ua") == user_agent.lower()))
        .select("host", "section")
        .distinct()
    )
    rules = sec.filter((F.col("directive") != "") & (F.col("prefix") != "")).join(
        star_sections, on=["host", "section"], how="leftsemi"
    )
    return rules.select(
        "host",
        "directive",
        "prefix",
        F.length("prefix").cast("int").alias("rule_len"),
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Frontier politeness gate: -> input + ``(allowed int, rule string)``.

    ``rules`` is parse_robots output.  Longest-prefix rule wins; on equal
    length ``allow`` beats ``disallow`` (the least-restrictive tie rule);
    no matching rule (or no rules for the host) = allowed.  Matching is
    on the URL's path+query with prefix semantics.

    Shape at 10^12 URLs: one equi-join on host (broadcast the rule table
    when it fits — robots rules are per-host dim data), candidate rules
    filtered map-side by startswith, one window on the URL key to pick
    the winner, one left join back.  No pattern cross-join anywhere.
    """
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    path0 = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    keyed = urls.withColumn("_rhost", host).withColumn("_rpath", path)
    cand = keyed.select(url_col, "_rhost", "_rpath").join(
        rules.withColumnRenamed("host", "_rhost"), on="_rhost"
    ).filter(F.col("_rpath").startswith(F.col("prefix")))
    wv = Window.partitionBy(url_col).orderBy(
        F.desc("rule_len"), F.asc("directive"), F.asc("prefix")
    )
    winner = (
        cand.withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == 1)
        .select(
            url_col,
            F.col("directive").alias("_rdir"),
            F.col("prefix").alias("rule"),
        )
    )
    out = keyed.join(winner, on=url_col, how="left")
    return out.select(
        *urls.columns,
        (F.coalesce(F.col("_rdir") == "allow", F.lit(True))).cast("int").alias(
            "allowed"
        ),
        "rule",
    )


# ---------------------------------------------------------------------------
# Sitemap parsing (sitemaps.org XML protocol)

# the chain extract_text uses, imported lazily to avoid a module cycle
def _decode_entities(col: Column) -> Column:
    from ..functions.text import _ENTITIES

    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap XML bodies -> one row per entry.

    Handles both document kinds of the sitemaps.org protocol in one pass:
    ``<urlset>`` page entries (kind='url') and ``<sitemapindex>`` child
    sitemaps (kind='sitemap' — feed them back into the fetcher).  Per
    entry: entity-decoded ``loc`` plus optional ``lastmod`` / ``changefreq``
    / ``priority`` ('' -> NULL, priority cast to double).

    Entirely JVM-side (two regexp_extract_all inventories + per-block
    regexp_extract — map-only, no shuffle, no Python; patterns avoid
    backreferences so a DuckDB RE2 twin can replay them verbatim).  At
    10^12 scale this is a flatMap over the robots/sitemap fetch table:
    parallelism == input partitioning.
    """
    xml = F.col(xml_col).cast("string")

    def _entries(kind: str) -> DataFrame:
        block = F.explode(
            F.regexp_extract_all(xml, F.lit(f"(?s)<{kind}>(.*?)</{kind}>"), F.lit(1))
        ).alias("_block")
        b = F.col("_block")

        def _field(tag: str) -> Column:
            return F.nullif(
                F.regexp_extract(b, f"(?s)<{tag}>\\s*([^<]*?)\\s*</{tag}>", 1),
                F.lit(""),
            )

        return sitemaps.select(F.col(host_col).alias("host"), block).select(
            "host",
            F.lit(kind).alias("kind"),
            _decode_entities(_field("loc")).alias("loc"),
            _field("lastmod").alias("lastmod"),
            _field("changefreq").alias("changefreq"),
            _field("priority").cast("double").alias("priority"),
        )

    out = _entries("url").unionAll(_entries("sitemap"))
    return out.filter(F.col("loc").isNotNull())


# ---------------------------------------------------------------------------
# Crawl-trap detection


def url_template(url: Column) -> Column:
    """Structural template of a URL — what's left when the variable parts
    are collapsed: long hex runs -> 'H' (session ids / content hashes,
    collapsed FIRST so their digits don't fragment into N-runs), digit
    runs -> 'N', query-param VALUES dropped (keys kept).  Calendar pages
    `/cal/2026/08/18` and `/cal/2027/01/02` share one template; so do
    `?sid=deadbeef01` session spam URLs.  Pure JVM regexps, no
    backreferences (DuckDB RE2 replays the chain verbatim)."""
    t = F.regexp_replace(url, r"[0-9a-f]{8,}", "H")
    t = F.regexp_replace(t, r"[0-9]+", "N")
    return F.regexp_replace(t, r"=[^&#]*", "=")


def detect_traps(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    min_urls: int = 100,
    max_depth: int = 8,
) -> DataFrame:
    """Flag crawler traps in a frontier — the URL families that eat fetch
    budget without adding content: calendar/pagination/session-id spaces
    where one page template generates unbounded URLs, unboundedly deep
    paths, and path-segment cycles (`/a/b/a/b/a/b`).

    Adds per-URL columns:
      - ``template``       (:func:`url_template`)
      - ``template_urls``  distinct frontier URLs sharing (host, template)
      - ``depth``          path-segment count
      - ``cycle``          true when >= 2 duplicate path segments
      - ``is_trap``        template_urls >= min_urls OR depth > max_depth
                           OR cycle

    Scale shape (10^12-URL frontier): template counting is ONE
    partial-aggregated shuffle on (host, template) — the reduced table is
    ~templates, orders of magnitude smaller than URLs — and the verdict
    join shuffles on the same key (AQE broadcasts the reduced side when
    it fits).  Everything else is map-side column exprs.
    """
    if min_urls < 1:
        raise ValueError(f"min_urls must be >= 1, got {min_urls}")
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    u = F.col(url_col)
    # path = after the host, before ?/#; '' for bare hosts
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    base = frontier.withColumn("template", url_template(u)).withColumn(
        "depth", F.size(segs)
    ).withColumn(
        "cycle", (F.size(segs) - F.size(F.array_distinct(segs))) >= 2
    )
    counts = base.groupBy(F.col(host_col).alias("_h"), F.col("template").alias("_t")).agg(
        F.count_distinct(u).alias("template_urls")
    )
    # null-safe equality: NULL-host / NULL-url rows are exactly the junk a
    # trap detector must SURFACE, not silently drop (groupBy already keeps
    # null keys, so the counts side has their row)
    out = base.join(
        counts,
        F.col(host_col).eqNullSafe(F.col("_h"))
        & F.col("template").eqNullSafe(F.col("_t")),
    ).drop("_h", "_t")
    return out.withColumn(
        "is_trap",
        (F.col("template_urls") >= min_urls)
        | (F.col("depth") > max_depth)
        | F.col("cycle"),
    )


# ---------------------------------------------------------------------------
# Recrawl scheduling from change history


def recrawl_priority(
    snapshots: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
    now=None,
) -> DataFrame:
    """Per-URL refresh priority from fetch history — the freshness model
    behind incremental recrawl (Cho & Garcia-Molina: pages change at
    wildly different rates; re-fetching everything uniformly wastes most
    of the fetch budget on static pages).

    Input: one row per historical fetch (url, fetch_ts, content_hash —
    the hash of the EXTRACTED content, so boilerplate churn doesn't count
    as change).  Per URL:

      - ``n_fetches``; ``n_changes`` = fetches whose hash differs from
        the PREVIOUS fetch (first fetch is no observation);
      - ``change_rate`` = (n_changes + 0.5)/(n_obs + 1.0) — Laplace-
        smoothed so a never-observed-changing page keeps a small nonzero
        rate (it may still change) and one noisy flip doesn't saturate;
      - ``age_secs`` = ``now`` − last fetch;
      - ``priority`` = age_secs × change_rate — the expected-staleness
        proxy; feed it straight into :func:`schedule_crawl` as the wave
        priority.

    ``now`` must be an explicit epoch-seconds value (no wall-clock reads:
    schedules must replay identically across runs and engines).

    Scale shape: ONE shuffle on the url key serves both the lag window
    and the rollup aggregate (same partitioning, no second exchange);
    output is one row per url.
    """
    if now is None:
        raise ValueError("recrawl_priority requires an explicit `now` epoch seconds")
    w = Window.partitionBy(url_col).orderBy(F.col(ts_col).asc(), F.col(hash_col).asc())
    prev = F.lag(F.col(hash_col)).over(w)
    obs = snapshots.withColumn(
        "_chg",
        F.when(prev.isNull(), F.lit(None).cast("int")).otherwise(
            (F.col(hash_col) != prev).cast("int")
        ),
    )
    g = obs.groupBy(url_col).agg(
        F.count("*").alias("n_fetches"),
        F.count("_chg").alias("n_obs"),
        F.coalesce(F.sum("_chg"), F.lit(0)).alias("n_changes"),
        F.max(F.col(ts_col)).alias("last_fetch"),
    )
    rate = (F.col("n_changes") + F.lit(0.5)) / (F.col("n_obs") + F.lit(1.0))
    age = F.lit(float(now)) - F.unix_timestamp(F.col("last_fetch")).cast("double")
    return g.select(
        url_col,
        "n_fetches",
        "n_changes",
        rate.alias("change_rate"),
        age.alias("age_secs"),
        (age * rate).alias("priority"),
    )
