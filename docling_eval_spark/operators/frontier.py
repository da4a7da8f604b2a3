"""Crawl-frontier operators: sitemap parsing, frontier merge, and
politeness scheduling.

The discovery half of a crawler: sitemaps announce URLs, the frontier
merges announcements with what the ledger already knows (new URL? stale
URL worth refetching?), and the politeness scheduler turns the ranked
frontier into per-host fetch slots that respect crawl-delay. All three
are pure DataFrame expressions — the sitemap parse is regexp-only (no
XML library, no Python UDF), so the whole path stays inside
whole-stage codegen and a DuckDB oracle replays it exactly.

Scale shapes:

- ``sitemap_parse`` — explode of ``regexp_extract_all`` over ``<url>``
  blocks: narrow, zero shuffle; a 10^7-sitemap scan parallelizes by
  input split.
- ``frontier_merge`` — one broadcast-or-shuffle left join of announced
  urls against the seen-set projection (url only — column-pruned), then
  a per-host top-k window; the window sorts only each host's announced
  urls, bounded by sitemap size, not corpus size.
- ``politeness_schedule`` — one hash exchange on the host; slots are
  rank arithmetic (O(1) window state), workers are a deterministic hash
  of the host so a host never spans two workers (per-host rate limits
  hold without coordination).

Reference scope: DS4SD/docling-eval has no crawler/frontier code; this
is pipeline capability beyond the reference surface (sitemap semantics
follow sitemaps.org protocol 0.9).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from docling_eval_spark.operators.text_analysis import portable_char_hash

# (?s): real sitemaps are pretty-printed — <url> blocks span lines
_URL_BLOCK = "(?s)<url>(.*?)</url>"
_LOC = "<loc>([^<]*)</loc>"
_LASTMOD = "<lastmod>([^<]*)</lastmod>"
_PRIORITY = "<priority>([^<]*)</priority>"


def sitemap_parse(
    df: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Parse sitemap XML into ``(keep_cols..., loc, lastmod,
    priority_pct)`` — one row per ``<url>`` entry.

    ``priority_pct`` is the sitemap ``<priority>`` scaled to an exact
    integer percent (missing -> the protocol default 0.5 -> 50);
    ``lastmod`` stays the raw W3C date string (missing -> NULL). Regex
    parsing is deliberate: sitemap entries are flat, order-free tags
    inside ``<url>`` blocks, so two anchored extracts per field beat
    shipping every byte through a Python XML parser — and the plan
    stays fully codegen'd."""
    block = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), F.lit(1))
    ).alias("__b")
    rows = df.select(*keep_cols, block)
    pr = F.regexp_extract(F.col("__b"), _PRIORITY, 1)
    return rows.select(
        *keep_cols,
        F.regexp_extract(F.col("__b"), _LOC, 1).alias("loc"),
        F.nullif(
            F.regexp_extract(F.col("__b"), _LASTMOD, 1), F.lit("")
        ).alias("lastmod"),
        F.when(pr == "", F.lit(50))
        .otherwise(F.round(pr.cast("double") * 100).cast("int"))
        .alias("priority_pct"),
    )


def frontier_merge(
    announced: DataFrame,
    seen: DataFrame,
    url_col: str = "loc",
    seen_url_col: str = "url",
    host_col: str = "host",
    per_host_k: int = 100,
) -> DataFrame:
    """Rank announced URLs into a fetch frontier: ``(host, loc,
    lastmod, priority_pct, is_new, fetch_rank)``.

    New URLs (never crawled) outrank known ones; within each class the
    sitemap priority descends and the url string breaks ties, so the
    frontier is deterministic. ``per_host_k`` caps each host's slice of
    the frontier — the window sorts only that host's announced urls.
    The seen-set join is column-pruned to the url; Spark broadcasts it
    when small and shuffles both sides on the url when not.

    A url announced by several sitemaps collapses to ONE deterministic
    row — the highest priority wins, remaining columns break ties as
    the greatest struct (a bare dropDuplicates would pick an arbitrary
    survivor and change across runs/partitionings)."""
    payload = [c for c in announced.columns if c != url_col]
    pick_order = (
        ["priority_pct"] if "priority_pct" in payload else []
    ) + [c for c in payload if c != "priority_pct"]
    ann = (
        announced.groupBy(url_col)
        .agg(F.max(F.struct(*pick_order)).alias("__p"))
        .select(url_col, *[F.col(f"__p.{c}").alias(c) for c in payload])
    )
    s = seen.select(F.col(seen_url_col).alias(url_col)).dropDuplicates(
        [url_col]
    ).withColumn("__seen", F.lit(1))
    j = ann.join(s, url_col, "left").withColumn(
        "is_new", F.col("__seen").isNull()
    )
    w = Window.partitionBy(host_col).orderBy(
        F.col("is_new").desc(),
        F.col("priority_pct").desc(),
        F.col(url_col),
    )
    return (
        j.withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= per_host_k)
        .drop("__seen")
    )


def politeness_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "loc",
    rank_col: str = "fetch_rank",
    delay_ms: int = 1000,
    num_workers: int = 32,
) -> DataFrame:
    """Assign each frontier URL a worker and a fetch slot:
    ``(host, loc, worker, slot_ms)``.

    ``worker = horner(host) mod num_workers`` pins every host to
    exactly one worker, so per-host crawl-delay holds with zero
    cross-worker coordination; ``slot_ms = (rank - 1) * delay_ms``
    spaces that host's fetches. Deterministic, integer-exact, one
    narrow projection over an already-ranked frontier."""
    worker = F.pmod(
        portable_char_hash(F.col(host_col)), F.lit(num_workers)
    ).cast("int")
    return frontier.select(
        host_col,
        url_col,
        worker.alias("worker"),
        ((F.col(rank_col) - 1) * delay_ms).cast("long").alias("slot_ms"),
    )


_SITEMAP_DIRECTIVE = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"


def robots_sitemaps(
    df: DataFrame,
    robots_col: str = "robots_txt",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Discover sitemap URLs announced in robots.txt: one row per
    ``Sitemap:`` directive (RFC 9309 §2.3 / sitemaps.org: key is
    case-insensitive, value is an absolute URL, the directive may
    appear anywhere in the file, multiple are allowed). Closes the
    frontier loop: robots.txt -> sitemap urls -> :func:`sitemap_parse`
    -> :func:`frontier_merge`. Pure regexp explode — zero shuffle,
    zero UDF."""
    return df.select(
        *keep_cols,
        F.explode(
            F.regexp_extract_all(
                F.col(robots_col), F.lit(_SITEMAP_DIRECTIVE), F.lit(1)
            )
        ).alias("sitemap_url"),
    )


def crawl_budget_plan(
    fetches: DataFrame,
    url_col: str = "url",
    ts_col: str = "crawl_ts",
    digest_col: str = "digest",
    base_budget: int = 100,
    min_urls: int = 100,
    trap_ratio: float = 5.0,
) -> DataFrame:
    """Per-host recrawl BUDGET — the frontier-planning rollup that
    turns two observed signals into next-cycle fetch allowances:

    - the trap gate (:func:`web_ops.crawl_trap_score` over the fetch
      log's distinct URLs): a host minting unbounded URLs from few
      skeletons gets budget 0 — crawling it deeper is wasted fetches;
    - observed churn (:func:`temporal.snapshot_churn` keyed on the
      host derived FROM the url, so both branches share one host
      universe by construction): hosts whose re-fetches actually
      change earn proportionally more budget (the Cho &
      Garcia-Molina revisit intuition, integer-exact form).

    budget = 0 if trap else
             (base_budget * (1 + 2*n_changed)) DIV (1 + n_refetch)
    with n_refetch = n_changed + n_unchanged — all-integer arithmetic,
    so the DuckDB oracle reproduces every value bit-for-bit; a host
    never re-fetched gets ~base_budget (no evidence yet), an
    all-changing host approaches 2*base_budget, a static host decays
    toward 0.

    Scale shape: the trap branch is one two-distinct hash agg per
    host; the churn branch is one url-keyed lag window + one host agg;
    the final join is per-HOST rows (millions, not trillions) — every
    upstream shuffle is keyed on url or host, and the output frame is
    small enough to broadcast straight back into the politeness
    scheduler."""
    from docling_eval_spark.operators.temporal import snapshot_churn
    from docling_eval_spark.operators.web_ops import (
        crawl_trap_score,
        host_col,
    )

    traps = crawl_trap_score(
        fetches.select(F.col(url_col).alias("url")),
        min_urls=min_urls,
        ratio=trap_ratio,
    )
    churn = snapshot_churn(
        fetches.withColumn("__host", host_col(url_col)),
        key=url_col,
        ts=ts_col,
        digest=digest_col,
        host="__host",
    ).withColumnRenamed("__host", "host")
    j = traps.join(churn, "host")
    budget = F.when(F.col("trap"), F.lit(0)).otherwise(
        F.expr(
            f"CAST(({base_budget} * (1 + 2 * n_changed)) DIV "
            "(1 + n_changed + n_unchanged) AS BIGINT)"
        )
    )
    return j.select(
        "host",
        "n_urls",
        "n_skeletons",
        "trap",
        "n_fetches",
        "n_changed",
        "n_unchanged",
        "change_rate",
        budget.cast("bigint").alias("budget"),
    )
