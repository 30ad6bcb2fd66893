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

__all__ = ["schedule_crawl"]


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
