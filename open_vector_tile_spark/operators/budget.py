"""Per-tile byte-budget enforcement — the tile server's size guardrail.

Vector-tile consumers enforce hard tile-size limits (Mapbox's canonical
500 KB compressed guidance; the reference's own motivation is tile size,
motivation.md:84-230): a z12 tile over Manhattan cannot carry every POI.
The standard fix is priority decimation — rank features per tile, keep
the most important ones until the byte budget is spent, drop the rest —
applied BEFORE encoding so the dropped features never shuffle into the
encoder.

Cost model: the caller supplies a per-feature cost column (exact bytes
if re-encoding measured sizes, or the documented estimate
:func:`feature_cost_estimate` — varint-delta geometry at ~2 bytes per
coordinate delta plus fixed per-feature framing).  Enforcement is exact
relational algebra: rank window per tile (priority desc, id asc for
determinism) + running cost sum; a feature is kept while the cumulative
cost INCLUDING it fits the budget.  "First overflow stops the tile"
(contiguous prefix, not best-fit knapsack) — the deterministic,
SQL-replayable rule every tile server actually ships.

Scale shape: ONE shuffle on the tile key (the same key the encoder
groups by next — co-partitioned, so AQE reuses the exchange), windows
run within partitions, no driver state.  Summaries are a partial-agg
groupBy over the already-ranked rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["feature_cost_estimate", "enforce_tile_budget", "tile_budget_summary"]

TILE_KEY = ("zoom", "tile_x", "tile_y")


def feature_cost_estimate(geom_xy: Column) -> Column:
    """Documented encode-size estimate (bytes) for a feature whose
    ``geom_xy`` is the FLAT quantized coordinate array
    ``[x0, y0, x1, y1, ...]`` — the featurizers' canonical layout
    (tiler.FEATURE_SCHEMA): ~2.5 bytes per coordinate varint delta after
    zigzag (5 bytes/vertex; empirical mid-zoom average — deltas are small
    because vertices are spatially local) + 12 bytes per-feature framing
    (id varint, flag word, property indices).  An ESTIMATE for planning —
    byte-exact budgeting feeds measured sizes instead."""
    n_coords = F.size(geom_xy)
    return (F.lit(12) + F.ceil(n_coords * F.lit(2.5))).cast("long")


def enforce_tile_budget(
    features: DataFrame,
    budget_bytes: int,
    priority_col: str = "priority",
    cost_col: str = "cost_bytes",
    id_col: str = "id",
    keep_dropped: bool = False,
) -> DataFrame:
    """Keep, per tile, the highest-priority features whose cumulative
    cost fits ``budget_bytes``; drop the rest.

    Rule (deterministic, replayable): order by (priority DESC, id ASC);
    feature i is kept iff sum(cost of features 1..i) <= budget.  The
    first feature of a tile is kept even when it alone exceeds the
    budget ONLY if it fits — an over-budget single feature is dropped
    too (tiles never exceed the budget, period; callers who must render
    something lower the feature's cost by simplifying first).

    Adds ``rank`` (1-based within tile), ``cum_cost``, and ``kept``.
    With ``keep_dropped=False`` (default) only kept rows return —
    the exchange on the tile key is the SAME partitioning the tile
    encoder needs next, so enforcement adds no extra shuffle to the
    encode pipeline.
    """
    if budget_bytes < 1:
        raise ValueError(f"budget_bytes must be >= 1, got {budget_bytes}")
    for c in (*TILE_KEY, priority_col, cost_col, id_col):
        if c not in features.columns:
            raise ValueError(f"enforce_tile_budget: missing column {c!r}")
    w = Window.partitionBy(*TILE_KEY).orderBy(
        F.desc(priority_col), F.asc(id_col)
    )
    ranked = features.withColumn("rank", F.row_number().over(w)).withColumn(
        "cum_cost",
        F.sum(F.col(cost_col)).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    out = ranked.withColumn("kept", F.col("cum_cost") <= F.lit(budget_bytes))
    return out if keep_dropped else out.filter(F.col("kept")).drop("kept")


def tile_budget_summary(enforced: DataFrame, cost_col: str = "cost_bytes") -> DataFrame:
    """Per-tile audit of an ``enforce_tile_budget(keep_dropped=True)``
    result: kept/dropped feature counts and byte totals — the no-silent-
    caps ledger a tileset build publishes next to its output."""
    k = F.col("kept").cast("long")
    cost = F.col(cost_col)
    return enforced.groupBy(*TILE_KEY).agg(
        F.sum(k).alias("n_kept"),
        F.sum(F.lit(1) - k).alias("n_dropped"),
        F.sum(F.when(F.col("kept"), cost).otherwise(F.lit(0))).alias("kept_bytes"),
        F.sum(F.when(~F.col("kept"), cost).otherwise(F.lit(0))).alias("dropped_bytes"),
    )
