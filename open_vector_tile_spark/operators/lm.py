"""Count-based bigram language model + perplexity scoring (quality gate).

CCNet-style corpus curation scores every document against a reference
language model and keeps the low-perplexity head (Wenzek et al. 2020 use
a KenLM 5-gram; DataComp-LM and Gopher both gate on LM score).  At
10^12-document scale the model itself must be trained distributively, so
this module implements the web-scale classic: a count-based bigram model
with **Stupid Backoff** smoothing (Brants et al. 2007, "Large Language
Models in Machine Translation" — designed exactly for MapReduce-trained
trillion-token counts, no discounting normalization pass needed):

    S(b | a) = n_ab / n_a              if the bigram was seen in training
             = alpha * n_b / N         else, if unigram b was seen
             = alpha * 1 / N           else (OOV floor, one pseudo-count)

Per-document score = mean negative log-likelihood over the document's
bigrams, in nats/token (``avg_nll``); ``ppl = exp(avg_nll)`` is monotone
in it, so gating on avg_nll IS the perplexity gate without a second
transcendental in the compare key.

Scale shape (100 TB corpus):
- training is two partial-agg count shuffles (unigrams, bigrams) over
  token arrays; bigram adjacency is built INSIDE the array via
  slice+arrays_zip (map-side, no window) — the collocations pattern;
- scoring compresses each document to its DISTINCT bigrams first
  (groupBy doc/a/b with counts), so the model join moves one row per
  distinct bigram per doc, not one per token;
- the bigram-model join is a plain equi-join on (a, b) — at web scale
  both sides are corpus-sized and shuffle once; the unigram model is
  vocabulary-sized and broadcasts;
- per-doc reduction is one sorted-fold aggregate (cross-engine
  bit-determinism: double addition is non-associative, the sorted fold
  pins the order; the DuckDB twin is ``sum(x ORDER BY x)``).

Train/score split: the model is trained on a *reference slice* of the
corpus (a predicate, e.g. ``doc_id % 2 = 0`` or ``lang = 'en'``) and
scores every document — unseen bigrams in the held-out documents are
what exercises the backoff, exactly like CCNet scoring Common Crawl
against a Wikipedia-trained model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bigram_lm", "perplexity_score"]


def _token_arrays(docs: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    from open_vector_tile_spark.functions.text import ws_tokens

    cols = [F.col(id_col)] if id_col else []
    return docs.select(*cols, ws_tokens(text_col).alias("ts"))


def _bigram_pairs(toks: DataFrame, extra_cols: list[str]) -> DataFrame:
    """(extra..., a, b) one row per adjacent token pair inside each array."""
    sz = F.size("ts")
    return toks.select(
        *extra_cols,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.greatest(sz - 1, F.lit(0))).alias("a"),
                F.slice(F.col("ts"), 2, F.greatest(sz - 1, F.lit(0))).alias("b"),
            )
        ).alias("p"),
    ).select(*extra_cols, F.col("p.a").alias("a"), F.col("p.b").alias("b"))


def train_bigram_lm(
    train_docs: DataFrame, *, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (unigrams, bigrams, total): ``unigrams`` = (term, n_term),
    ``bigrams`` = (a, b, n_ab), ``total`` = 1-row (n_tokens).

    Each is one partial-agg shuffle; the token scan is shared via a lazy
    localCheckpoint (Catalyst does not CSE across join branches — without
    the cut the corpus would re-tokenize once per model table)."""
    toks = _token_arrays(train_docs, text_col, None).localCheckpoint(eager=False)
    # fail loudly on an empty reference slice (a silent empty model would
    # null every score downstream); the count also materializes the
    # checkpoint the model tables share
    n_train = toks.select(F.sum(F.size("ts")).alias("n")).first()["n"]
    if not n_train:
        raise ValueError(
            "train_bigram_lm: reference slice has no tokens — check the "
            "training predicate"
        )
    unigrams = (
        toks.select(F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n_term"))
    )
    bigrams = (
        _bigram_pairs(toks, [])
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    total = unigrams.agg(F.sum("n_term").cast("long").alias("n_tokens"))
    return unigrams, bigrams, total


def _backoff_logscore(alpha: float) -> Column:
    """ln S(b|a) as a fixed double chain — identical op order in the SQL
    twin.  Inputs: n_ab (null if unseen), n_a (null if context unseen —
    only possible when the bigram is also unseen), n_b (null if OOV),
    n_tokens."""
    n = F.col("n_tokens").cast("double")
    seen = F.col("n_ab").isNotNull()
    # a seen bigram implies a seen context unigram (training counted both
    # from the same token stream), so n_a is non-null whenever n_ab is
    mle = F.col("n_ab").cast("double") / F.col("n_a").cast("double")
    backoff = F.lit(float(alpha)) * (
        F.coalesce(F.col("n_b"), F.lit(1)).cast("double") / n
    )
    return F.log(F.when(seen, mle).otherwise(backoff))


def perplexity_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document LM score: (id, n_bigrams, avg_nll).

    ``avg_nll`` = mean over the document's adjacent token pairs of
    -ln S(b|a), nats per predicted token; null when the document has
    fewer than 2 tokens (no bigram events — a length gate elsewhere owns
    those).  Deterministic under any partitioning: the per-doc sum is a
    sorted fold over per-distinct-bigram contributions.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    unigrams, bigrams, total = model
    toks = _token_arrays(docs, text_col, id_col)
    # compress to distinct bigrams per doc BEFORE the model join: the join
    # then moves |distinct pairs| rows, and the multiplicity scales the
    # log-score afterwards (cnt * ln s — same product in the twin)
    ev = (
        _bigram_pairs(toks, [id_col])
        .groupBy(id_col, "a", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    ua = unigrams.select(F.col("term").alias("a"), F.col("n_term").alias("n_a"))
    ub = unigrams.select(F.col("term").alias("b"), F.col("n_term").alias("n_b"))
    scored = (
        ev.join(bigrams, ["a", "b"], "left")
        .join(F.broadcast(ua), "a", "left")
        .join(F.broadcast(ub), "b", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "cnt",
            (F.col("cnt").cast("double") * _backoff_logscore(alpha)).alias("_ll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.aggregate(
            F.sort_array(F.collect_list("_ll")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_ll_sum"),
    )
    # left join from the full doc list so <2-token docs surface with
    # n_bigrams = 0 / null score instead of silently disappearing
    base = docs.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        (-F.col("_ll_sum") / F.col("n_bigrams").cast("double")).alias("avg_nll"),
    )
