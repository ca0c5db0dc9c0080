"""End-to-end corpus curation — the training-data pipeline as ONE composed
plan (quality gate → exact-dedup canonical keep → benchmark decontamination
→ context-window chunking).

Each stage is an independently-tested operator; this module only composes
them, so the whole pipeline stays a single Catalyst plan: filters fuse into
the scans, the dedup keep-list and the benchmark gram index broadcast, and
nothing materializes between stages. At 100 TB the pipeline is (a) one
corpus scan feeding map-side signals, (b) one fingerprint shuffle, (c) one
near-unique-key contamination aggregate, (d) a shuffle-free chunk explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fxspark.ops.dedup import ngram_overlap
from fxspark.ops.text import (
    chunk_tokens,
    dup_token_frac,
    fingerprint,
    mean_word_len,
    tokens,
    top_ngram_stats,
)


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_dup_token_frac: float = 0.6,
    max_top_trigram_frac: float = 0.05,
    contam_ngram: int = 4,
    chunk_size: int = 32,
    chunk_stride: int = 16,
    min_chunk_tokens: int = 8,
) -> DataFrame:
    """Documents → training chunks, applying the standard curation ladder:

    1. quality gate (word count, mean word length 3-10, repeated-token and
       top-trigram fractions under thresholds),
    2. exact dedup — keep the smallest ``id_col`` per normalized-text
       fingerprint,
    3. drop documents sharing any token ``contam_ngram``-gram with the
       ``bench`` frame (eval-set decontamination),
    4. chunk survivors into overlapping ``chunk_size``-token windows.

    Returns (id, chunk_idx, n_tokens, chunk_text).
    """
    t = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.size(t).alias("_wc"),
        mean_word_len(F.col(text_col)).alias("_mwl"),
        dup_token_frac(F.col(text_col)).alias("_dtf"),
        fingerprint(F.col(text_col)).alias("_fp"),
    )
    rep = top_ngram_stats(docs, id_col, text_col, n=3).select(
        F.col(id_col),
        (F.col("top_ngram_count").cast("double") / F.col("total_ngrams"))
        .alias("_ttf"),
    )
    gated = (
        base.join(rep, id_col, "left")
        .withColumn("_ttf", F.coalesce(F.col("_ttf"), F.lit(0.0)))
        .filter(
            (F.col("_wc") >= min_words)
            & F.col("_mwl").between(3, 10)
            & (F.col("_dtf") < max_dup_token_frac)
            & (F.col("_ttf") < max_top_trigram_frac)
        )
    )
    # canonical copy per fingerprint — among GATED docs (gate first, then
    # dedup: a low-quality duplicate must not displace a passing one).
    # Window-min on the fingerprint, NOT a keep-list join: the canonical set
    # is corpus-sized, so broadcasting it would melt at scale — this is one
    # uniform hash shuffle on the 128-bit fingerprint instead.
    from pyspark.sql import Window

    w = Window.partitionBy("_fp")
    kept = (
        gated.withColumn("_min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_min_id"))
        .drop("_min_id")
    )
    contaminated = ngram_overlap(
        kept, bench, id_col, text_col, n=contam_ngram
    ).select(id_col)
    clean = kept.join(F.broadcast(contaminated), id_col, "anti")
    return chunk_tokens(
        clean, id_col, text_col,
        size=chunk_size, stride=chunk_stride, min_tokens=min_chunk_tokens,
    )
