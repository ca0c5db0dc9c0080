"""Distributed BPE merge training — the tokenizer-learning loop as an
iterative Spark algorithm.

``ops/text.bpe_token_count`` APPLIES a fixed GPT-2-style pre-tokenization;
this module LEARNS merges from the corpus (Sennrich et al. 2016, the
standard subword algorithm): start from characters, repeatedly (1) count
adjacent symbol pairs weighted by word frequency, (2) take the most
frequent pair, (3) merge its leftmost non-overlapping occurrences in every
word, until ``n_merges`` rules exist.

Scale shape — the same two-level trick as every text operator here:
the corpus collapses to the WORD-FREQUENCY table once (one shuffle, corpus
-> vocabulary), and all iterations run on that vocabulary-sized frame:
pair counting is a partial-combined groupBy; the argmax is a 1-row
TakeOrdered (collected — bounded, the ``kmeans_lloyd`` codebook
discipline); the merge application is a per-word left fold
(``F.aggregate`` over the symbol array — interpreted, but vocabulary-
sized, and embarrassingly parallel). ``localCheckpoint`` truncates the
lineage each iteration so the plan stays O(1) deep regardless of merge
count, exactly like PageRank's iterations.

Determinism: pair counts are exact integers; ties in the argmax break
lexically on (left, right); the fold's merge rule (push symbol; if the
top two of the stack equal the pair, replace them) is equivalent to the
leftmost-non-overlapping scan — both pinned by test, including the
overlapping ``aaa`` case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, freq, syms) where syms is the word's character
    array — the vocabulary-sized state every BPE iteration runs on."""
    from fxspark.ops.text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split("word", ""))
    )


def _apply_merge(syms, a: str, b: str):
    """Leftmost-non-overlapping merge of adjacent (a, b) -> a||b as a left
    fold: push each symbol; when the top two of the stack are exactly
    (a, b), replace them with the merged symbol. Literals go through
    ``F.lit`` so arbitrary symbol text needs no escaping."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.get(acc, F.size(acc) - 1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbol state: one
    map-side explode of (len-1) pairs per word + a partial-combined
    groupBy. Returns (left_sym, right_sym, pair_count)."""
    pairs = state.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
                F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
    ).agg(F.sum("freq").alias("pair_count"))


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` merge rules; returns
    ``[(merge_rank, left_sym, right_sym, pair_count), …]`` in training
    order. Stops early if no pair remains (all words single-symbol)."""
    state = word_freq_symbols(df, text_col).localCheckpoint()
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            pair_counts(state)
            .orderBy(
                F.desc("pair_count"), "left_sym", "right_sym"
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = (
            top[0]["left_sym"],
            top[0]["right_sym"],
            int(top[0]["pair_count"]),
        )
        out.append((rank, a, b, cnt))
        if rank < n_merges:
            # The post-merge state only feeds the NEXT iteration's pair
            # count — after the final argmax it is never read, so the last
            # merge application + checkpoint job was pure waste (round-18
            # phase profile: build 1.28 s / 8 jobs for 3 merges; one of
            # those jobs was this dead final merge).
            state = state.withColumn(
                "syms", _apply_merge(F.col("syms"), a, b)
            ).localCheckpoint()
    return out


def bpe_train_df(df: DataFrame, text_col: str, n_merges: int) -> DataFrame:
    """``bpe_train`` as a DataFrame: (merge_rank, left_sym, right_sym,
    pair_count, merged) — the learned tokenizer head, ready to broadcast
    into an application pass."""
    rows = bpe_train(df, text_col, n_merges)
    return df.sparkSession.createDataFrame(
        [(r, a, b, c, a + b) for r, a, b, c in rows],
        "merge_rank int, left_sym string, right_sym string, "
        "pair_count long, merged string",
    )
