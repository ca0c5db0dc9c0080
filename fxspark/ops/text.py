"""Text-analysis operators (north-star extension, BASELINE.json).

Everything here is built-in ``pyspark.sql.functions`` expressions — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. At 100 TB these run as
pure map-side projections: no shuffle at all until an aggregation is asked
for, so they scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small English stopword set (public knowledge; the usual top function words)
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# Marker (function) words per language for the n-gram/stopword language-ID
# heuristic — the classic "profile" approach, tiny on purpose.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "que", "y", "es"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text (single-space split to stay
    byte-identical with the SQL oracle's ``string_split``)."""
    return F.split(F.lower(F.trim(col)), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern (public), restricted to the regex subset
# Java and DuckDB interpret identically: contractions, letter runs, digit
# runs, punctuation runs — each optionally space-prefixed.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(col: Column) -> Column:
    """Subword-style token count under the BPE-ish pre-tokenizer regex —
    the LLM-pipeline "how many tokens is this document" estimator (vs the
    whitespace ``token_count``)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0))


def punct_count(col: Column) -> Column:
    """Count of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))


def stopword_hits(col: Column, words: list[str] | None = None) -> Column:
    """Number of tokens (with multiplicity) that are stopwords."""
    words = STOPWORDS if words is None else words
    stop = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t)))


def stopword_ratio(col: Column) -> Column:
    return F.try_divide(stopword_hits(col), token_count(col))


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, ~2]:

    length term (saturating at 500 chars) + stopword-ratio term
    - punctuation-density penalty.  The exact formula is declared (and
    oracle-checked), not learned.

    The 4-dp grain is applied as ``floor(x*10^4 + 0.5)/10^4`` — declared
    half-up-toward-+inf rounding in pure IEEE + floor, which every engine
    computes bit-identically — instead of native ROUND, whose tie
    behavior splits across engines exactly on the 10^-4 halves that
    ratio sums land on (rule D22, DIALECT.md; found by the round-15
    sf0.1 probe: raw 0.78175 rounded to .7818 in Spark, .7817 in DuckDB).
    """
    n_chars = F.length(col).cast("double")
    length_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_term = F.coalesce(stopword_ratio(col), F.lit(0.0))
    punct_pen = F.try_divide(punct_count(col).cast("double"), n_chars)
    raw = length_term + stop_term - F.coalesce(punct_pen, F.lit(0.0))
    return F.floor(raw * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def lang_scores(col: Column, markers: dict[str, list[str]] | None = None) -> dict[str, Column]:
    """Marker-word hit count per language."""
    markers = LANG_MARKERS if markers is None else markers
    return {lang: stopword_hits(col, words) for lang, words in markers.items()}


def lang_id(col: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Argmax language by marker hits; 'unknown' when no marker fires.

    Deterministic tie-break: dict order (first language wins ties), encoded as
    a strict ``>`` comparison chain — identical semantics are easy to state in
    plain SQL for the oracle.
    """
    scores = lang_scores(col, markers)
    items = list(scores.items())
    best_lang = F.lit(items[0][0])
    best_score = items[0][1]
    for lang, s in items[1:]:
        best_lang = F.when(s > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(s > best_score, s).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("unknown"))


def ngrams(col: Column, n: int = 3) -> Column:
    """Token n-grams WITH multiplicity (order preserved) — the repetition /
    contamination primitive. Distinct-ified by ``dedup.shingles`` for set
    semantics; kept raw here because repetition signals need the counts.
    Empty array for docs shorter than ``n`` tokens."""
    t = tokens(col)
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )


def mean_word_len(col: Column) -> Column:
    """Average token length in characters — Gopher-style quality signal
    (very low ⇒ symbol soup, very high ⇒ concatenation junk). Map-side fold,
    no shuffle."""
    t = tokens(col)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.try_divide(total.cast("double"), F.size(t))


def dup_token_frac(col: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    ``1 − |distinct| / |tokens|``. High values flag boilerplate/looped text."""
    t = tokens(col)
    return F.lit(1.0) - F.try_divide(
        F.size(F.array_distinct(t)).cast("double"), F.size(t)
    )


def top_ngram_stats(
    df, id_col: str, text_col: str, n: int = 3
):
    """Per-document repetition profile over token ``n``-grams (with
    multiplicity): total n-gram count and the count of the single most
    frequent n-gram. ``top_count / total`` is the Gopher "fraction of
    characters in the most common n-gram" analogue.

    Plan: explode → two-level aggregate, both with map-side partial combine;
    the shuffle key (id, gram) is near-unique so no skew at any scale.
    """
    g = df.select(
        F.col(id_col).alias("_id"), F.explode(ngrams(F.col(text_col), n)).alias("_g")
    )
    per_gram = g.groupBy("_id", "_g").agg(F.count(F.lit(1)).alias("_c"))
    return per_gram.groupBy("_id").agg(
        F.sum("_c").alias("total_ngrams"), F.max("_c").alias("top_ngram_count")
    ).withColumnRenamed("_id", id_col)


def chunk_tokens(
    df,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 16,
    min_tokens: int = 8,
):
    """Split documents into overlapping token windows (``size`` tokens every
    ``stride``) — the context-length packing step that turns a document
    corpus into training examples. Chunks shorter than ``min_tokens`` (the
    tail) are dropped.

    Pure built-in expressions (sequence → posexplode → slice): the explode
    is map-side, so the operator is shuffle-free and scales with input
    splits; chunk_idx is the 0-based window ordinal."""
    t = tokens(F.col(text_col))
    starts = F.sequence(F.lit(1), F.size(t), F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        t.alias("_t"),
        F.posexplode(starts).alias("chunk_idx", "_s"),
    )
    chunk = F.slice(F.col("_t"), F.col("_s"), size)
    return (
        exploded.select(
            id_col,
            "chunk_idx",
            F.size(chunk).alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    (md5 rather than xxhash so the SQL oracle can reproduce it — both engines
    emit identical lowercase hex.)
    """
    return F.md5(F.lower(F.trim(col)).cast("binary"))


def rolling_fingerprint(
    col: Column, base: int = 131, mod: int = 1_000_000_007
) -> Column:
    """Polynomial rolling-hash fingerprint of the normalized text:
    ``h = (h * base + codepoint(char)) % mod`` folded left-to-right.

    Declared arithmetic (not an engine hash primitive), so any SQL engine can
    reproduce it bit-for-bit — the DuckDB oracle does. Pure map-side JVM
    expression; the fold stays in whole-stage codegen, no shuffle.
    """
    chars = F.filter(F.split(F.lower(F.trim(col)), ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


# --- PII redaction -----------------------------------------------------------
# Patterns restricted to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically — no lookaround, no backrefs — so redaction is
# oracle-differentiable. Order matters: EMAIL first (its local part can
# contain digit runs a later pattern would bite into).
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{2,3}-\d{3}-\d{3}-\d{4}\b"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails / SSNs / phone numbers / IPv4 addresses with
    ``<KIND>`` tokens — the standard pre-training scrub pass. Pure
    ``regexp_replace`` chain: JVM-side, codegen'd, map-only (zero shuffle
    at any scale)."""
    out = col
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind}>")
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts (for corpus audit dashboards). Counted on
    the progressively-redacted text exactly as ``redact_pii`` would see it,
    so overlapping patterns are attributed to the earlier kind."""
    out = {}
    cur = col
    for kind, pat in PII_PATTERNS:
        out[kind] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, f"<{kind}>")
    return out


def hashed_features(
    df,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
):
    """Signed feature hashing (the 'hashing trick', Weinberger et al. 2009):
    each token is hashed to one of ``n_buckets`` dimensions with a ±1 sign
    drawn from an independent hash bit, and a document's vector entry is the
    signed occurrence count — the fixed-width, vocabulary-free bag-of-words
    a downstream linear model trains on at 100 TB (no dictionary to build,
    broadcast, or keep consistent across shards).

    Both hashes derive from md5 (the engine-portable family
    ``ops/dedup.minhash_signatures`` declares): bucket = first-60-bits mod
    ``n_buckets``, sign = parity of hex digit 16 — so the exact vectors are
    replayable in any engine with md5, which is what makes a HASHED feature
    space oracle-checkable. Plan: explode tokens map-side, one
    partial-combined groupBy on (doc, bucket); zero entries are dropped
    (the output is the sparse vector). Pure JVM expressions end-to-end.
    """
    from pyspark.sql import functions as F

    t = F.explode(tokens(F.col(text_col))).alias("_tok")
    h = F.conv(F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10).cast("long")
    sign = (
        F.conv(F.substring(F.md5(F.col("_tok")), 16, 1), 16, 10).cast("long")
        % 2
    ) * 2 - 1
    return (
        df.select(F.col(id_col), t)
        .select(
            id_col,
            (h % n_buckets).alias("bucket"),
            sign.alias("_sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("_sign").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def zipf_fit(df, text_col: str, min_count: int = 2):
    """Zipf exponent of the corpus token distribution: OLS slope of
    ln(freq) on ln(rank) over the frequency table — natural text tracks
    slope ≈ −1, and deviations are a cheap corpus-health signal (template
    spam flattens the head, boilerplate dedup failures fatten it; the
    curation literature reads the exponent exactly this way).

    Plan: token counts are one partial-combined agg; the rank is a window
    over the DISTINCT-TERM frequency table (vocabulary-sized, orders below
    the corpus — same domain trick as ``events_key_skew_report``); the fit
    is five decimal-exact sufficient statistics over cast logarithms (the
    ``ops/stats.grouped_ols`` discipline with a real-valued x — logs are
    cast straight to DECIMAL(38,9), absorbing any last-ulp libm
    disagreement, which is what will make the r6 oracle twin hashable).
    Rare terms below ``min_count`` are excluded (the rank-1 tail is noise,
    standard practice for Zipf fits). Returns one row:
    ``(n_terms, zipf_slope, intercept)``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
    )
    w = Window.orderBy(F.desc("_c"), "_t")
    ranked = counts.withColumn("_r", F.row_number().over(w))
    x = F.log(F.col("_r").cast("double")).cast("decimal(38,9)")
    y = F.log(F.col("_c").cast("double")).cast("decimal(38,9)")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(x).cast("double").alias("_sx"),
        F.sum(y).cast("double").alias("_sy"),
        F.sum((x.cast("double") * y.cast("double")).cast("decimal(38,9)"))
        .cast("double")
        .alias("_sxy"),
        F.sum((x.cast("double") * x.cast("double")).cast("decimal(38,9)"))
        .cast("double")
        .alias("_sxx"),
    )
    n = F.col("n_terms").cast("double")
    det = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        det > 0.0,
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / det,
    )
    return s.select(
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("_sy") - slope * F.col("_sx")) / n, 6).alias(
            "intercept"
        ),
    )
