"""Grouped statistical model fits — closed-form estimators as pure
aggregations.

The reference has no modelling surface at all (its analytics stop at the
latest-vs-previous percentage change, ``Fx_1min.py:208-216``); a
training-data warehouse wants at least the classic closed-form fits that
need ONE aggregation pass: per-key ordinary least squares (trend of a
metric over time), which is five sufficient statistics (n, Σx, Σy, Σxy,
Σx²) and a map-side-combinable groupBy.

Scale notes
-----------
- ``grouped_ols`` is a single partial-aggregated ``groupBy`` — the same
  topology as any sum/count rollup: one shuffle on the key, O(1) state
  per key per partition.  No windows, no self-joins, nothing quadratic.
- Determinism: Σ of doubles is order-dependent in the last ulp, so every
  sum is decimal-exact (cast to DECIMAL before SUM) and the final slope /
  intercept arithmetic is plain IEEE double on those exact sums —
  bit-stable under any partitioning, hence oracle-hashable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_ols(
    df: DataFrame,
    keys: str | Sequence[str],
    x: Column,
    y: Column,
    y_scale: int = 6,
) -> DataFrame:
    """Per-key OLS fit ``y ~ slope * x + intercept``.

    ``x`` must be numerically exact (an integer-valued column, e.g. epoch
    seconds relative to a fixed origin); ``y`` may be a double — it (and
    the per-row ``x*y`` product) is cast to an exact DECIMAL of scale
    ``y_scale`` before summation (a straight cast, NOT ``round()``:
    engines disagree on double rounding in the last ulp, but decimal
    casts of the identical IEEE value agree).

    Returns one row per key: ``n_obs``, ``slope``, ``intercept`` (both
    raw doubles — callers round for display/hashing).  Keys with fewer
    than 2 distinct ``x`` values get NULL slope/intercept (vertical or
    degenerate fits), not a division blow-up.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    xl = x.cast("long")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(xl.cast("decimal(38,0)")).cast("double").alias("_sx"),
        F.sum(y.cast(f"decimal(38,{y_scale})")).cast("double").alias("_sy"),
        F.sum((xl.cast("double") * y).cast(f"decimal(38,{y_scale})"))
        .cast("double")
        .alias("_sxy"),
        F.sum((xl * xl).cast("decimal(38,0)")).cast("double").alias("_sxx"),
    )
    n = F.col("n_obs").cast("double")
    det = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        det > 0.0,
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / det,
    )
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    return agg.select(
        *keys,
        "n_obs",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def grouped_mad(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    k: float = 1.4826,
) -> DataFrame:
    """Per-key robust location/scale: median and MAD (median absolute
    deviation, scaled by ``k`` ≈ 1.4826 so it estimates σ under
    normality) — the heavy-tail-safe alternative to the mean/stddev
    moments ``user_value_outliers`` uses. A single wild value moves the
    mean and explodes the stddev (masking the very outlier being hunted);
    the median/MAD pair has a 50% breakdown point, which is why curation
    pipelines gate on robust z-scores.

    Plan shape: two grouped ``percentile`` aggregations on the SAME key
    partitioning (medians aren't algebraic, so two passes is the exact
    price; the approximate single-pass path is ``approx_percentile`` with
    a mergeable sketch). The deviation join is key-colocated with the
    first aggregate's shuffle. Returns ``(keys..., n_obs, median, mad)``
    with ``mad`` already k-scaled.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    med = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.percentile(F.col(value_col), F.lit(0.5)).alias("median"),
    )
    dev = df.join(med, keys).select(
        *keys, F.abs(F.col(value_col) - F.col("median")).alias("_ad")
    )
    mad = dev.groupBy(*keys).agg(
        (F.percentile(F.col("_ad"), F.lit(0.5)) * F.lit(k)).alias("mad")
    )
    return med.join(mad, keys).select(*keys, "n_obs", "median", "mad")


def gini_by_group(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    tiebreak: str,
    scale: int = 4,
) -> DataFrame:
    """Per-key Gini concentration coefficient over one-row-per-entity
    values (the inequality complement of ``supplier_nation_herfindahl``'s
    share-of-squares): rank entities ascending within the key and apply
    the closed form ``G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)``.

    Exactness: values are cast to DECIMAL(38,``scale``) and the rank
    products ``i·xᵢ`` accumulate in decimal, so both Σ terms are
    order-independent; only the final ratio is IEEE double. Ties in
    ``value_col`` are position-interchangeable in the formula (equal x
    across swapped ranks leaves Σ i·xᵢ unchanged), but ``tiebreak`` still
    pins the rank order so the plan is deterministic end-to-end. Keys with
    Σx ≤ 0 return NULL rather than a sign-flipped ratio.

    Plan shape: ONE ranking window per key over the entity-grain frame
    (already reduced — rank the rollup, never the raw facts) plus a
    grouped rollup on the same partitioning. Exact ranks mean a per-key
    sort: fine when keys bound the group (nations, segments); for
    unbounded groups, bin with ``ops/quantile.quantile_bins_grouped`` and
    compute the histogram Gini instead — declared approximation, no sort.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value_col).cast(f"decimal(38,{scale})")
    w = Window.partitionBy(*keys).orderBy(F.col(value_col), F.col(tiebreak))
    ranked = df.select(
        *keys,
        v.alias("_x"),
        F.row_number().over(w).cast("decimal(18,0)").alias("_i"),
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum(F.col("_x")).cast("double").alias("_sx"),
        F.sum(F.col("_i") * F.col("_x")).cast("double").alias("_six"),
    )
    n = F.col("n_entities").cast("double")
    gini = F.when(
        F.col("_sx") > 0.0,
        (2.0 * F.col("_six") - (n + 1.0) * F.col("_sx"))
        / (n * F.col("_sx")),
    )
    return agg.select(*keys, "n_entities", gini.alias("gini"))


def cumulative_hazard(
    entities: DataFrame,
    time_col: str,
    event_col: str,
    ppm: int = 1_000_000,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard over right-censored entity
    lifetimes — survival analysis as pure aggregation. ``entities`` is
    one row per subject with an integer ``time_col`` (e.g. whole days
    survived) and a boolean ``event_col`` (True = event observed, False
    = censored at that time).

    The Kaplan-Meier product Π(1 − dᵢ/nᵢ) is NOT cross-engine
    hash-stable (float product / exp-of-log-sum both drift in the last
    ulp), so the emitted estimator is the additive Nelson-Aalen form in
    EXACT integer parts-per-million: per event time,
    ``hazard_ppm = (dᵢ·ppm) div nᵢ`` and its running sum — integer
    floor division, bit-identical in any engine (KM ≈ exp(−H/ppm) when
    a caller wants the survival curve back).

    Plan shape: one hash-agg to time grain, then two windows over the
    time-grain frame — whose row count is the number of DISTINCT times
    (days: ≤ study length), not the number of subjects. The reverse
    running sum of time-bucket counts IS the at-risk set nᵢ, so no
    subject-level self-join ever happens; at 100 TB the subject frame is
    the only large input and it is reduced map-side first.
    """
    from pyspark.sql import Window

    g = entities.groupBy(F.col(time_col).alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("deaths"),
        F.count(F.lit(1)).alias("_all"),
    )
    w_risk = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.withColumn("at_risk", F.sum("_all").over(w_risk))
    h = F.expr(f"deaths * {ppm} div at_risk")
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        r.withColumn("hazard_ppm", h)
        .withColumn("cum_hazard_ppm", F.sum(h).over(w_cum))
        .filter(F.col("deaths") > 0)
        .select(
            F.col("t").alias(time_col),
            "deaths",
            "at_risk",
            "hazard_ppm",
            "cum_hazard_ppm",
        )
    )


def changepoint_single(
    df: DataFrame,
    keys: str | Sequence[str],
    order: Sequence[str],
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """Offline single-changepoint detection per key (binary segmentation,
    first split): the position that maximizes the between-segment sum-of-
    squares gain ``G(i) = Sᵢ²/i + (S−Sᵢ)²/(n−i) − S²/n`` — equivalently
    the split minimizing total within-segment SSE, the CUSUM family's
    retrospective twin (``keyed_cusum`` detects online; this asks "where
    DID the level shift?").

    One (key, order)-sorted window pass builds decimal-exact prefix sums;
    G is double arithmetic on those exact prefixes, identical bits in any
    engine, so the argmax is cross-engine stable; exact G ties break to
    the earliest position. Returns one row per key with ≥2 rows:
    ``n_obs``, ``cp_<order[0]>`` (last point of the left segment),
    ``gain``, ``mean_before``, ``mean_after``.

    Plan shape: one sort-shuffle on the key (the window) + one grouped
    argmax — linear, partitioned by key throughout; nothing global.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    order = list(order)
    # keyed_ewma's domain contract: NULL-order rows are unplaceable in
    # the series, NULL values are missing observations — both excluded.
    for c in [*order, value_col]:
        df = df.filter(F.col(c).isNotNull())
    dec = f"decimal(38,{scale})"
    w = Window.partitionBy(*keys).orderBy(*order)
    wall = Window.partitionBy(*keys)
    pre = (
        df.withColumn("_i", F.row_number().over(w))
        .withColumn(
            "_sl",
            F.sum(F.col(value_col).cast(dec)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_s", F.sum(F.col(value_col).cast(dec)).over(wall))
    )
    i = F.col("_i").cast("double")
    n = F.col("_n").cast("double")
    sl = F.col("_sl").cast("double")
    s = F.col("_s").cast("double")
    g = (
        sl * sl / i
        + (s - sl) * (s - sl) / (n - i)
        - s * s / n
    )
    scored = pre.filter(F.col("_i") < F.col("_n")).select(
        *keys,
        *[F.col(c) for c in order],
        F.col("_n").alias("n_obs"),
        g.alias("gain"),
        (sl / i).alias("mean_before"),
        ((s - sl) / (n - i)).alias("mean_after"),
    )
    wpick = Window.partitionBy(*keys).orderBy(
        F.col("gain").desc(), *[F.col(c) for c in order]
    )
    return (
        scored.withColumn("_rn", F.row_number().over(wpick))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            "n_obs",
            F.col(order[0]).alias(f"cp_{order[0]}"),
            "gain",
            "mean_before",
            "mean_after",
        )
    )


def welch_ttest(
    df: DataFrame,
    keys: str | Sequence[str],
    value: Column,
    in_treatment: Column,
    scale: int = 4,
) -> DataFrame:
    """Per-key Welch two-sample t statistic (unequal variances) between a
    treatment and a control slice of the same frame — the A/B primitive,
    as one conditional-aggregation pass (no second scan, no join): each
    group's n / Σx / Σx² accumulate under ``F.when`` filters, map-side
    combined like any rollup.

    Exactness contract: ``value`` and its square are cast to
    DECIMAL(38,``scale``) before summation (the square is formed in
    double first — IEEE multiplication is deterministic, the decimal cast
    of the identical bits agrees across engines); means, variances, t and
    the Welch–Satterthwaite df are then plain double arithmetic on those
    exact sums. Returned statistics are RAW doubles — callers round for
    display/hashing (grouped_ols convention): once Σx² exceeds ~16
    significant digits the DECIMAL→DOUBLE edge cast itself is
    engine-rounding-dependent in the last ulp, which rounding absorbs.
    Keys where either side has < 2 rows get NULL t/df.

    Rows where ``value`` or ``in_treatment`` is NULL are EXCLUDED up
    front — the same pairwise-complete contract as ``mann_whitney_u`` /
    ``ks_two_sample``: a NULL value would otherwise skew the n/Σx moments
    apart (count(*) vs count(value)), and a NULL treatment flag belongs
    to neither sample.

    Returns ``(keys..., n_treat, n_ctrl, mean_treat, mean_ctrl, t_stat,
    welch_df)``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    df = df.filter(value.isNotNull() & in_treatment.isNotNull())
    dec = f"decimal(38,{scale})"
    z = F.lit(0).cast(dec)
    vt = F.when(in_treatment, value.cast(dec)).otherwise(z)
    vc = F.when(~in_treatment, value.cast(dec)).otherwise(z)
    qt = F.when(in_treatment, (value * value).cast(dec)).otherwise(z)
    qc = F.when(~in_treatment, (value * value).cast(dec)).otherwise(z)
    agg = df.groupBy(*keys).agg(
        F.sum(in_treatment.cast("long")).alias("n_treat"),
        F.sum((~in_treatment).cast("long")).alias("n_ctrl"),
        F.sum(vt).cast("double").alias("_st"),
        F.sum(vc).cast("double").alias("_sc"),
        F.sum(qt).cast("double").alias("_qt"),
        F.sum(qc).cast("double").alias("_qc"),
    )
    n1 = F.col("n_treat").cast("double")
    n2 = F.col("n_ctrl").cast("double")
    m1 = F.col("_st") / n1
    m2 = F.col("_sc") / n2
    v1 = (F.col("_qt") - F.col("_st") * F.col("_st") / n1) / (n1 - 1.0)
    v2 = (F.col("_qc") - F.col("_sc") * F.col("_sc") / n2) / (n2 - 1.0)
    se1 = v1 / n1
    se2 = v2 / n2
    ok = (F.col("n_treat") >= 2) & (F.col("n_ctrl") >= 2)
    t = F.when(ok, (m1 - m2) / F.sqrt(se1 + se2))
    dfree = F.when(
        ok,
        (se1 + se2) * (se1 + se2)
        / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0)),
    )
    return agg.select(
        *keys,
        "n_treat",
        "n_ctrl",
        F.when(ok, m1).alias("mean_treat"),
        F.when(ok, m2).alias("mean_ctrl"),
        t.alias("t_stat"),
        dfree.alias("welch_df"),
    )


def robust_outliers(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Rows whose robust z-score ``|x − median| / MAD`` exceeds
    ``threshold`` (3.5 is the classic Iglewicz-Hoaglin cut) — the
    outlier filter that still works when the outliers themselves have
    corrupted the moments. Keys with MAD = 0 (over half the values
    identical) flag any deviation at all, the conventional degenerate-case
    rule. Stats broadcast back; the scan is map-side after one stats
    pass."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    stats = grouped_mad(df, keys, value_col)
    rz = F.when(
        F.col("mad") > 0.0,
        F.abs(F.col(value_col) - F.col("median")) / F.col("mad"),
    ).otherwise(
        F.when(
            F.abs(F.col(value_col) - F.col("median")) > 0.0, F.lit(float("inf"))
        ).otherwise(F.lit(0.0))
    )
    return (
        df.join(F.broadcast(stats), keys)
        .withColumn("robust_z", rz)
        .filter(F.col("robust_z") > threshold)
    )


def mann_whitney_u(
    df: DataFrame,
    keys: str | Sequence[str],
    value: Column,
    in_treatment: Column,
) -> DataFrame:
    """Per-key Mann-Whitney U (Wilcoxon rank-sum) between a treatment and
    a control slice of the same frame — the distribution-free A/B
    primitive (the reference's analytics stop at pct-change;
    ``welch_ttest`` above is the parametric twin). Emits the U statistic,
    the tie-corrected normal-approximation z, and U/(n1·n2) — which IS
    the ROC AUC of ``value`` as a ranking score for ``in_treatment``
    (the probability a random treatment row outranks a random control
    row), so one operator serves both hypothesis testing and ranking
    evaluation.

    Shape: rows collapse to (key, value) TIE GROUPS first (a plain
    partial-aggregated groupBy — the only full-data pass), then the rank
    window runs per key over tie groups, not rows. Exactness: average
    ranks are half-integers, so the op carries 2×rank as an integer and
    sums rank products in DECIMAL(38,0) — bit-stable under any
    partitioning (Σ cnt·avg2 ≈ 2n² overflows a long near n=10⁹·√5).
    z and auc are double arithmetic on those exact sums, returned RAW
    (callers round to 6, the welch convention). Keys with an empty side
    get NULL z/auc. Rows with a NULL ``value`` or NULL ``in_treatment``
    are EXCLUDED up front (declared semantics, shared by
    ``ks_two_sample`` so the twin operators report identical
    n_treat/n_ctrl; a NULL flag silently counted as control would bias
    U, and NULL values rank NULLS FIRST in Spark but NULLS LAST in the
    DuckDB oracles).

    Returns ``(keys..., n_treat, n_ctrl, u_stat, z_stat, auc)``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    from pyspark.sql import Window

    df = df.filter(value.isNotNull() & in_treatment.isNotNull())
    g = df.groupBy(*keys, value.alias("_v")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(in_treatment.cast("long")).alias("_cnt_t"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # avg rank of a tie group = cum - cnt + (cnt+1)/2; carry 2x as integer
    g = g.withColumn("_avg2", 2 * F.sum("_cnt").over(w) - F.col("_cnt") + 1)
    dec = "decimal(38,0)"
    agg = g.groupBy(*keys).agg(
        F.sum("_cnt_t").alias("n_treat"),
        F.sum(F.col("_cnt") - F.col("_cnt_t")).alias("n_ctrl"),
        F.sum(F.col("_cnt_t").cast(dec) * F.col("_avg2")).alias("_two_r1"),
        F.sum(
            F.col("_cnt").cast(dec) * F.col("_cnt") * F.col("_cnt")
            - F.col("_cnt")
        ).alias("_ties"),
    )
    n1 = F.col("n_treat").cast("double")
    n2 = F.col("n_ctrl").cast("double")
    n = n1 + n2
    u1 = (F.col("_two_r1").cast("double") - n1 * (n1 + 1.0)) / 2.0
    var = n1 * n2 / 12.0 * (
        (n + 1.0) - F.col("_ties").cast("double") / (n * (n - 1.0))
    )
    ok = (F.col("n_treat") >= 1) & (F.col("n_ctrl") >= 1)
    return agg.select(
        *keys,
        "n_treat",
        "n_ctrl",
        F.when(ok, u1).alias("u_stat"),
        F.when(ok & (var > 0.0), (u1 - n1 * n2 / 2.0) / F.sqrt(var)).alias(
            "z_stat"
        ),
        F.when(ok, u1 / (n1 * n2)).alias("auc"),
    )


def ks_two_sample(
    df: DataFrame,
    keys: str | Sequence[str],
    value: Column,
    in_treatment: Column,
) -> DataFrame:
    """Per-key two-sample Kolmogorov-Smirnov D — the largest vertical gap
    between the treatment and control empirical CDFs, the classic "did
    the whole DISTRIBUTION move" test (PSI's binless, parameter-free
    sibling: no declared bin edges, sensitive anywhere on the axis).

    Shape mirrors ``mann_whitney_u``: one tie-group rollup (the only
    full-data pass), then a cumulative window per key over distinct
    values. Exactness: the gap is maximized as the INTEGER
    ``|cum_t·n_ctrl − cum_c·n_treat|`` in DECIMAL(38,0) (cross-multiplied
    to avoid float CDFs; ≈ n² again) and divided once at the end, so D is
    a ratio of exact integers — bit-stable, no ulp drift to absorb.

    Returns ``(keys..., n_treat, n_ctrl, ks_d)`` with ks_d a raw double.
    Rows with a NULL ``value`` or NULL ``in_treatment`` are EXCLUDED up
    front — the same declared rule as ``mann_whitney_u``, keeping the
    twin operators' n_treat/n_ctrl identical on nullable inputs.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    from pyspark.sql import Window

    df = df.filter(value.isNotNull() & in_treatment.isNotNull())
    g = df.groupBy(*keys, value.alias("_v")).agg(
        F.sum(in_treatment.cast("long")).alias("_ct"),
        F.sum((~in_treatment).cast("long")).alias("_cc"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*keys)
    dec = "decimal(38,0)"
    g = (
        g.withColumn("_cumt", F.sum("_ct").over(w))
        .withColumn("_cumc", F.sum("_cc").over(w))
        .withColumn("_nt", F.sum("_ct").over(wall))
        .withColumn("_nc", F.sum("_cc").over(wall))
    )
    agg = g.groupBy(*keys).agg(
        F.max("_nt").alias("n_treat"),
        F.max("_nc").alias("n_ctrl"),
        F.max(
            F.abs(
                F.col("_cumt").cast(dec) * F.col("_nc")
                - F.col("_cumc").cast(dec) * F.col("_nt")
            )
        ).alias("_dnum"),
    )
    ok = (F.col("n_treat") >= 1) & (F.col("n_ctrl") >= 1)
    return agg.select(
        *keys,
        "n_treat",
        "n_ctrl",
        F.when(
            ok,
            F.col("_dnum").cast("double")
            / (F.col("n_treat").cast("double") * F.col("n_ctrl").cast("double")),
        ).alias("ks_d"),
    )


def spearman_rho(
    df: DataFrame,
    keys: str | Sequence[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-key Spearman rank correlation with average-rank ties — Pearson
    on the rank transforms, the monotone-association measure that
    ``grouped_ols``'s linear slope is not (outlier-immune, captures any
    monotone curve). Two rank windows per key (min-rank + tie count give
    the average rank without a second scan), then ONE moment rollup.

    Exactness: average ranks are half-integers, so the op carries 2×rank
    as an integer and accumulates all five rank moments in DECIMAL(38,0)
    (Σ(2r)² ≈ 4n³/3 — decimal, never long); rho is double arithmetic on
    the exact moments, returned RAW (callers round to 6). The constant-x
    or constant-y degenerate key gets NULL rho.

    Returns ``(keys..., n_rows, rho)``. Rows where either coordinate
    is NULL are EXCLUDED up front (pairwise-complete — NULLs rank
    NULLS FIRST in Spark but NULLS LAST in the DuckDB twin, so leaving
    them in would silently corrupt both the ranks and the moments).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    from pyspark.sql import Window

    df = df.filter(x.isNotNull() & y.isNotNull())

    def avg2(col: Column, name: str) -> Column:
        wr = Window.partitionBy(*keys).orderBy(col)
        wt = Window.partitionBy(*keys, col)
        return (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias(
            name
        )

    r = df.select(*keys, avg2(x, "_rx"), avg2(y, "_ry"))
    dec = "decimal(38,0)"
    rx = F.col("_rx").cast(dec)
    ry = F.col("_ry").cast(dec)
    agg = r.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(rx).alias("_sx"),
        F.sum(ry).alias("_sy"),
        F.sum(rx * F.col("_rx")).alias("_sxx"),
        F.sum(ry * F.col("_ry")).alias("_syy"),
        F.sum(rx * F.col("_ry")).alias("_sxy"),
    )
    n = F.col("n_rows").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov = n * F.col("_sxy").cast("double") - sx * sy
    vx = n * F.col("_sxx").cast("double") - sx * sx
    vy = n * F.col("_syy").cast("double") - sy * sy
    return agg.select(
        *keys,
        "n_rows",
        F.when((vx > 0.0) & (vy > 0.0), cov / F.sqrt(vx * vy)).alias("rho"),
    )


def theil_index(
    df: DataFrame,
    keys: str | Sequence[str],
    value: Column,
    mean_scale: int = 6,
    term_scale: int = 9,
) -> DataFrame:
    """Per-key Theil T inequality index ``(1/n)·Σ (x/μ)·ln(x/μ)`` over
    the POSITIVE values of ``value`` — ``gini_by_group``'s
    information-theoretic sibling, and the one inequality measure that
    decomposes additively across subgroups. Two aggregation passes: a
    moment rollup (n, exact-decimal Σx) broadcast back, then the term
    rollup — no windows, no sort, the gini op's rank window is avoided
    entirely.

    ln-family hash discipline (the PSI convention): μ is ROUNDED to
    ``mean_scale`` decimals after the exact-sum division — the declared
    semantics that absorbs the DECIMAL→DOUBLE edge-cast ulp (welch_ttest
    docstring) BEFORE ln can amplify it — and each (x/μ)·ln(x/μ) term is
    double-computed in pinned operand order then truncated to
    DECIMAL(38,``term_scale``) for the exact sum. Callers round the
    returned index to 6.

    Returns ``(keys..., n_pos, mean_value, theil_t)``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    pos = df.filter(value > 0).select(*keys, value.alias("_x"))
    stats = pos.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(F.col("_x").cast("decimal(38,4)")).alias("_sx"),
    )
    mu = F.round(
        F.col("_sx").cast("double") / F.col("n_pos").cast("double"),
        mean_scale,
    )
    stats = stats.withColumn("mean_value", mu)
    # try_divide: under ANSI a zero rounded mean would throw inside the
    # term expression before the output guard below can mask it.
    ratio = F.try_divide(F.col("_x"), F.col("mean_value"))
    term = (ratio * F.log(ratio)).cast(f"decimal(38,{term_scale})")
    return (
        pos.join(F.broadcast(stats), keys)
        .groupBy(*keys)
        .agg(
            F.max("n_pos").alias("n_pos"),
            F.max("mean_value").alias("mean_value"),
            (
                F.sum(term).cast("double")
                / F.max("n_pos").cast("double")
            ).alias("theil_t"),
        )
        # Degenerate-scale guard: a key whose positive values all sit
        # below ~0.5·10^-mean_scale rounds to mean_value == 0.0, turning
        # ratio/ln into Inf/NaN. Emit NULL for such keys instead of
        # letting NaN flow silently into downstream aggregates.
        .withColumn(
            "theil_t",
            F.when(F.col("mean_value") > 0.0, F.col("theil_t")),
        )
    )
