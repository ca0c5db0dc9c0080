"""Composed queries — the engine's declared query surface.

Each query exists twice, deliberately:

1. A Spark-first DataFrame composition of the operator library (this module's
   ``q_*`` functions, registered in ``QUERIES``).
2. An ANSI-SQL oracle (``ORACLE``) that DuckDB runs on the same parquet files;
   the driver hash-compares both at sf0.01 (the t2 correctness gate).

Naming discipline: every computed column is aliased identically in both forms
(the driver sorts columns by name before hashing).

Determinism discipline (the hash is exact, not approximate):

- Sums over doubles are order-dependent in the last ulp; every aggregated
  double is first cast to an exact DECIMAL, summed exactly, then cast back to
  double — identical bits in both engines regardless of plan/partitioning.
- Non-aggregated double arithmetic (a*b, a/b) is IEEE-deterministic and safe.
- Rankings always carry a unique tie-breaker column.

The FX-domain semantics of the reference query (latest active rate vs
second-latest rate before a business-day cutoff — see SURVEY.md §2.3) are
exercised on the ``events`` table: ``user_id`` plays ``ccy_couple``,
``value`` plays ``rate``, ``ts`` plays both event/ingestion time.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fxspark.ops.asof import asof_join, nth_before_cutoff
from fxspark.ops.change import pct_change_label
from fxspark.ops.checks import require_unique
from fxspark.ops.joins import anti_join, dim_join, semi_join
from fxspark.ops.latest import dedup_latest, grouped_max, latest_per_key_agg
from fxspark.ops.windows import active_window, sessionize, time_bucket
from fxspark.session import load_table, spread

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# events cutoff literal used by the as-of family (mid-range of the Jan-2024 data)
CUTOFF = "2024-01-20 00:00:00"


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def exact_sum(col: F.Column, scale: int = 4) -> F.Column:
    """Order-independent sum of a double column: decimal-exact, back to double."""
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Reference-core family (events table) — SURVEY.md §2.3
# ---------------------------------------------------------------------------

@query(
    "latest_event_per_user",
    oracle=f"""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key (Q5, ``Fx_1min.py:159-173``) as a max_by aggregate.

    NULL-ordering contract (round 15, unified —
    ``ops.latest.drop_null_order``): rows with NULL ``ts`` carry no
    recency and are dropped before ranking; the oracle states the same
    exclusion. No-op on the driver data (``ts`` is never NULL there)."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key_agg(
        events, "user_id", ["ts", "event_id"],
        payload=["event_id", "ts", "event_type", "value"],
    )


@query(
    "second_latest_before_cutoff",
    oracle=f"""
    SELECT user_id, event_id, ts, value
    FROM (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 2
    """,
)
def q_second_latest_before_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's correlated-subquery argmax (Q9, ``Fx_1min.py:190-196``),
    decorrelated to rank-2-before-cutoff."""
    events = load_table(spark, sf_dir, "events")
    return nth_before_cutoff(
        events, "user_id", ["ts", "event_id"], cutoff=F.lit(CUTOFF).cast("timestamp"),
        cutoff_col="ts", n=2,
    ).select("user_id", "event_id", "ts", "value")


@query(
    "active_events",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
    """,
)
def q_active_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-max recency window (Q2-Q3, ``Fx_1min.py:149-157``)."""
    events = load_table(spark, sf_dir, "events")
    return active_window(events, "ts", F.expr("INTERVAL 1 HOUR")).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


def _rate_change(
    spark: SparkSession, sf_dir: str, how: str, cutoff: str = CUTOFF
) -> DataFrame:
    """The full reference analytics query (SURVEY.md §2.3 semantics), on events:

    current  = latest value among rows within 1 day of global max ts
    previous = value at the SECOND-latest ts at/before the cutoff
    change   = round(100*(cur-prev)/prev, 2) || '%', v1 NULL fallback on left join
    """
    events = load_table(spark, sf_dir, "events")
    current = latest_per_key_agg(
        active_window(events, "ts", F.expr("INTERVAL 1 DAY")),
        "user_id", ["ts", "event_id"], payload=["value"],
    ).select("user_id", F.col("value").alias("current_value"))
    previous = nth_before_cutoff(
        events, "user_id", ["ts", "event_id"],
        cutoff=F.lit(cutoff).cast("timestamp"), cutoff_col="ts", n=2,
    ).select("user_id", F.col("value").alias("previous_value"))
    joined = current.join(previous, "user_id", how)
    return joined.select(
        "user_id",
        "current_value",
        "previous_value",
        pct_change_label(F.col("current_value"), F.col("previous_value")).alias(
            "percentage_change"
        ),
    )


_RATE_CHANGE_ORACLE = """
    WITH ActiveEvents AS (
      SELECT * FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 DAY
    ), CurrentRates AS (
      SELECT user_id, value AS current_value
      FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM ActiveEvents
      ) WHERE rn = 1
    ), PreviousRates AS (
      SELECT user_id, value AS previous_value
      FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{cutoff}'
      ) WHERE rn = 2
    )
    SELECT c.user_id, c.current_value, p.previous_value,
           CASE WHEN p.previous_value IS NULL THEN 'No Previous Rate'
                ELSE printf('%.2f', round((c.current_value - p.previous_value)
                                          / nullif(p.previous_value, 0) * 100, 2)) || '%'
           END AS percentage_change
    FROM CurrentRates c {join} JOIN PreviousRates p USING (user_id)
"""


@query(
    "rate_change_report",
    oracle=_RATE_CHANGE_ORACLE.format(cutoff=CUTOFF, join="INNER"),
)
def q_rate_change_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 reference query: inner join (``Fx_1min.py:147-217``)."""
    return _rate_change(spark, sf_dir, "inner")


# The left variant uses an early cutoff so some users genuinely lack a rank-2
# prior event → the 'No Previous Rate' branch is exercised at gate scale.
EARLY_CUTOFF = "2024-01-01 02:00:00"


@query(
    "rate_change_report_left",
    oracle=_RATE_CHANGE_ORACLE.format(cutoff=EARLY_CUTOFF, join="LEFT"),
)
def q_rate_change_report_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 reference query: left join + 'No Previous Rate'
    (``update_exchange_rates.py:202-213``)."""
    return _rate_change(spark, sf_dir, "left", cutoff=EARLY_CUTOFF)


@query(
    "dedup_latest_events",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_dedup_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins upsert semantics (S5, ``Fx_1min.py:106-109``) as a
    keyed dedup on (user_id, event_type).

    NULL-ordering contract (round 15, unified —
    ``ops.latest.drop_null_order``): a row with NULL ``ts`` has no usable
    recency and is dropped before the LWW reduce (it can neither win nor
    resurrect a key); the oracle states the same exclusion. No-op on the
    driver data."""
    events = load_table(spark, sf_dir, "events")
    return dedup_latest(
        events, ["user_id", "event_type"], ["ts", "event_id"]
    ).select("user_id", "event_type", "event_id", "ts", "value")


@query(
    "user_activity_summary",
    oracle="""
    SELECT user_id, max(ts) AS max_ts, count(*) AS event_count,
           CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_user_activity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped max + counts (Q6, ``Fx_1min.py:182-188``)."""
    events = load_table(spark, sf_dir, "events")
    return grouped_max(
        events, "user_id", "ts",
        extra_aggs={
            "event_count": F.count(F.lit(1)),
            "total_value": exact_sum(F.col("value")),
        },
    ).withColumnRenamed("max_ts", "max_ts")


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(json_extract_string(props, '$.k')) AS k_count
    FROM events GROUP BY event_type
    """,
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON navigation (P1-P2, ``Fx_1min.py:69-76``) via
    ``get_json_object`` — stays JVM-side, no Python."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"), F.count(k).alias("k_count")
    )


@query(
    "session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      -- sessionize drops NULL-ts rows by contract (unplaceable on
      -- the timeline; engines disagree on default NULL placement)
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM flagged
    )
    SELECT user_id, count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch analog of streaming session windows)."""
    events = load_table(spark, sf_dir, "events")
    sess = sessionize(
        events, "user_id", "ts", F.expr("INTERVAL 30 MINUTES"),
        tiebreak=["event_id"],
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "daily_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           grouping(event_type) AS g_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY ROLLUP (day, event_type)
    HAVING count(*) > 0
    """,
)
def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (hypertable-style day×type cube slice).

    The trailing ``n_events > 0`` filter is the D12 degenerate-input
    discipline (``fxspark/sqlfuzz.py``): over an EMPTY input the SQL
    standard (DuckDB/PostgreSQL) emits the grand-total grouping-set row
    but Spark emits zero rows; the filter is a no-op on every row a
    non-empty input can produce (all rollup subtotals aggregate ≥1 row)
    and removes exactly the divergent row — found by the round-14
    sf_empty registry sweep (tests/test_degenerate_registry.py)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", time_bucket(F.col("ts"), "day"))
        .rollup("day", "event_type")
        .agg(
            F.grouping("event_type").alias("g_type"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .filter(F.col("n_events") > 0)
        .select("day", "event_type", "g_type", "n_events", "total_value")
    )


@query(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.event_id AS click_event_id, c.ts AS click_ts
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL) p
    ASOF LEFT JOIN (SELECT * FROM events
                    WHERE event_type = 'click' AND ts IS NOT NULL) c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: for each purchase, the latest click at/before it
    for the same user (union+running-window plan — one shuffle)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_event_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    return asof_join(
        purchases, clicks, keys="user_id", on="ts",
        right_payload=["click_event_id", "click_ts"],
    )


# ---------------------------------------------------------------------------
# Relational family (TPC-H-ish tables) — §2.5 gaps made first-class
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) ) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the bench flagship: scan + pushed
    filter + hash aggregate with map-side partials, no joins."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price, 6).alias("sum_disc_price"),
            exact_sum(charge, 6).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (window ranking, generalizes Q5)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE s.s_nationkey = c.c_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue: 5-way join with broadcast dims
    (nation/region/supplier) and shuffle joins on the fact keys."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "supplier", "nation", "region")}
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Join order: push the date filter into the orders scan; broadcast the
    # true dimensions (customer/supplier/nation/region). orders is a fact —
    # it shuffles with lineitem (AQE converts it to broadcast at small SF
    # where it fits, without baking in a hint that breaks at 1000×).
    orders_f = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    joined = (
        t["lineitem"]
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        exact_sum(revenue, 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def q_customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS) — §2.5 gap made first-class.

    Scoped to orders since 2000 so the result is non-empty at every sf
    (an empty differential is trivially-matching evidence)."""
    customer = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(customer, recent, "c_custkey").select("c_custkey", "c_name")


@query(
    "late_shipment_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS semi join: orders with any lineitem shipped
    more than 60 days after the order date."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # EXISTS(shipdate > orderdate+60) ⟺ max(shipdate) > orderdate+60, so
    # pre-aggregate lineitem per order FIRST (map-side partial combine shrinks
    # the shuffle 4×) and join orders once — one agg + one join instead of
    # join + semi-join. At 100 TB this halves the shuffled bytes.
    max_ship = grouped_max(li, "l_orderkey", "l_shipdate")
    late = (
        orders.join(max_ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("max_l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# Text-analysis / dedup family (documents table) — north-star extensions
# ---------------------------------------------------------------------------

_STOP_SQL = "['the','a','an','and','or','of','to','in','is','it']"


@query(
    "doc_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+'))
             AS n_bpe_tokens,
           length(text) AS n_chars,
           length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
           len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS stop_hits,
           -- floor(x*1e4 + 0.5)/1e4: declared half-up rounding in pure
           -- IEEE + floor, engine-identical — native ROUND splits on the
           -- 1e-4 halves ratio sums land on (rule D22)
           floor((least(length(text)/500.0, 1.0)
                 + coalesce(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t)))
                            / CAST(nullif(len(toks), 0) AS DOUBLE), 0.0)
                 - coalesce(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                            / CAST(nullif(length(text), 0) AS DOUBLE), 0.0))
                 * 10000.0 + 0.5) / 10000.0 AS quality
    FROM t
    """,
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis: token/char/punct counts, stopword hits,
    composite quality score — all JVM-side expressions (ops/text.py)."""
    from fxspark.ops import text as tx

    docs = spread(load_table(spark, sf_dir, "documents"))
    c = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(c).alias("n_tokens"),
        tx.bpe_token_count(c).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars"),
        tx.punct_count(c).alias("n_punct"),
        tx.stopword_hits(c).alias("stop_hits"),
        tx.quality_score(c).alias("quality"),
    )


@query(
    "doc_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id,
           count(*) AS dup_count
    FROM documents GROUP BY fp
    """,
)
def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint (ops/dedup.exact_dedup)."""
    from fxspark.ops.dedup import exact_dedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    return exact_dedup(docs, "text", "doc_id")


@query(
    "doc_token_topk",
    oracle="""
    SELECT w AS token, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS w FROM documents)
    GROUP BY w ORDER BY freq DESC, token LIMIT 20
    """,
)
def q_doc_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-k (explode + count + deterministic
    order) — the wordcount pattern that underlies BPE-style token stats."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(20)
    )


@query(
    "doc_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t)-1)]) AS s
      FROM toks WHERE len(t) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    """,
)
def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trigram-Jaccard near-dup pairs (threshold 0.8) via the inverted
    shingle index — lossless candidate generation, one shuffle per side.

    (The DuckDB oracle brute-forces all pairs; same result set, different
    plan — which is the point of the differential.) Implementation is the
    prefix-filtered set-similarity join (ops/dedup.jaccard_pairs_prefix):
    only each doc's rarest (1-t)·|A|+1 shingles are indexed, so no
    stop-shingle bucket ever goes quadratic — the plain inverted index
    (ops/dedup.jaccard_pairs) is its small-N twin and test oracle.

    Precondition: ``doc_id`` unique (FIXTURES.md; enforced by
    ``ops.checks.require_unique`` when FXSPARK_VALIDATE_CONTRACTS=1 —
    duplicate ids would make two physical rows one entity or two
    depending on formulation, the round-14 sf_dups boundary)."""
    from fxspark.ops.dedup import jaccard_pairs_prefix

    docs = require_unique(
        spread(load_table(spark, sf_dir, "documents")), "doc_id",
        context="doc_jaccard_pairs",
    )
    return jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.8)


@query(
    "doc_jaccard_pairs_capped",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t)-1)]) AS s
      FROM toks WHERE len(t) >= 3
    ), inv AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), freq AS (
      SELECT shingle, count(*) AS df FROM inv GROUP BY shingle
    ), capped AS (
      SELECT i.doc_id, i.shingle FROM inv i JOIN freq f USING (shingle)
      WHERE f.df <= 20
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM capped a JOIN capped b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.5
    """,
)
def q_doc_jaccard_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped Jaccard pairs: shingles present in more than 20 docs
    are dropped from the universe BEFORE sizes and intersections are counted
    (stop-shingle removal — the knob that bounds inverted-index bucket size
    at corpus scale, ``ops/dedup.jaccard_pairs`` ``max_shingle_freq``). This
    is the oracle-differential twin of the round-1 ADVICE fix at
    ``dedup.py:112`` (sizes recomputed over the capped universe); the unit
    property test pins small cases, this pins the fixture corpus.
    Implementation: prefix-filtered within the capped universe (cap bounds
    bucket width, prefix bounds candidates), plus the PPJoin length and
    position filters (exactness-preserving candidate pruning) and a single
    checkpoint of the capped inverted index — measured 8.0 s → 3.7 s →
    ~3.3 s at sf0.1 vs the plain capped inverted index; the loose 0.5
    threshold keeps the prefix at half of each set, which is the residual
    cost.

    Precondition: ``doc_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — sf_dups boundary)."""
    from fxspark.ops.dedup import jaccard_pairs_prefix

    docs = require_unique(
        spread(load_table(spark, sf_dir, "documents")), "doc_id",
        context="doc_jaccard_pairs_capped",
    )
    return jaccard_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=20
    )


@query(
    "doc_sample_10pct",
    oracle="""
    SELECT doc_id, lang,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(lower(trim(text))[i]) AS BIGINT)
                for i in range(1, len(lower(trim(text))) + 1)]),
             (acc, c) -> (acc * 131 + c) % 1000000007) % 100 AS bucket
    -- a NULL text cannot be content-hashed: such docs are outside the
    -- sample domain (Spark's NULL bucket never passes < 10; DuckDB's
    -- fold would yield the seed bucket 0 and wrongly sample them all).
    FROM documents
    WHERE text IS NOT NULL
      AND list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(lower(trim(text))[i]) AS BIGINT)
                for i in range(1, len(lower(trim(text))) + 1)]),
             (acc, c) -> (acc * 131 + c) % 1000000007) % 100 < 10
    """,
)
def q_doc_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling: keep docs whose rolling
    fingerprint lands in buckets 0-9 (~10%). Unlike ``df.sample`` this is
    reproducible across runs/partitionings AND stable under re-ingestion
    (same text ⇒ same bucket) — the sampling discipline a training-data
    pipeline needs for held-out splits."""
    from fxspark.ops.text import rolling_fingerprint

    docs = spread(load_table(spark, sf_dir, "documents"))
    bucket = rolling_fingerprint(F.col("text")) % 100
    return docs.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") < 10
    )


@query(
    "doc_dup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t)-1)]) AS s
      FROM toks WHERE len(t) >= 3
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node
    )
    SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
    """,
)
def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact jaccard≥0.8
    pair graph (ops/dedup.dup_clusters — iterative min-label propagation;
    the DuckDB oracle walks the same graph with a recursive CTE). This is
    the step real dedup pipelines need after pair generation: keep
    min-id per cluster, drop the rest.

    Precondition: ``doc_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — sf_dups boundary)."""
    from fxspark.ops.dedup import dup_clusters, jaccard_pairs_prefix

    docs = require_unique(
        spread(load_table(spark, sf_dir, "documents")), "doc_id",
        context="doc_dup_clusters",
    )
    pairs = jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.8)
    return dup_clusters(pairs)


# 60-bit cross-engine string hash: Spark conv(substr(md5,1,15),16,10) ==
# DuckDB ('0x'||substr(md5,1,15))::BIGINT (verified bit-identical incl.
# unicode/empty). Lets the otherwise hash-opaque LSH operators run under the
# full value-hash differential instead of a rows-only check.
_MD5_60 = "('0x'||substr(md5({c}),1,15))::BIGINT"


def _minhash_oracle(k: int = 64, bands: int = 16, threshold: float = 0.8) -> str:
    from fxspark.ops.dedup import _MERSENNE_31 as M, _minhash_perms

    r = k // bands
    sig = ", ".join(
        f"min(({a}*x + {b}) % {M}) AS h{i}"
        for i, (a, b) in enumerate(_minhash_perms(k))
    )
    band_arms = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS bn, concat_ws(',', "
        + ", ".join(f"h{i}" for i in range(b * r, (b + 1) * r))
        + ") AS bk FROM sig"
        for b in range(bands)
    )
    jac = ("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)"
           " / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))")
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
                                    for i in range(1, len(t)-1)]) AS s
      FROM toks WHERE len(t) >= 3
    ), h AS (
      SELECT doc_id, {_MD5_60.format(c='sh0')} % {M} AS x
      FROM (SELECT doc_id, unnest(s) AS sh0 FROM sh)
    ), sig AS (
      SELECT doc_id, {sig} FROM h GROUP BY doc_id
    ), bands AS (
      {band_arms}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.bn = b.bn AND a.bk = b.bk
                               AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b, round({jac}, 6) AS jaccard
    FROM cand c JOIN sh sa ON sa.doc_id = c.id_a
                JOIN sh sb ON sb.doc_id = c.id_b
    WHERE {jac} >= {threshold}
    """


@query("minhash_lsh_pairs", oracle=_minhash_oracle())
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-Jaccard-verified — the
    100 TB-scale path for doc_jaccard_pairs (tests assert both agree).

    Runs with the cross-engine md5_60 base hash and exact band-tuple keys so
    the DuckDB oracle replays the SAME signatures, band collisions, and
    verification — a full value differential over the LSH pipeline, not just
    a row count. (`hash_fn="xxhash64"` is the marginally cheaper default for
    production use; same plan shape.)"""
    from fxspark.ops.dedup import minhash_lsh_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    return minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=64, bands=16,
                             threshold=0.8, hash_fn="md5_60")


# ---------------------------------------------------------------------------
# Similarity-search family (embeddings table) — north-star extensions
# ---------------------------------------------------------------------------

_COS_SQL = """list_sum(list_apply(list_zip({a}, {b}), p -> p[1]*p[2]))
           / (sqrt(list_sum(list_apply({a}, x -> x*x)))
              * sqrt(list_sum(list_apply({b}, x -> x*x))))"""


def _dbl(col: str) -> str:
    return f"list_transform({col}, x -> CAST(x AS DOUBLE))"


@query(
    "embedding_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings),
         q AS (SELECT emb AS qv FROM e WHERE vec_id = 0)
    SELECT vec_id, {_COS_SQL.format(a='emb', b='qv')} AS cos
    FROM e, q
    ORDER BY cos DESC, vec_id LIMIT 20
    """,
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 to the vec_id=0 embedding — bit-exact with
    the SQL fold (sequential double-precision accumulation in both engines)."""
    from fxspark.ops.similarity import cosine_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return cosine_topk(emb, q, k=20)


@query(
    "embedding_knn_join",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings),
         q AS (SELECT vec_id AS qid, emb AS qv FROM e WHERE vec_id < 3),
         scored AS (
           SELECT q.qid, e.vec_id, {_COS_SQL.format(a='e.emb', b='q.qv')} AS cos
           FROM e, q WHERE e.vec_id <> q.qid
         )
    SELECT qid, vec_id, cos, rk FROM (
      SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def q_embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: top-3 neighbors for each of 3 query vectors (broadcast
    queries, window rank per query).

    Precondition: ``vec_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — duplicate ids make
    top-k membership formulation-dependent; sf_dups boundary)."""
    from fxspark.ops.similarity import knn_join

    emb = require_unique(
        spread(load_table(spark, sf_dir, "embeddings")), "vec_id",
        context="embedding_knn_join",
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return knn_join(queries, emb, k=3, exclude_same_id=True)


@query(
    "doc_lang_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS en,
        len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht'], x))) AS de,
        len(list_filter(toks, x -> list_contains(['le','la','et','est','les'], x))) AS fr,
        len(list_filter(toks, x -> list_contains(['el','los','que','y','es'], x))) AS es
      FROM t
    )
    SELECT doc_id, lang,
      CASE WHEN en IS NULL OR greatest(en, de, fr, es) = 0 THEN 'unknown'
           WHEN es > greatest(en, de, fr) THEN 'es'
           WHEN fr > greatest(en, de) THEN 'fr'
           WHEN de > en THEN 'de'
           ELSE 'en' END AS lang_pred
    FROM s
    """,
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by marker-word argmax (ops/text.lang_id) next to the
    table's ground-truth ``lang``. The oracle restates the strict-``>``
    tie-break chain as nested CASEs — same declared semantics, zero hashing."""
    from fxspark.ops.text import lang_id

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", "lang", lang_id(F.col("text")).alias("lang_pred")
    )


@query(
    "doc_fingerprint",
    oracle="""
    -- NULL text has no fingerprint (NULL, distinct from '' whose fp is
    -- the seed 0) — DuckDB's list fold would otherwise yield the seed.
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(lower(trim(text))[i]) AS BIGINT)
                for i in range(1, len(lower(trim(text))) + 1)]),
             (acc, c) -> (acc * 131 + c) % 1000000007) END AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint per document
    (ops/text.rolling_fingerprint): declared arithmetic both engines fold
    identically — unlike md5 this is incremental/rolling-window capable."""
    from fxspark.ops.text import rolling_fingerprint

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp"))


def _simhash_oracle(max_hamming: int = 6) -> str:
    # 60-bit simhash under md5_60 (bits 60-63 vote negative on both engines).
    votes = ", ".join(
        f"sum(CASE WHEN (x >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(60)
    )
    code = " + ".join(f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(60))
    band_arms = "\n      UNION ALL ".join(
        f"SELECT doc_id, c, {b} AS bn, (c >> {8 * b}) & 255 AS bv FROM code"
        for b in range(8)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct([array_to_string(t[i:i+1], ' ')
                                    for i in range(1, len(t))]) AS s
      FROM toks WHERE len(t) >= 2
    ), h AS (
      SELECT doc_id, {_MD5_60.format(c='sh0')} AS x
      FROM (SELECT doc_id, unnest(s) AS sh0 FROM sh)
    ), votes AS (
      SELECT doc_id, {votes} FROM h GROUP BY doc_id
    ), code AS (
      SELECT doc_id, CAST({code} AS BIGINT) AS c FROM votes
    ), bands AS (
      {band_arms}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.c, b.c)) AS hamming
    FROM bands a JOIN bands b ON a.bn = b.bn AND a.bv = b.bv
                             AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.c, b.c)) <= {max_hamming}
    """


@query("simhash_near_dup", oracle=_simhash_oracle())
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (bigram shingles, hamming ≤ 6) via pigeonhole
    byte-bands — the cheapest dedup tier: 8 bytes of state per doc, no
    all-pairs join. At sf0.01 this recovers 23 of the 25 exact
    jaccard≥0.8 pairs (92% recall) from a 125k-pair space; tests assert
    hamming tracks token-set similarity.

    md5_60 base hash ⇒ the DuckDB oracle recomputes the same 60-bit codes,
    byte bands, and hamming distances — full value differential."""
    from fxspark.ops.dedup import simhash_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    return simhash_pairs(docs, "doc_id", "text", n=2, max_hamming=6,
                         hash_fn="md5_60")


@query(
    "order_pct_change",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_totalprice,
           round((o_totalprice - lag(o_totalprice) OVER w)
                 / lag(o_totalprice) OVER w * 100, 4) AS pct_change
    -- undated orders are unplaceable in the consecutive ordering
    FROM orders WHERE o_orderdate IS NOT NULL
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_order_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-order %-change per customer — the reference's pct-change
    semantics (ops/change.pct_change, `Fx_1min.py:208`) generalized onto the
    orders table via lag(), per the FIXTURES.md operator mapping."""
    from pyspark.sql import Window

    from fxspark.ops.change import pct_change

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()  # see oracle note
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_totalprice"),
        pct_change(F.col("o_totalprice"), prev, 4).alias("pct_change"),
    )


@query(
    "priority_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,4)))
                FILTER (o_orderstatus = 'F') AS DOUBLE) AS rev_f
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long→wide reshape): order counts by priority × status as
    columns. Spark's ``pivot`` with an EXPLICIT value list stays a single
    hash aggregation (no extra pass to discover values — always pin the
    list at scale); the oracle states the same thing as FILTERed aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("o_totalprice")).alias("rev"),
        )
        .select(
            "o_orderpriority",
            F.coalesce("F_n", F.lit(0)).alias("n_f"),
            F.coalesce("O_n", F.lit(0)).alias("n_o"),
            F.coalesce("P_n", F.lit(0)).alias("n_p"),
            F.col("F_rev").alias("rev_f"),
        )
    )


@query(
    "sales_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS BIGINT)
             AS grp_id
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    HAVING count(*) > 0
    """,
)
def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (grouping-sets family — SURVEY.md
    §2.5 gap filled natively): per (flag, status), per flag, and grand total
    in ONE pass — partial aggregation handles all levels map-side, vs 3
    separate scans. grp_id disambiguates subtotal rows from data NULLs.
    The ``n_rows > 0`` filter is the D12 empty-input discipline (see
    q_daily_rollup) — a no-op on any non-empty input."""
    li = load_table(spark, sf_dir, "lineitem")
    # grp_id is declared as g(flag) + 2*g(status) explicitly on both sides —
    # engines disagree on grouping_id() bit order, so never rely on it.
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.grouping("l_returnflag") + F.grouping("l_linestatus") * 2)
            .cast("long")
            .alias("grp_id"),
        )
        .filter(F.col("n_rows") > 0)
    )


@query(
    "segment_priority_cube",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           CAST(grouping(c_mktsegment) + 2 * grouping(o_orderpriority) AS BIGINT)
             AS grp_id
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE(c_mktsegment, o_orderpriority)
    HAVING count(*) > 0
    """,
)
def q_segment_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^n grouping sets in one pass — completes the grouping-sets
    family next to ROLLUP/PIVOT): revenue by segment × priority, each margin,
    and the grand total. The segment column rides in on a broadcast dim join
    before the single cube aggregation; grp_id pinned explicitly on both
    sides (engines disagree on grouping_id() bit order). The
    ``n_orders > 0`` filter is the D12 empty-input discipline (see
    q_daily_rollup) — a no-op on any non-empty input."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    return (
        joined.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("revenue"),
            (F.grouping("c_mktsegment") + F.grouping("o_orderpriority") * 2)
            .cast("long")
            .alias("grp_id"),
        )
        .filter(F.col("n_orders") > 0)
    )


@query(
    "purchase_click_range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           p.ts AS purchase_ts, c.ts AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 1800 * 1000000
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_purchase_click_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join (ops/asof.range_join): every (purchase, click)
    pair by the same user within ±30 minutes. The oracle brute-forces the
    theta-join; the engine buckets time into tolerance-wide bins and
    equi-joins adjacent bins — linear shuffle, no cross product."""
    from fxspark.ops.asof import range_join

    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).withColumnRenamed("c_user_id", "user_id")
    return range_join(
        p, c, "purchase_ts", "click_ts", tolerance_s=1800, keys="user_id"
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


@query(
    "rolling_value_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER w AS DOUBLE) AS sum_1h,
           CAST(count(*) OVER w AS BIGINT) AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_value_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling event-time window (RANGE frame): per user, the trailing-1-hour
    value sum/count at every event — the time-series smoothing shape the FX
    domain implies. Spark range frames need a numeric order key, so ts is
    ordered as epoch MICROseconds (a seconds cast would truncate sub-second
    events into the wrong frame); sums go through decimal (frame content is
    order-stable, frame SUM order is not)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(38,6))) AS DOUBLE) AS DOUBLE) AS promo_share,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share of a ship month — conditional
    aggregation over a fact-to-dimension join. part broadcasts (it's the
    dim); the date filter pushes into the lineitem scan, so the join input
    is one month of the fact, not the table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    promo = F.when(F.col("p_type") == "PROMO", rev.cast("decimal(38,6)")).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return j.agg(
        (100.0 * F.sum(promo).cast("double")
         / exact_sum(rev, 6)).cast("double").alias("promo_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (SURVEY.md §2.5 gap: the
    reference has no distribution aggregates). Spark's sort-based
    ``percentile`` is bit-identical to DuckDB's ``quantile_cont`` (same
    linear-interpolation definition). The 100 TB variant swaps in
    ``approx_percentile`` (t-digest, mergeable, no global sort) — declared
    here exact so the differential stays a hash match."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "customer_set_ops",
    oracle="""
    WITH early AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
         late  AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
         urgent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
    SELECT o_custkey FROM (
      SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late
      EXCEPT
      SELECT o_custkey FROM urgent
    )
    """,
)
def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra (INTERSECT/EXCEPT — SURVEY.md §2.5 gap filled natively):
    customers active both early and late but never urgent. Spark plans these
    as left-semi/left-anti hash joins — same shuffle shape as the join
    family, no materialized distinct needed."""
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    late = orders.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return early.intersect(late).exceptAll(urgent.distinct()).distinct()


# 24-byte synthetic PNG header (magic + IHDR chunk header + 64x48 dims) —
# prepended to even-doc payloads so decode_image_meta exercises the real
# byte-parsing branch; odd docs stay raw text bytes ('unknown').
_PNG_HEADER = (
    b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
    + (64).to_bytes(4, "big") + (48).to_bytes(4, "big")
)


def _doc_media(
    spark: SparkSession, sf_dir: str, parts: int | None = 8
) -> DataFrame:
    from fxspark.multimodal import to_media_frame

    # 8 partitions, not defaultParallelism: each mapInPandas partition costs
    # a Python worker + Arrow stream; at fixture scale 32 workers for 5k
    # tiny payloads is pure overhead (measured 0.65 s vs 0.37 s warm). On
    # real multi-split media inputs parallelism follows the scan, not this.
    # parts=None (the JVM-expression meta paths) skips the repartition
    # entirely: no Python stage ⇒ no reason to shuffle at all.
    docs = load_table(spark, sf_dir, "documents")
    if parts is not None:
        docs = spread(docs, parts=parts)
    payload = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit(_PNG_HEADER), F.encode("text", "UTF-8")),
    ).otherwise(F.encode("text", "UTF-8"))
    return to_media_frame(
        docs.select("doc_id", payload.alias("payload")), "doc_id", "payload", "image"
    )


@query(
    "media_meta",
    oracle="""
    -- NULL text builds a NULL payload, which the sniffer reports as
    -- 'empty'/-1 (missing media), whatever the doc_id parity says.
    SELECT doc_id AS media_id, 'image' AS media_type,
           CASE WHEN doc_id % 2 = 0 THEN octet_length(encode(text)) + 24
                ELSE octet_length(encode(text)) END AS n_bytes,
           CASE WHEN text IS NULL THEN 'empty'
                WHEN doc_id % 2 = 0 THEN 'png' ELSE 'unknown' END AS format,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN 64 ELSE -1 END AS width,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN 48 ELSE -1 END AS height
    FROM documents
    """,
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata decode over mapInPandas (multimodal.py): binary
    payloads (synthetic PNG headers on even docs) → format/dimensions.

    Header sniffing is fixed-offset byte math, so this runs as pure JVM
    expressions inside the scan stage (decode_image_meta_expr) — zero Python
    workers, zero shuffle; the mapInPandas twin (decode_image_meta, parity-
    tested) is the template real codecs drop into. The oracle restates the
    DECLARED sniffing semantics."""
    from fxspark.multimodal import decode_image_meta_expr

    return decode_image_meta_expr(_doc_media(spark, sf_dir, parts=None))


def _media_features_oracle() -> str:
    """DuckDB replay of the stub feature extractor: embedding[i] is the
    L2-normalized histogram of ``byte % 16`` — i.e. of each byte's LOW NIBBLE,
    which is exactly every second character of ``hex(payload)``. Count the 16
    hex digits at those positions and the stub is plain SQL."""
    png_hex = _PNG_HEADER.hex().upper()
    counts = ", ".join(
        f"(length(nib) - length(replace(nib, '{d}', ''))) AS c{i}"
        for i, d in enumerate("0123456789ABCDEF")
    )
    sq = " + ".join(f"c{i}*c{i}" for i in range(16))
    return f"""
    WITH h AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN '{png_hex}' || hex(encode(text))
                  ELSE hex(encode(text)) END AS hx
      FROM documents
    ), nibs AS (
      SELECT media_id, regexp_replace(hx, '.(.)', '\\1', 'g') AS nib FROM h
    ), cnt AS (
      SELECT media_id, {counts} FROM nibs
    ), nrm AS (
      SELECT media_id, c0, sqrt({sq}) AS l2 FROM cnt
    )
    SELECT media_id, 16 AS feat_dim,
           CAST(CASE WHEN l2 > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS feat_l2,
           CAST(CASE WHEN l2 > 0 THEN round(c0 / l2, 3) ELSE 0.0 END
                AS DOUBLE) AS feat_0
    FROM nrm
    """


@query("media_features", oracle=_media_features_oracle())
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction (STUB encoder, real plumbing): Arrow
    batches in, fixed-dim array<float> out — the contract a real image/audio
    model drops into (multimodal.extract_features).

    The query surface projects scalar summaries of the vector (dim, L2 norm,
    first component) rather than the raw array<float>: the correctness
    harness canonicalizes result sets by sorting every column, and Python
    lists aren't orderable/hashable — the vector itself stays available via
    the library call."""
    from fxspark.multimodal import extract_features

    feats = extract_features(_doc_media(spark, sf_dir))
    return feats.select(
        "media_id",
        F.size("feature").alias("feat_dim"),
        F.round(F.sqrt(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x)), 3)
        .alias("feat_l2"),
        # widen BEFORE rounding: round(double) yields the exact f64 nearest
        # the 3-decimal value, bit-identical to the oracle's f64 round
        F.round(F.element_at("feature", 1).cast("double"), 3).alias("feat_0"),
    )


def _lsh_planes(n_planes: int = 6, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic random-hyperplane set on a dyadic grid (multiples of
    1/1024): every coordinate is exactly representable in binary floating
    point AND as a short decimal literal, so the Spark plan and the DuckDB
    oracle parse bit-identical planes."""
    import numpy as np

    rng = np.random.default_rng(seed)
    p = rng.standard_normal((n_planes, dim))
    return [[float(round(x * 1024)) / 1024 for x in row] for row in p]


def _ann_lsh_oracle() -> str:
    planes = _lsh_planes()
    bucket = " + ".join(
        f"(CASE WHEN list_sum(list_apply(list_zip(emb, {planes[i]!r}), p -> p[1]*p[2])) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(len(planes))
    )
    return f"""
    WITH e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings),
         b AS (SELECT vec_id, emb, {bucket} AS bucket FROM e),
         q AS (SELECT emb AS qv, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT vec_id, {_COS_SQL.format(a='emb', b='qv')} AS cos
    FROM b, q WHERE b.bucket = q.qb
    ORDER BY cos DESC, vec_id LIMIT 10
    """


@query("embedding_ann_lsh", oracle=_ann_lsh_oracle())
def q_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for the vec_id=0 query via random-hyperplane LSH
    (ops/similarity.rp_lsh_topk): only the query's bucket is scored — the
    scale path where brute-force cosine (embedding_topk) is the small-N
    baseline. Deterministic planes make even the approximate result
    oracle-checkable."""
    from fxspark.ops.similarity import rp_lsh_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return rp_lsh_topk(emb, q, _lsh_planes(), k=10)


def _ivf_oracle() -> str | None:
    """DuckDB replay of the IVF index: re-train the seeded codebook on the
    gate's sf0.01 parquet with the SAME routine the Spark plan uses
    (similarity.train_ivf_codebook — identical sample, seed, Lloyd steps),
    inline the centroids as literals, then assign/probe/score in SQL. The
    assignment ORDER BY mirrors ``_nearest``'s ``-2·x·c + |c|²`` argmin
    (cell-index tiebreak = numpy argmin-first). Returns None (rows-only
    check) if the gate fixture isn't readable at import time."""
    try:
        import numpy as np
        import pyarrow.parquet as pq

        from fxspark.ops.similarity import train_ivf_codebook

        sf_dir = os.environ.get("FXSPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01")
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_by("vec_id")
        # dtype=object: train_ivf_codebook drops NULL vectors from the
        # sample itself, so all callers derive the identical codebook
        sample = np.array(t.column("embedding").to_pylist()[:4096],
                          dtype=object)
        cents = train_ivf_codebook(sample, n_cells=16, seed=7)
    except Exception:  # noqa: BLE001 — no fixture ⇒ honest rows-only check
        return None
    if not cents:  # empty fixture ⇒ no VALUES list — rows-only check
        return None
    vals = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    return f"""
    WITH cent(cell, cv) AS (VALUES {vals}),
    -- class 10: NULL embeddings are not vectors — excluded from corpus
    -- AND query (a NULL query vector makes every distance NULL: the
    -- probe pick degenerates to an untied all-NULL sort on both engines)
    e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings
          WHERE embedding IS NOT NULL),
    assigned AS (
      SELECT vec_id, emb,
             (SELECT cell FROM cent
              ORDER BY -2 * list_sum(list_apply(list_zip(emb, cv), p -> p[1]*p[2]))
                       + list_sum(list_apply(cv, x -> x*x)) ASC, cell ASC
              LIMIT 1) AS cell
      FROM e),
    q AS (SELECT emb AS qv FROM e WHERE vec_id = 0),
    probe AS (SELECT cell FROM cent, q
              ORDER BY {_COS_SQL.format(a='cv', b='qv')} DESC, cell LIMIT 4)
    SELECT vec_id, {_COS_SQL.format(a='emb', b='qv')} AS cos
    FROM assigned JOIN probe USING (cell), q
    ORDER BY cos DESC, vec_id LIMIT 10
    """


@query("embedding_ivf_topk", oracle=_ivf_oracle())
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for the vec_id=0 query: k-means coarse quantizer,
    probe the 4 nearest of 16 cells (ops/similarity.ivf_topk) — the
    data-adaptive ANN tier next to the hyperplane-LSH one; tests pin it to
    exact brute force when every cell is probed."""
    from fxspark.ops.similarity import ivf_topk

    # pandas-UDF assignment: partitions follow the data (worker+Arrow cost
    # per partition — see _doc_media), not the core count
    emb = spread(load_table(spark, sf_dir, "embeddings"), parts=8)
    # class 10: a NULL query vector is not a query — the frame goes EMPTY
    # and the top-k is empty (defined), rather than an all-NULL-distance
    # probe sort with no tiebreak. The CORPUS is passed unfiltered: the
    # codebook sample must stay the raw first-4096-by-id slice (the r15
    # ivf_assign contract — the trainer drops Nones itself) and the
    # assignment path already excludes NULL vectors.
    q = (
        emb.filter((F.col("vec_id") == 0) & F.col("embedding").isNotNull())
        .select(F.col("embedding").alias("qv"))
    )
    return ivf_topk(emb, q, n_cells=16, n_probe=4, k=10)


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS_SQL.format(a='a.emb', b='b.emb')} AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL.format(a='a.emb', b='b.emb')} >= 0.45
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.45) — exact
    all-pairs tier of the dedup family, computed by the blocked-matmul path
    (numpy BLAS candidates + sequential-fold exact re-score: bit-identical
    to the zip_with form, ~20× faster)."""
    from fxspark.ops.similarity import cosine_pairs_blocked

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return cosine_pairs_blocked(emb, 0.45)


# ---------------------------------------------------------------------------
# Relational breadth, round 2 — decorrelated TPC-H Q2/Q8/Q13/Q17/Q18/Q22
# shapes plus distribution windows (ntile / percent_rank / cume_dist /
# first_value / last_value). All aggregated doubles go through exact_sum.
# ---------------------------------------------------------------------------


@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_orders AS order_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_orders
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_orders
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: conditional LEFT join + per-customer count + histogram
    of the counts. Two shuffles total (join on custkey reuses the first agg's
    partitioning; the histogram agg is over ≤26 distinct keys, map-side
    combined down to almost nothing). Generalizes the reference's grouped
    counting (SURVEY.md §2.5) to outer-join semantics where zero-order
    customers still appear (order_count = 0 bucket)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "part_small_qty_revenue",
    oracle="""
    WITH li_b AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#23'
    ),
    st AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
             count(*) AS cq
      FROM li_b GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM li_b l JOIN st ON l.l_partkey = st.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,4)) * 5 * st.cq < st.sq
    """,
)
def q_part_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of lineitems whose quantity is below 20% of
    the per-part average (the reference's correlated-AVG pattern, decorrelated
    into groupBy + broadcast join back — Catalyst would do the same rewrite
    for the subquery form). The 0.2·avg comparison is done in exact decimal
    arithmetic (qty·5·count < sum) so the boundary predicate is bit-identical
    in both engines. Scale: the brand filter prunes part first (broadcast),
    so lineitem is scanned once and shuffles only the pruned ~5% of rows."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # part_f / st scale with sf (brand sliver of part) — no broadcast hints;
    # AQE picks broadcast at runtime when the sliver fits
    li_b = li.join(part_f, F.col("l_partkey") == F.col("p_partkey")).drop(
        "p_partkey"
    )
    qty_dec = F.col("l_quantity").cast("decimal(18,4)")
    st = li_b.groupBy(F.col("l_partkey").alias("sk")).agg(
        F.sum(qty_dec).alias("sq"), F.count(F.lit(1)).alias("cq")
    )
    small = li_b.join(st, F.col("l_partkey") == F.col("sk")).filter(
        qty_dec * 5 * F.col("cq") < F.col("sq")
    )
    return small.agg(
        (exact_sum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
    )


@query(
    "big_volume_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(t.sq AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(38,4))) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(38,4))) > 300
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_big_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds 300
    (HAVING over a grouped sum), joined back to orders + customer. The
    aggregate runs FIRST and the >300 filter cuts it to a sliver, so the
    subsequent joins move almost no rows — at 100 TB the only full-size
    shuffle is the one l_orderkey agg (map-side partials shrink it ~4×);
    AQE turns both join sides broadcast once the sliver is known."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,4)")).alias("sq"))
        .filter(F.col("sq") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sq").cast("double").alias("sum_qty"),
        )
    )


@query(
    "rich_idle_customers",
    oracle="""
    WITH st AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(38,6))) AS s, count(*) AS n
      FROM customer WHERE c_acctbal > 0
    ),
    rich AS (
      SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      FROM customer c, st
      WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * st.n > st.s
    )
    SELECT c_nationkey, count(*) AS n_rich,
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM rich
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = rich.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
    )
    GROUP BY c_nationkey
    """,
)
def q_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the global positive-balance average
    (scalar subquery → single-row broadcast cross join) with no recent
    orders (anti join), grouped by nation. The above-average predicate is
    evaluated as acctbal·n > sum in exact decimal so both engines agree at
    the boundary. Scale: the global agg is one tiny all-to-one partial agg;
    the anti join shuffles only the rich sliver against recent order keys."""
    customer = load_table(spark, sf_dir, "customer")
    bal_dec = F.col("c_acctbal").cast("decimal(38,6)")
    st = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_dec).alias("s"), F.count(F.lit(1)).alias("n")
    )
    rich = customer.crossJoin(F.broadcast(st)).filter(
        F.col("c_acctbal").cast("decimal(18,6)") * F.col("n") > F.col("s")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-07-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    idle = anti_join(rich, recent, "c_custkey")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rich"),
        exact_sum(F.col("c_acctbal"), 6).alias("total_bal"),
    )


@query(
    "nation_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_7'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS total_vol
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    GROUP BY year(o.o_orderdate)
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7 suppliers' share of revenue delivered to
    ASIA customers, per order year — conditional aggregation (sum(CASE)/sum)
    over a 6-way star join. Dims (customer/supplier/nation/region) broadcast;
    the only big shuffle is lineitem⋈orders on orderkey. The share division
    happens once per year-group in double — deterministic given the
    decimal-exact numerator/denominator sums."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "supplier", "nation", "region")}
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nk"))
    )
    cust_asia = (
        t["customer"]
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cust_nk"))
        .select("c_custkey")
    )
    supp_nation = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        # cust_asia / supp_nation scale with sf — AQE decides broadcast
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", vol_dec).otherwise(
            F.lit(0).cast("decimal(38,6)")
        )
    ).cast("double")
    den = F.sum(vol_dec).cast("double")
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (num / den).alias("mkt_share"), den.alias("total_vol")
    )


@query(
    "min_cost_supplier",
    oracle="""
    WITH u AS (
      SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit
      FROM lineitem
    ),
    m AS (SELECT l_partkey, min(unit) AS min_unit FROM u GROUP BY l_partkey)
    SELECT DISTINCT u.l_partkey, u.l_suppkey, m.min_unit
    FROM u JOIN m ON u.l_partkey = m.l_partkey AND u.unit = m.min_unit
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every part, the supplier(s) offering it at the
    minimum observed unit price — the correlated-MIN subquery, decorrelated
    into groupBy-min + join back on the min (all ties kept, then DISTINCT).
    The unit price is the same IEEE double expression in both engines, and
    min() is order-independent, so the equality join is bit-safe. Scale:
    both sides partition on l_partkey — one shuffle, reused by the join
    (no re-exchange; AQE coalesces the tiny grouped side to broadcast)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
    )
    mins = li.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit").alias("min_unit")
    )
    return (
        li.join(
            mins,
            (F.col("l_partkey") == F.col("mk")) & (F.col("unit") == F.col("min_unit")),
        )
        .select("l_partkey", "l_suppkey", "min_unit")
        .distinct()
    )


@query(
    "customer_spend_quartiles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(38,4))) AS sp
      FROM orders GROUP BY o_custkey
    ),
    nn AS (SELECT sp FROM spend WHERE sp IS NOT NULL),
    st AS (SELECT count(*) AS c FROM nn),
    r AS (SELECT sp, row_number() OVER (ORDER BY sp) AS rn FROM nn),
    b AS (
      SELECT r.sp AS bv
      FROM r JOIN (SELECT i, (c * i + 3) // 4 AS k
                   FROM st, (SELECT unnest(range(1, 4)) AS i)) t
        ON r.rn = t.k
    ),
    binned AS (
      -- NULL spend is outside the bin domain (quantile_bins labels it
      -- NULL); the rank-count formula alone would call it quartile 4.
      SELECT s.sp,
             CASE WHEN s.sp IS NULL THEN NULL
                  ELSE CAST(4 - (SELECT count(*) FROM b WHERE b.bv < s.sp)
                       AS INTEGER) END AS quartile
      FROM spend s
    )
    SELECT quartile, count(*) AS n_customers,
           CAST(min(sp) AS DOUBLE) AS min_spend,
           CAST(max(sp) AS DOUBLE) AS max_spend
    FROM binned GROUP BY quartile
    """,
)
def q_customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer lifetime spend folded to one row per quartile, binned by
    ``ops/quantile.quantile_bins`` — the SCALE form of ``ntile(4) OVER
    (ORDER BY sp DESC)``: exact rank-``ceil(c*i/4)`` boundaries located via
    a coarse histogram (no global sort), broadcast, binned map-side.
    Declared tie semantics: equal spends share a quartile (value-
    deterministic), where ntile would split them by tiebreak; the oracle
    computes the identical rank-based boundaries so the differential is a
    hash match. Quartile 1 = top spenders."""
    from fxspark.ops.quantile import quantile_bins

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("sp")
    ).localCheckpoint(eager=False)
    binned = quantile_bins(spend, "sp", 4, "quartile", descending=True)
    return binned.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("sp").cast("double").alias("min_spend"),
        F.max("sp").cast("double").alias("max_spend"),
    )


@query(
    "first_last_order_delta",
    oracle="""
    SELECT o_custkey, first_price, last_price,
           last_price - first_price AS delta
    FROM (
      SELECT o_custkey,
             first_value(o_totalprice) OVER w AS first_price,
             last_value(o_totalprice) OVER w AS last_price,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      -- undated orders are unplaceable in the first/last ordering
      FROM orders WHERE o_orderdate IS NOT NULL
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ) WHERE rn = 1
    """,
)
def q_first_last_order_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over an unbounded frame: each customer's
    first and last order price (by orderdate, orderkey tiebreak) and the
    drift between them. One shuffle on o_custkey serves both window specs
    (same partitioning + ordering); the rn=1 filter keeps one row per
    customer. The subtraction is plain IEEE double on identical operands."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()  # see oracle note
    )
    order_cols = [F.col("o_orderdate"), F.col("o_orderkey")]
    wf = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wr = Window.partitionBy("o_custkey").orderBy(*order_cols)
    return (
        orders.select(
            "o_custkey",
            F.first("o_totalprice").over(wf).alias("first_price"),
            F.last("o_totalprice").over(wf).alias("last_price"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "first_price",
            "last_price",
            (F.col("last_price") - F.col("first_price")).alias("delta"),
        )
    )


@query(
    "returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, nation, revenue
    FROM (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ) ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    6-month window — global ORDER BY + LIMIT on an aggregate (the reference
    has no top-k; SURVEY.md §2.5). Spark plans the limit as TakeOrderedAndProject
    (per-partition top-20, then a 20-row merge on the driver — no global
    sort). Ties are broken by c_custkey so the selected set is deterministic.
    The date filter pushes into the orders scan; both dims broadcast."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "nation")}
    orders_f = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li_r = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li_r.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer scales with sf — no broadcast hint; AQE converts the join
        # at runtime only when the side actually fits the threshold
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(exact_sum(rev, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "supplier_count_by_part",
    oracle="""
    SELECT p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 5, 9, 13) AND p.p_brand <> 'Brand#4'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_type, p.p_size
    """,
)
def q_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part type/size, with a
    NOT IN supplier blacklist (negative balance stands in for the complaints
    filter). NOT IN over a non-nullable key = left-anti broadcast join (the
    blacklist is tiny by construction). count(DISTINCT) is the first
    distinct-aggregate in the surface — Spark expands it to a two-phase
    aggregate (partial distinct per partition, then final), no extra code."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(1, 5, 9, 13) & (F.col("p_brand") != "Brand#4"))
        .select("p_partkey", "p_type", "p_size")
    )
    blacklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    clean = anti_join(li, blacklist, "l_suppkey")
    return (
        clean.join(part_f, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "disjunctive_promo_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    part-side and lineitem-side conditions. Catalyst factors the part-only
    disjuncts (brand+size) into a pushed-down scan filter on part, leaving
    the mixed residual as a post-join filter — the classic disjunctive
    pushdown test. Brand#34 matches no part at any sf (brands stop at 25):
    a deliberately-empty disjunct proving OR branches don't leak rows."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(exact_sum(rev, 6).alias("revenue"))


@query(
    "waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness adapted to shipdate > orderdate + 60 days —
    the schema has no commit/receipt dates): suppliers who were the SOLE
    late supplier on a multi-supplier finalized order. The oracle keeps the
    correlated EXISTS / NOT EXISTS form; here both correlations decorrelate
    into per-(order,supplier) lateness flags plus a per-order WINDOW
    (count + late-count over l_orderkey) — lineitem is scanned and shuffled
    exactly once, versus three self-joins in the literal form; the window's
    re-exchange moves only the already-aggregated (order,supplier) rows.
    count(DISTINCT orderkey) per supplier == count of qualifying
    (order,supplier) pairs by construction.

    Precondition: ``o_orderkey`` unique in ``orders``
    (``ops.checks.require_unique``, enforced under
    FXSPARK_VALIDATE_CONTRACTS=1 — the decorrelated window form counts
    (order, supplier) pairs once per ORDER ROW, and the oracle's
    count(DISTINCT)-vs-EXISTS equivalence needs one order row per key;
    sf_dups boundary)."""
    orders_f = (
        require_unique(
            load_table(spark, sf_dir, "orders"), "o_orderkey",
            context="waiting_suppliers",
        )
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    is_late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    from pyspark.sql import Window

    ls = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(is_late).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        ls.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "events_approx_stats",
    oracle="""
    WITH h AS (
      -- a NULL user_id is not a user: its NULL hash would rank FIRST in
      -- Spark's 64-smallest and LAST in DuckDB's (D8), shifting the kth
      -- statistic once the domain exceeds k (round-16 sf0.01 nullkeys
      -- probe)
      SELECT DISTINCT event_type,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
          / 1152921504606846976.0 AS h
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ), kmv AS (
      SELECT event_type, count(*) AS n_seen, max(h) AS kth
      FROM r WHERE rn <= 64 GROUP BY event_type
    ), s AS (
      SELECT event_type, value, event_id
      FROM events
      WHERE value IS NOT NULL
        AND CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                 AS BIGINT) / 1152921504606846976.0 < 0.25
    ), samp AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS ns
      FROM s
    ), med AS (
      SELECT event_type, round(CAST(value AS DOUBLE), 6) AS approx_p50_value
      FROM samp WHERE rn = (ns + 1) // 2
    ), c AS (
      SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(round(CASE WHEN kmv.n_seen < 64 THEN kmv.n_seen
                           ELSE (64 - 1) / kmv.kth END, 0) AS BIGINT)
             AS approx_users,
           med.approx_p50_value,
           c.n_events
    FROM c
    JOIN kmv ON kmv.event_type = c.event_type
    LEFT JOIN med ON med.event_type = c.event_type
    """,
)
def q_events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (SURVEY.md §2.5 gap) with DECLARED randomness,
    per event_type: KMV (k=64, md5-fraction hash) distinct-user estimate and
    the discrete median of a deterministic 25% hash sample, next to the
    exact count. The opaque production sketches (``approx_count_distinct``
    HLL++, ``approx_percentile`` t-digest) compute the same quantities with
    mergeable constant-size state — but their estimates are implementation
    randomness, so they can never be differentially verified; declaring the
    hash makes the ESTIMATE ITSELF bit-reproducible by the DuckDB oracle
    (same pattern as ``events_kmv_distinct``). Scale shape: the per-group
    k-smallest is pruned in two phases (per-salt top-k, then top-k of the
    32·k survivors) so no group ever sorts more than 32·k candidate rows;
    the sample median sorts 25% of each group — the declared-verifiable
    tier; t-digest remains the beyond path and is error-bound-pinned
    against this twin in tests/test_ops.py. Round-6 fusion post-mortem
    (measured, kept as a negative result): the suggested one-scan rewrite
    was tried two ways — a shared ``repartition(event_type)`` feeding all
    three branches (0.80-0.90 s steady at sf0.1: it trades away the map-
    side partial aggregations, so every branch shuffles raw rows) and a
    no-salt/dense_rank minimal-stage form (0.9-1.0 s: the raw per-type
    sort costs more than the distinct it saved) — both LOST to this salted
    two-phase shape (~0.65 s). The two hash passes share no materializable
    work (md5 of user_id vs event_id, disjoint columns), so the query is
    stage-floor-bound at this SF and the bounded-sort topology is kept."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(2**60))
    )
    hh = (
        events.filter(F.col("user_id").isNotNull())  # not a user (D8 rank)
        .select("event_type", h.alias("h"))
        .distinct()
    )
    salted = hh.withColumn("_salt", F.pmod(F.xxhash64("h"), F.lit(32)))
    w1 = Window.partitionBy("event_type", "_salt").orderBy("h")
    cand = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= 64)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy("event_type").orderBy("h")
    kmin = cand.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= 64
    )
    kmv = kmin.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth")
    )
    hs = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(2**60))
    )
    # NULL value is not an observation: it must neither occupy a sample
    # slot (inflating ns) nor rank in the median order (D8 placement
    # split) — round-16 independent-null sweep; no-op on driver data
    samp = events.filter(hs < 0.25).filter(
        F.col("value").isNotNull()
    ).select("event_type", "value", "event_id")
    wm = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    med = (
        samp.withColumn("rn", F.row_number().over(wm))
        .withColumn("ns", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.expr("(ns + 1) div 2"))
        .select(
            "event_type",
            F.round(F.col("value").cast("double"), 6).alias(
                "approx_p50_value"
            ),
        )
    )
    c = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    est = F.round(
        F.when(F.col("n_seen") < 64, F.col("n_seen").cast("double")).otherwise(
            F.lit(63.0) / F.col("kth")
        ),
        0,
    ).cast("long")
    return (
        c.join(kmv, "event_type")
        .join(med, "event_type", "left")
        .select(
            "event_type", est.alias("approx_users"), "approx_p50_value",
            "n_events",
        )
    )


@query(
    "regional_sales_sets",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           grouping(n.n_name) AS g_nation,
           grouping(c.c_mktsegment) AS g_segment,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
             AS total_sales,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY GROUPING SETS ((n.n_name, c.c_mktsegment), (n.n_name),
                            (c.c_mktsegment))
    """,
)
def q_regional_sales_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond the ROLLUP/CUBE queries): nation ×
    segment sales at three chosen granularities in ONE pass —
    ``DataFrame.groupingSets`` expands rows once and aggregates with a
    single shuffle, versus three separate groupBys + union (three scans,
    three shuffles). grouping() flags disambiguate NULL-as-total from
    NULL-as-value, exactly as in the ROLLUP family."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "o_totalprice",
        )
    )
    return joined.groupingSets(
        [["nation", "segment"], ["nation"], ["segment"]],
        "nation", "segment",
    ).agg(
        F.grouping("nation").alias("g_nation"),
        F.grouping("segment").alias("g_segment"),
        exact_sum(F.col("o_totalprice")).alias("total_sales"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "doc_dedup_purge",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t)-1)]) AS s
      FROM toks WHERE len(t) >= 3
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node
    ), labels AS (
      SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM labels l
      WHERE l.node = d.doc_id AND l.cluster_id <> l.node
    )
    """,
)
def q_doc_dedup_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE near-dup dedup pipeline a training-data corpus needs:
    shingle → exact-jaccard pairs → connected components → keep each
    cluster's canonical (min-id) doc → anti-join the rest out of the
    corpus. Output is the surviving corpus. Scale shape: the purge list
    (non-canonical members) is tiny relative to the corpus, so the final
    step is (via AQE, when the list is small) a broadcast anti join and
    the corpus never shuffles; a dup-heavy corpus degrades gracefully to a
    shuffled anti join.

    Precondition: ``doc_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — sf_dups boundary)."""
    from fxspark.ops.dedup import dup_clusters, jaccard_pairs_prefix

    docs = require_unique(
        spread(load_table(spark, sf_dir, "documents")), "doc_id",
        context="doc_dedup_purge",
    )
    pairs = jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.8)
    clusters = dup_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return anti_join(docs.select("doc_id", "lang", "n_chars"), drop, "doc_id")


@query(
    "nation_balance_fullouter",
    oracle="""
    WITH cb AS (
      SELECT c_nationkey AS nk,
             CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS cust_bal,
             count(*) AS n_rich_cust
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ), sb AS (
      SELECT s_nationkey AS nk,
             CAST(sum(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS supp_bal,
             count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cb.nk, sb.nk) AS nationkey,
           cb.cust_bal, cb.n_rich_cust, sb.supp_bal, sb.n_supp
    FROM cb FULL OUTER JOIN sb ON cb.nk = sb.nk
    """,
)
def q_nation_balance_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the surface lacked): per-nation
    rich-customer balance vs supplier balance, keeping nations present on
    either side only (nulls on the other). Both inputs are pre-aggregated to
    ≤|nations| rows before the join, so the full-outer is a trivial sorted
    merge of two tiny sides — the aggregate-first discipline that keeps
    outer joins cheap at any scale."""
    cb = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(
            exact_sum(F.col("c_acctbal"), 6).alias("cust_bal"),
            F.count(F.lit(1)).alias("n_rich_cust"),
        )
    )
    sb = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(
            exact_sum(F.col("s_acctbal"), 6).alias("supp_bal"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )
    return cb.join(sb, F.col("cnk") == F.col("snk"), "full_outer").select(
        F.coalesce(F.col("cnk"), F.col("snk")).alias("nationkey"),
        "cust_bal", "n_rich_cust", "supp_bal", "n_supp",
    )


@query(
    "lineitem_unpivot_stats",
    oracle="""
    WITH m AS (
      SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    )
    SELECT metric, count(*) AS n,
           CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS total,
           min(v) AS vmin, max(v) AS vmax
    FROM m GROUP BY metric
    """,
)
def q_lineitem_unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long, the inverse of the pivot query): lineitem's four
    measures melted to (metric, value) rows, then per-metric stats.
    ``DataFrame.unpivot`` expands in the scan projection — one pass over the
    table, no UNION of four scans (the oracle's UNION ALL form is the
    semantic spec, not the plan: DuckDB reads the table four times there)."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "raw_metric", "v",
    ).select(
        F.expr("substring(raw_metric, 3)").alias("metric"), "v"
    )
    return melted.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("v"), 6).alias("total"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )


@query(
    "order_calendar_features",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_weekend,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY date_trunc('month', o_orderdate), last_day(o_orderdate)
    """,
)
def q_order_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/date scalar-function breadth (date_trunc, last_day, weekday)
    — monthly order stats with a weekend-order count. Weekday mapping is
    normalized explicitly: Spark ``weekday`` (Mon=0) vs DuckDB ``isodow``
    (Mon=1) — the classic cross-engine off-by-one, pinned by the
    differential. All expressions evaluate scan-side (no join, one shuffle
    on the ~84 month groups after map-side partials)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.last_day(F.col("o_orderdate")).cast("timestamp").alias("month_end"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.weekday(F.col("o_orderdate")) >= 5, 1).otherwise(0)
            ).alias("n_weekend"),
            exact_sum(F.col("o_totalprice")).alias("total"),
        )
    )


@query(
    "user_value_spread",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id,
           max(value) - min(value) AS value_range,
           min(CASE WHEN rn = (n + 1) // 2 THEN value END) AS lower_median,
           count(*) AS n_events
    FROM ranked GROUP BY user_id
    """,
)
def q_user_value_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregates via grouped-agg pandas UDAFs (ops/udaf.py): per-user
    value range and rank-based lower median, composed in ONE groupBy next to
    a JVM count — the UDF/UDAF surface the reference lacks entirely
    (SURVEY.md §2.5). The median is an actual element chosen under a total
    order (value, event_id), so the Arrow-batched Python result is
    bit-identical to the oracle's row_number formulation."""
    from fxspark.ops.udaf import count_agg, lower_median_agg, range_agg

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        range_agg("value").alias("value_range"),
        lower_median_agg("value", "event_id").alias("lower_median"),
        count_agg(F.col("event_id")).alias("n_events"),
    )


# 44-byte canonical WAV header (PCM, 16-bit): even docs get 8kHz mono, the
# payload body is the doc text bytes — duration derives from text length.
def _wav_header(rate: int, channels: int, bits: int) -> bytes:
    import struct as _s

    return (
        b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"fmt "
        + _s.pack("<IHHIIHH", 16, 1, channels, rate,
                  rate * channels * bits // 8, channels * bits // 8, bits)
        + b"data" + b"\x00\x00\x00\x00"
    )


@query(
    "media_audio_meta",
    oracle="""
    -- NULL-text -> NULL payload -> 'empty'/-1, as in media_meta
    SELECT doc_id AS media_id, 'audio' AS media_type,
           CASE WHEN doc_id % 2 = 0
                THEN octet_length(encode(text)) + 44
                ELSE octet_length(encode(text)) END AS n_bytes,
           CASE WHEN text IS NULL THEN 'empty'
                WHEN doc_id % 2 = 0 THEN 'wav'
                WHEN octet_length(encode(text)) = 0 THEN 'empty'
                ELSE 'unknown' END AS format,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN 8000 ELSE -1 END AS sample_rate,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN 1 ELSE -1 END AS channels,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN 16 ELSE -1 END AS bits_per_sample,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN CAST(floor(octet_length(encode(text)) / 16.0) AS BIGINT)
                ELSE -1 END AS duration_ms
    FROM documents
    """,
)
def q_media_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of ``media_meta``: synthetic 8 kHz/mono/16-bit WAV headers
    on even docs (body = text bytes), raw bytes on odd docs. The oracle
    restates the DECLARED header semantics — duration_ms = data_bytes /
    (rate·ch·bytes/sample/1000) = len/16 here.

    Runs as pure JVM expressions (decode_audio_meta_expr): the round-2
    driver run showed the Python-worker startup dominating this query
    (1.82 s for a header parse); fixed-offset byte math belongs in
    whole-stage codegen, not an Arrow stage. The mapInPandas twin stays as
    the codec template, parity-tested."""
    from fxspark.multimodal import decode_audio_meta_expr, to_media_frame

    docs = load_table(spark, sf_dir, "documents")
    hdr = _wav_header(8000, 1, 16)
    payload = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit(hdr), F.encode("text", "UTF-8")),
    ).otherwise(F.encode("text", "UTF-8"))
    media = to_media_frame(
        docs.select("doc_id", payload.alias("payload")), "doc_id", "payload", "audio"
    )
    return decode_audio_meta_expr(media)


@query(
    "discount_revenue_probe",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_discount_revenue_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive range predicates + aggregate —
    the canonical predicate-pushdown probe. Every filter reaches the parquet
    scan (date + discount + quantity all in PushedFilters); at 100 TB with a
    date-partitioned table the year predicate prunes partitions before any
    IO. No shuffle at all except the single-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "shipping_priority_topk",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_orderpriority, revenue FROM (
      SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND l.l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ) ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers (broadcast semi-reduce of
    orders) ⋈ shipdate-filtered lineitem, revenue per order, global top-10
    (TakeOrderedAndProject — per-partition heads merged on the driver, never
    a full sort)."""
    cust_b = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            # cust_b is a 1/5 slice of customer — scales with sf, AQE decides
            orders.join(cust_b, F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(rev, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "user_value_correlation",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DECIMAL(18,6)) AS v
      FROM events WHERE user_id < 300
      GROUP BY user_id, date_trunc('day', ts)
    ),
    joined AS (
      -- DECIMAL(19,6), not 18: DuckDB sizes a DECIMAL(18)x(18) product
      -- at 36 digits and OVERFLOWS where Spark auto-widens to 37 — found
      -- by the doubled-rows robustness probe (sf_dups); 19 forces the
      -- int128 path and a 38-digit result. Values are unchanged (exact).
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             CAST(a.v AS DECIMAL(19,6)) AS x, CAST(b.v AS DECIMAL(19,6)) AS y
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.user_id < b.user_id
    ),
    sums AS (
      -- x,y are DECIMAL(18,6): every product is an EXACT DECIMAL(37,12)
      -- (fits 38), every sum exact — zero rounding before the double cast
      SELECT user_a, user_b, count(*) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM joined GROUP BY user_a, user_b HAVING count(*) >= 10
    )
    SELECT user_a, user_b, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
    FROM sums
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      AND (n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) >= 0.5
    """,
)
def q_user_value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the PAPERS.md corpus theme — EDBT'19
    streaming series similarity, SIGMOD'20 adaptive similarity): pairs of
    users whose daily-value series correlate ≥ 0.5 over ≥ 10 common days.
    Series align by day-bucket equi-join (never a per-pair loop), Pearson
    terms are decimal-exact sums cast once to double, so the final
    float expression is bit-identical in both engines. Scale: the join is
    blocked by day (Σ per-day n² work, hash-partitioned); for web-scale user
    counts the LSH/IVF tiers in ops/similarity.py replace the exact pair
    join — same output contract."""
    # cohort-scoped (user_id < 300): the exact pair join is quadratic in
    # users-per-day; the declared full-corpus path is the LSH/IVF tier
    # (ops/similarity.py), same output contract. The cohort keeps the exact
    # tier's cost flat across scale factors.
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    daily = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("decimal(18,6)").alias("v"))
    a = daily.select(
        F.col("user_id").alias("user_a"), F.col("day").alias("da"), F.col("v").alias("x")
    )
    b = daily.select(
        F.col("user_id").alias("user_b"), F.col("day").alias("db"), F.col("v").alias("y")
    )
    joined = a.join(
        b, (F.col("da") == F.col("db")) & (F.col("user_a") < F.col("user_b"))
    )
    # x,y are decimal(18,6) → products are exact decimal(37,12); sums exact
    d10 = lambda c: F.sum(c).cast("double")
    sums = (
        joined.groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            d10(F.col("x")).alias("sx"),
            d10(F.col("y")).alias("sy"),
            d10(F.col("x") * F.col("y")).alias("sxy"),
            d10(F.col("x") * F.col("x")).alias("sxx"),
            d10(F.col("y") * F.col("y")).alias("syy"),
        )
        .filter(F.col("n") >= 10)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = num / (F.sqrt(vx) * F.sqrt(vy))
    return (
        sums.filter((vx > 0) & (vy > 0))
        .select("user_a", "user_b", "n", corr.alias("corr"))
        .filter(F.col("corr") >= 0.5)
    )


# ---------------------------------------------------------------------------
# Relational breadth, round 2: TPC-H Q7/Q9/Q11/Q15 shapes
# ---------------------------------------------------------------------------

@query(
    "volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by (supplier nation,
    customer nation, ship year). Two independent dimension chains hang off
    the same fact row (supplier side vs customer side) — both broadcast;
    the only shuffle is lineitem⋈orders plus the final 3-key aggregate.
    All nation pairs are reported (ordered to dedup the symmetric pair)
    rather than pinning two nations — same plan, no fragile constants."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "customer", "supplier", "nation")}
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(exact_sum(revenue, 6).alias("revenue"))


@query(
    "product_margin",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.5 * p.p_retailprice * l.l_quantity
                         AS DECIMAL(38,6))) AS DOUBLE) AS margin
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
)
def q_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by nation and year for a part family): the
    testdata has no partsupp, so unit cost is modeled as half retail price —
    the plan shape (fact ⋈ part-filtered dim ⋈ supplier ⋈ nation, then
    2-key agg over a +/- expression) is what Q9 exercises. The p_name LIKE
    filter lands on the broadcast side BEFORE the join, so the fact join
    only sees matching parts (semi-reduction)."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "part", "supplier", "nation")}
    parts = t["part"].filter(F.col("p_name").like("%widget%"))
    joined = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    margin = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(exact_sum(margin, 6).alias("margin"))


@query(
    "important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS vdec
      FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT sum(vdec) AS total FROM pv)
    SELECT l_partkey, CAST(vdec AS DOUBLE) AS value
    FROM pv, tot WHERE vdec * 2000 > total
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp in the testdata): parts whose revenue
    exceeds 0.05% of total — grouped aggregate compared against a global
    scalar-subquery threshold. The share predicate is evaluated in exact
    decimals as ``value*2000 > total`` (0.0005 == 1/2000), so no
    floating-point boundary row can differ between engines. The global total
    re-aggregates the tiny per-part frame — no second fact scan — and joins
    back as a broadcast literal (one row)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    pv = li.groupBy("l_partkey").agg(F.sum(rev).alias("vdec"))
    tot = pv.agg(F.sum("vdec").alias("total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("vdec") * 2000 > F.col("total"))
        .select("l_partkey", F.col("vdec").cast("double").alias("value"))
    )


@query(
    "top_supplier",
    oracle="""
    WITH sr AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rdec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(sr.rdec AS DOUBLE) AS total_revenue
    FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
    WHERE sr.rdec = (SELECT max(rdec) FROM sr)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier for a quarter): grouped revenue, global max
    via scalar subquery, equality join-back keeping ties. The max and the
    equality comparison both run on the exact decimal sum — a tie or a
    last-ulp difference cannot flip the winner between engines. The quarter
    filter pushes to the parquet scan; supplier joins as a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    sr = li.groupBy("l_suppkey").agg(F.sum(rev).alias("rdec"))
    mx = sr.agg(F.max("rdec").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sr.crossJoin(F.broadcast(mx))
        .filter(F.col("rdec") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rdec").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Round 2 extensions: PII scrub, fuzzy-key dedup, compressed-vector search,
# skew-salted join
# ---------------------------------------------------------------------------

_PII_SUFFIX = (
    " contact u{id}@mail.example.com or 12-345-678-{id4} "
    "ssn 123-45-6789 host 10.0.{oct}.7"
)


@query(
    "pii_redacted_docs",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or 12-345-678-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ssn 123-45-6789 host 10.0.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
               '\\b\\d{2,3}-\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS redacted,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS INT) AS n_ssn
    FROM aug
    """,
)
def q_pii_redacted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (ops/text.redact_pii): email / SSN / phone / IPv4 →
    typed tokens, plus per-kind hit counts — the standard pre-training
    redaction stage. The testdata corpus carries no organic PII, so each doc
    is deterministically augmented with synthetic contact strings (same
    construction in the oracle); redaction itself is a map-only
    regexp_replace chain — zero shuffle at any scale."""
    from fxspark.ops.text import pii_counts, redact_pii

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 12-345-678-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789 host 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    aug = docs.select("doc_id", t.alias("t"))
    counts = pii_counts(F.col("t"))
    return aug.select(
        "doc_id",
        redact_pii(F.col("t")).alias("redacted"),
        counts["EMAIL"].alias("n_email"),
        counts["SSN"].alias("n_ssn"),
    )


@query(
    "key_edit_near_dup",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS id, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS k
      FROM customer
      UNION ALL
      SELECT c_custkey + 10000000,
             substr(md5(CAST(c_custkey AS VARCHAR)), 1, 11) || 'x'
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.k, b.k) AS dist
    FROM dirty a JOIN dirty b ON a.id < b.id
    WHERE levenshtein(a.k, b.k) <= 1
    """,
)
def q_key_edit_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-key dedup via the SymSpell deletion-neighborhood join
    (ops/dedup.edit_distance_pairs): every pair of keys within Levenshtein
    distance 1, with NO all-pairs comparison — candidates come from an
    equi-join on hashed single-deletion variants, then exact verify. The
    corpus is the customer keyspace (12-hex-char content hashes) plus a 10%
    sample re-injected with one-character typos — the record-linkage shape
    (dirty IDs → canonical IDs). The DuckDB oracle brute-forces all pairs;
    same result, quadratic plan — the differential proves the linear-cost
    candidate generation is lossless.

    Precondition: ``c_custkey`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — duplicated custkeys
    would alias distinct entities onto one dirty id; sf_dups boundary)."""
    from fxspark.ops.dedup import edit_distance_pairs

    cust = require_unique(
        load_table(spark, sf_dir, "customer"), "c_custkey",
        context="key_edit_near_dup",
    )
    k = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 12)
    clean = cust.select(F.col("c_custkey").alias("id"), k.alias("k"))
    typo = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            (F.col("c_custkey") + 10000000).alias("id"),
            F.concat(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 11),
                F.lit("x"),
            ).alias("k"),
        )
    )
    dirty = spread(clean.unionByName(typo))
    return edit_distance_pairs(dirty, "id", "k", max_dist=1)


def _rp_planes8() -> list[list[float]]:
    return _lsh_planes(n_planes=8, dim=64, seed=21)  # same dyadic-grid generator


def _quantized_topk_oracle() -> str:
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_apply({_dbl('embedding')},
                        x -> greatest(-127, least(127, round(x * 127)))/ 127.0) AS dq
      FROM embeddings
    ), probe AS (SELECT dq AS qv FROM q WHERE vec_id = 0)
    SELECT vec_id, round({_COS_SQL.format(a='dq', b='qv')}, 6) AS cos
    FROM q, probe WHERE vec_id <> 0
    ORDER BY cos DESC, vec_id LIMIT 10
    """


@query("embedding_quantized_topk", oracle=_quantized_topk_oracle())
def q_embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of vec 0 over int8-QUANTIZED vectors
    (ops/similarity.quantize_vec): the 4×-smaller representation a
    billion-vector corpus actually scans. Quantize → dequantize → exact
    cosine, deterministic ties broken by vec_id. The oracle replays the
    same round/clamp arithmetic, so the differential covers the
    quantization error path, not just the happy case."""
    from fxspark.ops.similarity import cosine, dequantize_vec, quantize_vec

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    dq = emb.select(
        "vec_id", dequantize_vec(quantize_vec(F.col("embedding"))).alias("dq")
    )
    probe = dq.filter(F.col("vec_id") == 0).select(F.col("dq").alias("qv"))
    return (
        dq.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", F.round(cosine(F.col("dq"), F.col("qv")), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
    )


def _rp_search_oracle() -> str:
    planes = _rp_planes8()
    proj = ("[" + ", ".join(
        f"list_sum(list_apply(list_zip(emb, {p!r}), t -> t[1]*t[2]))" for p in planes
    ) + "]")
    return f"""
    WITH e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings),
         p AS (SELECT vec_id, emb, {proj} AS pv FROM e),
         probe AS (SELECT emb AS qe, pv AS qp FROM p WHERE vec_id = 0),
         short AS (
           SELECT vec_id, emb,
                  {_COS_SQL.format(a='pv', b='qp')} AS pcos
           FROM p, probe WHERE vec_id <> 0
           ORDER BY pcos DESC, vec_id LIMIT 30
         )
    SELECT s.vec_id, round({_COS_SQL.format(a='s.emb', b='probe.qe')}, 6) AS cos
    FROM short s, probe
    ORDER BY cos DESC, s.vec_id LIMIT 10
    """


@query("embedding_rp_search", oracle=_rp_search_oracle())
def q_embedding_rp_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain ANN: project 64-dim vectors to 8 dims with fixed
    random hyperplanes (ops/similarity.rp_project, Johnson-Lindenstrauss),
    shortlist the top-30 by projected cosine, then exact re-score the
    shortlist and return the top-10. The scan ranks 8 doubles per vector
    instead of 64 floats; only 30 full vectors are touched — the
    standard two-stage retrieval shape. Dyadic-grid planes make the
    projection bit-identical in both engines.

    Precondition: ``vec_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — sf_dups boundary)."""
    from fxspark.ops.similarity import cosine, rp_project

    planes = _rp_planes8()
    emb = require_unique(
        spread(load_table(spark, sf_dir, "embeddings")), "vec_id",
        context="embedding_rp_search",
    )
    p = emb.select("vec_id", "embedding", rp_project(F.col("embedding"), planes).alias("pv"))
    probe = p.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("pv").alias("qp")
    )
    short = (
        p.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", "embedding", "qe", cosine(F.col("pv"), F.col("qp")).alias("pcos"))
        .orderBy(F.col("pcos").desc(), "vec_id")
        .limit(30)
    )
    return (
        short.select("vec_id", F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
    )


@query(
    "salted_priority_revenue",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_salted_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through a SALTED fact-fact join
    (ops/joins.salted_join): the lineitem side carries a uniform salt, the
    orders side is replicated salt×, and the join key becomes
    (orderkey, salt) — the manual skew-survival path for when one orderkey
    is hot and AQE's runtime split isn't available (custom shuffles,
    streaming joins). Result is row-identical to the plain join, which is
    exactly what the oracle differential proves."""
    from fxspark.ops.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", salt=8)
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Round-2 additions: training-data curation ops (quality gate, contamination,
# balanced sampling, tf-idf, per-source audit), k-means assignment, built-in
# session windows, grouping sets, ranking-function family, TPC-H Q12/Q20
# shapes.
# ---------------------------------------------------------------------------

_QUALITY_SQL = f"""(floor((least(length(text)/500.0, 1.0)
                 + coalesce(len(list_filter(string_split(lower(trim(text)), ' '),
                                t -> list_contains({_STOP_SQL}, t)))
                            / CAST(nullif(len(string_split(lower(trim(text)), ' ')), 0)
                                   AS DOUBLE), 0.0)
                 - coalesce(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                            / CAST(nullif(length(text), 0) AS DOUBLE), 0.0))
                 * 10000.0 + 0.5) / 10000.0)"""


@query(
    "doc_quality_gate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS word_count,
             round(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                   / len(t), 4) AS mean_word_len,
             round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
               AS dup_token_frac
      FROM toks
    ), tg AS (
      SELECT doc_id,
             unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS g
      FROM toks WHERE len(t) >= 3
    ), rep AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_trigram_frac
      FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g)
      GROUP BY doc_id
    )
    SELECT b.doc_id, b.word_count, b.mean_word_len, b.dup_token_frac,
           coalesce(r.top_trigram_frac, 0.0) AS top_trigram_frac,
           (b.word_count >= 30 AND b.mean_word_len BETWEEN 3 AND 10
            AND b.dup_token_frac < 0.6
            AND coalesce(r.top_trigram_frac, 0.0) < 0.05) AS passes
    FROM base b LEFT JOIN rep r USING (doc_id)
    """,
)
def q_doc_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate: per-document repetition/shape signals
    (word count, mean word length, repeated-token fraction, most-common-
    trigram share) and a declared pass/fail over fixed thresholds — the
    filter stage of a pre-training pipeline. Everything except the trigram
    profile is a map-side expression; the profile is one explode + two
    partial-combine aggregations keyed by (doc, gram) — near-unique keys,
    no skew at any corpus size."""
    from fxspark.ops.text import (
        dup_token_frac, mean_word_len, tokens, top_ngram_stats,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("word_count"),
        F.round(mean_word_len(F.col("text")), 4).alias("mean_word_len"),
        F.round(dup_token_frac(F.col("text")), 6).alias("dup_token_frac"),
    )
    rep = top_ngram_stats(docs, "doc_id", "text", n=3).select(
        "doc_id",
        F.round(
            F.col("top_ngram_count").cast("double") / F.col("total_ngrams"), 6
        ).alias("top_trigram_frac"),
    )
    j = base.join(rep, "doc_id", "left").withColumn(
        "top_trigram_frac", F.coalesce(F.col("top_trigram_frac"), F.lit(0.0))
    )
    passes = (
        (F.col("word_count") >= 30)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("dup_token_frac") < 0.6)
        & (F.col("top_trigram_frac") < 0.05)
    )
    return j.select(
        "doc_id", "word_count", "mean_word_len", "dup_token_frac",
        "top_trigram_frac", passes.alias("passes"),
    )


@query(
    "benchmark_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+3], ' ')
                            for i in range(1, len(t)-2)]) AS s
      FROM toks WHERE len(t) >= 4
    ), bench AS (
      SELECT doc_id AS bid, unnest(s) AS g FROM sh WHERE doc_id % 11 = 0
    ), train AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 11 <> 0
    )
    SELECT t.doc_id,
           CAST(count(DISTINCT t.g) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT b.bid) AS BIGINT) AS n_bench_docs
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id
    """,
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination sweep (ops/dedup.ngram_overlap): training
    docs sharing any token 4-gram with the held-out benchmark slice
    (doc_id % 11 == 0 plays the eval set), with shared-gram / benchmark-doc
    counts. The benchmark gram index is broadcast — the corpus side never
    shuffles, so the sweep is one map-side join + one near-unique-key
    aggregation regardless of corpus size."""
    from fxspark.ops.dedup import ngram_overlap

    docs = spread(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    train = docs.filter(F.col("doc_id") % 11 != 0)
    return ngram_overlap(train, bench, "doc_id", "text", n=4)


@query(
    "doc_balanced_sample",
    oracle="""
    WITH hashable AS (
      -- class-11 discipline: NULL text has no content hash — textless
      -- docs are quarantined from hash sampling (else D8 placement of the
      -- NULL md5 reorders every language's ranks cross-engine)
      SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
      FROM hashable
    ), target AS (
      SELECT min(c) AS m FROM (SELECT count(*) AS c FROM hashable GROUP BY lang)
    )
    SELECT doc_id, lang, rk FROM ranked, target WHERE rk <= m
    """,
)
def q_doc_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced corpus sample: every language contributes exactly
    min-language-count documents, chosen by content hash (md5 — deterministic
    across runs, partitionings, and engines; doc_id tie-break). This is the
    up/down-sampling step for balancing a multilingual pre-training mix.
    The per-language window ranks shuffle only on lang (bounded cardinality);
    the global min is a one-row broadcast."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    # class-11: NULL text has no content hash — quarantined from the
    # sample (both the ranks and the per-language floor), like every
    # other hash-sampling/split query; no-op on driver data
    docs = docs.filter(F.col("text").isNotNull())
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("text").cast("binary")), "doc_id"
    )
    ranked = docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
    target = (
        docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("m"))
    )
    return ranked.crossJoin(F.broadcast(target)).filter(
        F.col("rk") <= F.col("m")
    ).select("doc_id", "lang", "rk")


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), tf AS (
      SELECT doc_id, g AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS g FROM toks) GROUP BY doc_id, g
    ), idf AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / idf.df), 6) AS tfidf
      FROM tf JOIN idf USING (term), n
    )
    SELECT doc_id, term, tfidf, rk FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword/topic signal
    (and the vectorizer base for sparse retrieval). Term frequencies and
    document frequencies are two partial-combine aggregations; the doc-count
    scalar is broadcast; ranking shuffles on doc_id only. The idf join keys
    on term — Zipf-skewed, but the per-term df frame is one row per distinct
    term, so AQE's broadcast promotion keeps the hot terms off a shuffle."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(idf, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


@query(
    "source_curation_stats",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           count(*) - CAST(count(DISTINCT md5(lower(trim(text))))
                           AS BIGINT) AS n_exact_dups,
           -- RAW quotient (exact-decimal sum / exact count): bit-identical
           -- on both engines, while ROUND(double, 6) splits on 1e-6
           -- halves — which means of 4-dp-grained qualities hit (D22)
           CAST(sum(CAST({_QUALITY_SQL} AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS avg_quality
    FROM documents GROUP BY source
    """,
)
def q_source_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus audit: volume, language spread, exact-duplicate
    count (fingerprint collisions within the source), and mean quality score
    — the dashboard a curation team watches per crawl/domain. One hash-agg
    on source (bounded cardinality); the duplicate count rides the same
    shuffle as a distinct-aggregate."""
    from fxspark.ops.text import fingerprint, quality_score

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct(fingerprint(F.col("text"))))
        .alias("n_exact_dups"),
        # raw quotient — see the oracle's D22 note
        (
            F.sum(quality_score(F.col("text")).cast("decimal(18,4)"))
            .cast("double") / F.count(F.lit(1))
        ).alias("avg_quality"),
    )


@query(
    "embedding_cluster_assign",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings),
         c AS (SELECT vec_id AS cid, emb AS cv FROM e WHERE vec_id < 8),
         scored AS (
           SELECT e.vec_id, c.cid, {_COS_SQL.format(a='e.emb', b='c.cv')} AS cos
           FROM e, c
         ),
         best AS (
           SELECT vec_id, cid, cos FROM (
             SELECT vec_id, cid, cos,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cos DESC, cid) AS rk
             FROM scored
           ) WHERE rk = 1
         )
    SELECT cid, count(*) AS n_vecs,
           round(CAST(sum(CAST(round(cos, 9) AS DECIMAL(20,10))) AS DOUBLE)
                 / count(*), 6) AS avg_cos
    FROM best GROUP BY cid
    """,
)
def q_embedding_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means / IVF-training assignment step (ops/similarity.centroid_assign):
    every vector goes to its max-cosine centroid (vec_id < 8 plays the
    centroid set), then per-cluster population and mean cosine. Centroids are
    broadcast — the corpus never shuffles to score; the mean is summed in
    exact decimal so the result is partitioning-independent."""
    from fxspark.ops.similarity import centroid_assign

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    assigned = centroid_assign(emb, cents, cid_col="cid")
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.round(F.col("cos"), 9).cast("decimal(20,10)"))
            .cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_cos"),
    )


@query(
    "session_window_stats",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      -- an event without event time has no session window: Spark's
      -- session_window operator drops NULL-ts rows (a watermarked stream
      -- could never admit them); the oracle states the same contract.
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM g GROUP BY user_id, sid
    """,
)
def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's BUILT-IN ``session_window`` (30-min gap):
    per (user, session) event count and exact value sum. Complements
    session_stats (which derives sessions with the explicit lag/cumsum
    gaps-and-islands plan): same semantics, one hash-agg with a dynamic
    merging window — the operator Structured Streaming reuses for stateful
    session aggregation. The oracle replays gaps-and-islands in SQL; an
    event exactly at the 30-min boundary CONTINUES the session (verified
    against the built-in operator's merge rule — gap comparison is
    inclusive)."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value"), 6).alias("total_value"),
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        "n_events", "total_value",
    )


@query(
    "customer_decile_bands",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    ),
    nn AS (SELECT spend FROM spend WHERE spend IS NOT NULL),
    st AS (SELECT count(*) AS c FROM nn),
    r AS (SELECT spend, row_number() OVER (ORDER BY spend) AS rn FROM nn),
    b AS (
      SELECT r.spend AS bv
      FROM r JOIN (SELECT i, (c * i + 9) // 10 AS k
                   FROM st, (SELECT unnest(range(1, 10)) AS i)) t
        ON r.rn = t.k
    )
    SELECT o_custkey, spend, decile FROM (
      SELECT s.o_custkey, s.spend,
             CASE WHEN s.spend IS NULL THEN NULL
                  ELSE CAST(10 - (SELECT count(*) FROM b WHERE b.bv < s.spend)
                       AS INTEGER) END AS decile
      FROM spend s
    ) WHERE decile IN (1, 10)
    """,
)
def q_customer_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers bucketed into spend deciles (1 = top spenders), keeping the
    top and bottom bands — binned by ``ops/quantile.quantile_bins``, the
    scale form this query's previous global-ntile docstring promised: exact
    rank boundaries via coarse-histogram localization, broadcast, map-side
    binning, no unpartitioned window anywhere in the plan. Declared tie
    semantics: equal spends share a decile (value-deterministic)."""
    from fxspark.ops.quantile import quantile_bins

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        exact_sum(F.col("o_totalprice"), 4).alias("spend")
    ).localCheckpoint(eager=False)
    binned = quantile_bins(spend, "spend", 10, "decile", descending=True)
    return binned.select("o_custkey", "spend", "decile").filter(
        F.col("decile").isin(1, 10)
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    HAVING count(*) > 0
    """,
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup/cube, already
    covered by sales_rollup / segment_priority_cube) through the DataFrame
    ``groupingSets`` API, with the grouping-id bitmask distinguishing
    aggregation levels. One expand + hash-agg pass — Spark expands the sets
    map-side so the shuffle still partial-combines. The ``n_items > 0``
    filter is the D12 empty-input discipline (see q_daily_rollup) — a
    no-op on any non-empty input."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            exact_sum(F.col("l_extendedprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") > 0)
    )


@query(
    "late_lines_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_linestatus
    """,
)
def q_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipped lines split into high/low order
    priority via conditional aggregation after a fact-fact join. Orders
    projects two columns before the shuffle; the late filter applies at the
    join so only qualifying lines aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "part_promo_suppliers",
    oracle="""
    WITH qty AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sq
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS tq
      FROM lineitem GROUP BY l_partkey
    ), dominant AS (
      SELECT DISTINCT q.l_suppkey
      FROM qty q
      JOIN tot t USING (l_partkey)
      JOIN part p ON p.p_partkey = q.l_partkey
      WHERE q.sq > 0.15 * t.tq AND p.p_brand = 'Brand#1'
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN dominant d ON s.s_suppkey = d.l_suppkey
    """,
)
def q_part_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate supply (>15% of shipped
    quantity) of any Brand#1 part — nested aggregate vs aggregate compare,
    then a semi join into the dimension. The per-part total RE-AGGREGATES
    the per-(part, supplier) decimal sums (associative, so bit-identical to
    a direct sum) — lineitem is scanned and shuffled ONCE, and the second
    aggregation reduces rows that are already one-per-(part, supplier).
    The part filter broadcasts; supplier join is a broadcast semi join
    (supplier ≪ lineitem at every scale factor)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    # Materialize the shared aggregate once: Catalyst does not canonicalize
    # the two consumers to a ReusedExchange (verified on the executed AQE
    # plan), so without this lineitem is scanned and aggregated twice. The
    # checkpointed frame is one row per (part, supplier) — tiny relative to
    # the fact table at any scale.
    qty_dec = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,4)")).alias("_sqd")
    ).localCheckpoint()
    qty = qty_dec.select(
        "l_partkey", "l_suppkey", F.col("_sqd").cast("double").alias("sq")
    )
    tot = qty_dec.groupBy("l_partkey").agg(
        F.sum("_sqd").cast("double").alias("tq")
    )
    dominant = (
        qty.join(tot, "l_partkey")
        .join(F.broadcast(part), qty["l_partkey"] == part["p_partkey"])
        .filter(F.col("sq") > 0.15 * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        dominant, supp["s_suppkey"] == dominant["l_suppkey"], "semi"
    ).select("s_suppkey", "s_name")


@query(
    "doc_token_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), starts AS (
      SELECT doc_id, t, unnest([x for x in range(1, len(t)+1, 16)]) AS s
      FROM toks
    ), chunks AS (
      SELECT doc_id, (s-1)//16 AS chunk_idx,
             array_to_string(t[s:s+31], ' ') AS c,
             len(t[s:s+31]) AS n_tokens
      FROM starts
    )
    SELECT doc_id, chunk_idx, n_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(c[i]) AS BIGINT) for i in range(1, len(c)+1)]),
             (acc, ch) -> (acc * 131 + ch) % 1000000007) AS chunk_fp
    FROM chunks WHERE n_tokens >= 8
    """,
)
def q_doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing (ops/text.chunk_tokens): overlapping 32-token
    windows every 16 tokens per document, short tails dropped, each chunk
    identified by its rolling-hash fingerprint. Map-side only — sequence →
    posexplode → slice never shuffles, so chunking 100 TB is embarrassingly
    parallel; the fingerprint keeps the differential exact without hashing
    engine-specific strings."""
    from fxspark.ops.text import chunk_tokens, rolling_fingerprint

    docs = spread(load_table(spark, sf_dir, "documents"))
    chunks = chunk_tokens(docs, "doc_id", "text", size=32, stride=16, min_tokens=8)
    return chunks.select(
        "doc_id", "chunk_idx", "n_tokens",
        rolling_fingerprint(F.col("chunk_text")).alias("chunk_fp"),
    )


@query(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(json_extract_string(props, '$.k')) AS k_cnt
    FROM events GROUP BY event_type
    """,
)
def q_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT column (Spark 4): ``parse_json`` once into the
    binary variant encoding, then typed ``try_variant_get`` extractions feed
    a grouped aggregate. Versus ``from_json`` + a declared struct
    (json_props_extract), variant defers the schema to read time — the
    shredded binary scans faster than re-parsing JSON text per access, the
    right trade for schema-drifting event properties at scale. Integer sums
    stay in bigint (exact)."""
    events = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.min("_k").alias("k_min"),
            F.max("_k").alias("k_max"),
            F.sum("_k").alias("k_sum"),
            F.count("_k").alias("k_cnt"),
        )
    )


@query(
    "lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o
    WHERE c.c_custkey < 300
    """,
)
def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the DataFrame ``lateralJoin`` API
    (Spark 4): each customer's top-2 orders by price. Catalyst decorrelates
    the per-row limit into a ranked join (no per-customer re-execution) —
    the same plan the window form would give, declared in the SQL-standard
    lateral shape. The driver differential runs DuckDB's LATERAL for the
    oracle."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 300
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    top2 = (
        orders.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(2)
        .select("o_orderkey", "o_totalprice")
    )
    return cust.lateralJoin(top2)


@query(
    "order_month_spine",
    oracle="""
    WITH RECURSIVE yr(y) AS (
      SELECT date_trunc('year', (SELECT min(o_orderdate) FROM orders)) AS y
      UNION ALL
      SELECT y + INTERVAL 1 YEAR FROM yr
      WHERE y < date_trunc('year', (SELECT max(o_orderdate) FROM orders))
    ), spine AS (
      SELECT yr.y + INTERVAL 1 MONTH * t.mo AS m
      FROM yr, (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11)) AS t(mo)
    ), monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT s.m AS month_start,
           coalesce(mo.n_orders, 0) AS n_orders,
           coalesce(mo.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN monthly mo ON mo.m = s.m
    WHERE s.m BETWEEN date_trunc('month', (SELECT min(o_orderdate) FROM orders))
                  AND date_trunc('month', (SELECT max(o_orderdate) FROM orders))
    """,
)
def q_order_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine via RECURSIVE CTE on the raw Spark SQL surface
    (Spark 4 WITH RECURSIVE): materialize every month between the first and
    last order date — including empty ones, which a plain GROUP BY can never
    emit — then left-join monthly order stats. The recursion steps by YEAR
    (a handful of iterations) and a static VALUES list expands months:
    recursive iterations are the expensive axis (each is a plan execution —
    the month-per-row form measured 80 iterations / 14 s at sf0.1, this
    shape ~7 / well under a second). Both engines run the identical
    statement, so the differential covers the recursive execution itself."""
    from fxspark.session import register_views

    register_views(spark, sf_dir)
    # Bound the recursion with precomputed literals: the termination
    # predicate is evaluated INSIDE every iteration's plan, so leaving the
    # min/max scalar subqueries in place re-scans orders ~2x per step
    # (measured 3.6 s at sf0.1; with literals the whole spine is sub-second
    # driver-side work). One tiny agg up front instead.
    b = spark.sql(
        "SELECT date_trunc('year', min(o_orderdate)) AS y0, "
        "date_trunc('year', max(o_orderdate)) AS y1, "
        "date_trunc('month', min(o_orderdate)) AS m0, "
        "date_trunc('month', max(o_orderdate)) AS m1 FROM orders"
    ).first()
    if b["y0"] is None:
        # EMPTY orders: there is no spine to generate. The oracle agrees —
        # its recursive seed is NULL, so the final BETWEEN NULL AND NULL
        # filters every spine row (round-14 sf_empty registry sweep; the
        # .strftime below crashed on the NULL min/max before this guard).
        return spark.createDataFrame(
            [], "month_start timestamp, n_orders bigint, revenue double"
        )
    lit = {k: b[k].strftime("%Y-%m-%d %H:%M:%S") for k in ("y0", "y1", "m0", "m1")}
    return spark.sql(f"""
    WITH RECURSIVE yr(y) AS (
      SELECT TIMESTAMP '{lit["y0"]}' AS y
      UNION ALL
      SELECT y + INTERVAL 1 YEAR FROM yr
      WHERE y < TIMESTAMP '{lit["y1"]}'
    ), spine AS (
      SELECT yr.y + INTERVAL 1 MONTH * t.mo AS m
      FROM yr, (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11)) AS t(mo)
    ), monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT s.m AS month_start,
           coalesce(mo.n_orders, 0) AS n_orders,
           coalesce(mo.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN monthly mo ON mo.m = s.m
    WHERE s.m BETWEEN TIMESTAMP '{lit["m0"]}' AND TIMESTAMP '{lit["m1"]}'
    """)


@query(
    "user_value_locf",
    oracle="""
    -- event-time contract: NULL-ts rows are unplaceable on the fill
    -- timeline (engines disagree on where they sort) and are excluded
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM events WHERE ts IS NOT NULL
    """,
)
def q_user_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill / LOCF (last observation carried forward): every event
    carries the user's most recent purchase value — the standard time-series
    gap-fill, here via ``last(..., ignorenulls=True)`` over a running frame.
    One shuffle on user_id; the running frame is a streaming-friendly
    single-pass window (no second sort). Values are carried, not computed,
    so the differential is bit-exact by construction."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # event-time contract — see oracle note
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return events.select(
        "event_id", "user_id", "ts",
        F.last(pv, ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "user_event_type_profile",
    oracle="""
    -- coalesce to '': both engines' distinct-collects skip NULL types,
    -- but an all-NULL user renders '' via Spark's array_join where
    -- DuckDB's list() over zero non-NULLs is NULL.
    SELECT user_id,
           coalesce(array_to_string(list_sort(list(DISTINCT event_type)),
                                    ','), '') AS type_profile,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def q_user_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregate with pinned determinism: the per-user distinct
    event-type set as a SORTED joined string (collect_set order is
    partitioning-dependent — array_sort makes the result plan-independent,
    the discipline every collect_* use needs to survive the differential
    and any cluster re-run). One partial-combine shuffle on user_id."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",")
        .alias("type_profile"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "doc_unigram_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
      FROM documents
    ), freq AS (
      SELECT w, count(*) AS c FROM toks GROUP BY w
    ), total AS (SELECT count(*) AS n FROM toks),
    scored AS (
      SELECT t.doc_id,
             CAST(round(-ln(CAST(f.c AS DOUBLE) / total.n), 9)
                  AS DECIMAL(20,10)) AS s
      FROM toks t JOIN freq f USING (w), total
    )
    SELECT doc_id,
           round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS mean_surprisal,
           count(*) AS n_tokens
    FROM scored GROUP BY doc_id
    """,
)
def q_doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal: mean unigram surprisal
    (−ln p(token) under the corpus unigram distribution) per document — low
    means formulaic/repetitive text, high means rare-token soup; the cheap
    statistical cousin of model-based perplexity filters. The token
    frequency table is one partial-combine agg and joins back broadcast-
    promoted (distinct-token cardinality ≪ corpus); per-token surprisals
    are rounded then summed in exact decimal so the mean is
    partitioning-independent."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    s = F.round(-F.log(F.col("c").cast("double") / F.col("n")), 9).cast(
        "decimal(20,10)"
    )
    return (
        toks.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .select("doc_id", s.alias("_s"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_s").cast("double") / F.count(F.lit(1)), 6)
            .alias("mean_surprisal"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


@query(
    "media_resized_meta",
    oracle="""
    -- NULL-text -> NULL payload -> 'empty'/-1, as in media_meta
    SELECT doc_id AS media_id, 'image' AS media_type,
           CASE WHEN doc_id % 2 = 0 THEN octet_length(encode(text)) + 24
                ELSE octet_length(encode(text)) END AS n_bytes,
           CASE WHEN text IS NULL THEN 'empty'
                WHEN doc_id % 2 = 0 THEN 'png' ELSE 'unknown' END AS format,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN 96 ELSE -1 END AS width,
           CASE WHEN text IS NOT NULL AND doc_id % 2 = 0
                THEN 72 ELSE -1 END AS height
    FROM documents
    """,
)
def q_media_resized_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal transform chain: resize (header byte surgery — the STUB
    half of a codec resize, multimodal.resize_image, genuinely a payload
    transform so it keeps its mapInPandas stage) → metadata re-decode as
    JVM expressions fused into the SAME stage (no second Python worker, no
    shuffle); PNG payloads re-read as 96×72, non-PNG pass through
    untouched. The oracle restates the declared byte-level contract."""
    from fxspark.multimodal import decode_image_meta_expr, resize_image

    return decode_image_meta_expr(
        resize_image(_doc_media(spark, sf_dir), width=96, height=72)
    )


@query(
    "customer_bag_set_ops",
    oracle="""
    WITH cur AS (SELECT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
         prev AS (SELECT o_custkey FROM orders
                  WHERE o_orderdate < TIMESTAMP '1997-01-01')
    SELECT o_custkey, 'only_recent_excess' AS bucket, count(*) AS n
    FROM (SELECT * FROM cur EXCEPT ALL SELECT * FROM prev) GROUP BY o_custkey
    UNION ALL
    SELECT o_custkey, 'common_min' AS bucket, count(*) AS n
    FROM (SELECT * FROM cur INTERSECT ALL SELECT * FROM prev) GROUP BY o_custkey
    """,
)
def q_customer_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (EXCEPT ALL / INTERSECT ALL) — the
    multiplicity-preserving twins of customer_set_ops: per customer, how
    many excess recent orders beyond their pre-1997 count, and the
    overlapping multiplicity. Spark plans both as counted hash joins (no
    row-by-row dedup); one shuffle each on the grouping key."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    cur = orders.filter(F.col("o_orderdate") >= cutoff).select("o_custkey")
    prev = orders.filter(F.col("o_orderdate") < cutoff).select("o_custkey")
    excess = (
        cur.exceptAll(prev).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("o_custkey", F.lit("only_recent_excess").alias("bucket"), "n")
    )
    common = (
        cur.intersectAll(prev).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("o_custkey", F.lit("common_min").alias("bucket"), "n")
    )
    return excess.unionByName(common)


@query(
    "nullsafe_event_match",
    oracle="""
    WITH a AS (
      SELECT event_id, user_id,
             CASE WHEN value < 10 THEN NULL
                  ELSE CAST(floor(value / 100) AS BIGINT) END AS band
      FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT CASE WHEN value < 10 THEN NULL
                  ELSE CAST(floor(value / 100) AS BIGINT) END AS band,
             count(*) AS n_clicks
      FROM events WHERE event_type = 'click'
      GROUP BY 1
    )
    SELECT a.event_id, a.user_id, a.band, b.n_clicks
    FROM a JOIN b ON a.band IS NOT DISTINCT FROM b.band
    """,
)
def q_nullsafe_event_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (``<=>`` / IS NOT DISTINCT FROM): purchase
    events matched to the click-count of their value band, where the
    below-threshold band is NULL and NULL must MATCH NULL (a plain equi-join
    silently drops those rows — the classic nullable-dimension-key bug).
    The aggregated band frame is tiny and broadcasts."""
    events = load_table(spark, sf_dir, "events")
    band = F.when(F.col("value") < 10, F.lit(None).cast("long")).otherwise(
        F.floor(F.col("value") / 100).cast("long")
    )
    a = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", band.alias("band")
    )
    b = (
        events.filter(F.col("event_type") == "click")
        .select(band.alias("b_band"))
        .groupBy("b_band")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    return (
        a.join(F.broadcast(b), a["band"].eqNullSafe(b["b_band"]))
        .select("event_id", "user_id", "band", "n_clicks")
    )


@query(
    "curated_training_set",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS t
      FROM documents
    ), base AS (
      SELECT doc_id, text, t, len(t) AS wc,
             CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
               / len(t) AS mwl,
             1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dtf,
             md5(lower(trim(text))) AS fp
      FROM toks WHERE doc_id % 11 <> 0
    ), tg AS (
      SELECT doc_id,
             unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS g
      FROM toks WHERE len(t) >= 3
    ), rep AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS ttf
      FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g)
      GROUP BY doc_id
    ), gated AS (
      SELECT b.* FROM base b LEFT JOIN rep r USING (doc_id)
      WHERE b.wc >= 30 AND b.mwl BETWEEN 3 AND 10 AND b.dtf < 0.6
        AND coalesce(r.ttf, 0.0) < 0.05
    ), kept AS (
      SELECT * FROM (
        SELECT g.*, min(doc_id) OVER (PARTITION BY fp) AS min_id FROM gated g
      ) WHERE doc_id = min_id
    ), bsh AS (
      SELECT DISTINCT unnest(list_distinct(
               [array_to_string(t[i:i+3], ' ') for i in range(1, len(t)-2)])) AS g
      FROM toks WHERE doc_id % 11 = 0 AND len(t) >= 4
    ), contaminated AS (
      SELECT DISTINCT k.doc_id
      FROM (SELECT doc_id, unnest(list_distinct(
              [array_to_string(t[i:i+3], ' ') for i in range(1, len(t)-2)])) AS g
            FROM kept WHERE len(t) >= 4) k
      JOIN bsh USING (g)
    ), clean AS (
      SELECT doc_id, t FROM kept
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), starts AS (
      SELECT doc_id, t, unnest([x for x in range(1, len(t)+1, 16)]) AS s
      FROM clean
    ), chunks AS (
      SELECT doc_id, (s-1)//16 AS chunk_idx,
             array_to_string(t[s:s+31], ' ') AS c,
             len(t[s:s+31]) AS n_tokens
      FROM starts
    )
    SELECT doc_id, chunk_idx, n_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(c[i]) AS BIGINT) for i in range(1, len(c)+1)]),
             (acc, ch) -> (acc * 131 + ch) % 1000000007) AS chunk_fp
    FROM chunks WHERE n_tokens >= 8
    """,
)
def q_curated_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end training-data pipeline in one composed plan
    (ops/pipeline.curate_corpus): quality gate → exact-dedup canonical keep
    (window-min on fingerprint — no corpus-sized broadcast) → eval-set
    decontamination (benchmark = doc_id % 11 == 0, broadcast gram index) →
    32/16 token chunking, emitting fingerprinted training chunks. Every
    stage is an independently-tested operator; the DuckDB oracle replays
    the full five-stage ladder, so the differential certifies the composed
    semantics, not just the parts."""
    from fxspark.ops.pipeline import curate_corpus
    from fxspark.ops.text import rolling_fingerprint

    docs = spread(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    train = docs.filter(F.col("doc_id") % 11 != 0)
    chunks = curate_corpus(train, bench)
    return chunks.select(
        "doc_id", "chunk_idx", "n_tokens",
        rolling_fingerprint(F.col("chunk_text")).alias("chunk_fp"),
    )


@query(
    "hourly_ohlc_bars",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS bar_hour, ts, event_id,
             value
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
    ), r AS (
      SELECT user_id, bar_hour, value,
             row_number() OVER (PARTITION BY user_id, bar_hour
                                ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY user_id, bar_hour
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM obs
    )
    SELECT user_id, bar_hour,
           max(CASE WHEN ra = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rd = 1 THEN value END) AS close,
           count(*) AS n_ticks
    FROM r GROUP BY user_id, bar_hour
    """,
)
def q_hourly_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the canonical rates rollup the reference's FX
    analysts consume (its minutely table IS tick data,
    ``/root/reference/Fx_1min.py:29-40``): per (user, hour) first/max/min/
    last value by event time. min_by/max_by aggregates, no window sort —
    ONE partial/final hash-agg shuffle; open/close are carried values
    (bit-exact), high/low are exact comparisons.

    Tie discipline (D5): open/close argmax over ``struct(ts, event_id)``
    — the unique-key suffix TOTALIZES the event-time order, mirrored by
    the oracle's ``row_number`` spelling (the ``stream_cusum_replay``
    pattern). The previous bare ``min_by(value, ts)`` leaned on the
    driver data's microsecond-unique timestamps; the round-17
    ``sf_tsties`` axis (events.ts floored to day grain — exact-tie
    event times, unreachable in every prior fixture) made both engines
    pick arbitrary tied rows and was this registry's ONE divergence on
    that sweep.

    NULL contract: a tick is a price observation — rows missing EITHER
    coordinate are excluded up front (no-op on the reference schema, both
    NOT NULL — ``Fx_1min.py:32,34``). Stated because the engines split on
    NULL payloads under argmax: Spark ``max_by`` returns the (NULL) value
    carried by the max-ts row, DuckDB ``arg_max`` skips NULL-arg rows —
    found by the round-16 independent-null sweep (D23 in DIALECT.md).
    """
    events = load_table(spark, sf_dir, "events")
    events = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    bar = F.date_trunc("hour", F.col("ts")).alias("bar_hour")
    tiebreak = F.struct("ts", "event_id")
    return events.groupBy("user_id", bar).agg(
        F.min_by("value", tiebreak).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", tiebreak).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@query(
    "user_value_twap",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ), weighted AS (
      SELECT user_id,
             CAST(round(value * date_diff('second', ts, nxt), 4)
                  AS DECIMAL(38,6)) AS wv,
             date_diff('second', ts, nxt) AS w
      FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           round(CAST(sum(wv) AS DOUBLE) / sum(w), 6) AS twap,
           CAST(sum(w) AS BIGINT) AS total_seconds
    FROM weighted GROUP BY user_id HAVING sum(w) > 0
    """,
)
def q_user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) — each observation weighted by how
    long it was the live value (lead-ts delta), the standard FX/market
    fair-average the reference's last-value analytics can't express. One
    window shuffle on user_id, then an exact-decimal weighted sum (per-row
    products rounded then decimal-summed ⇒ partitioning-independent)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "ts", "value", F.lead("ts").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    secs = (F.unix_timestamp("nxt") - F.unix_timestamp("ts"))
    weighted = seq.select(
        "user_id",
        F.round(F.col("value") * secs, 4).cast("decimal(38,6)").alias("wv"),
        secs.alias("w"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.round(F.sum("wv").cast("double") / F.sum("w"), 6).alias("twap"),
            F.sum("w").alias("total_seconds"),
        )
        .filter(F.col("total_seconds") > 0)
    )


# ---------------------------------------------------------------------------
# Round-4 curation breadth: repetition metrics (Gopher-style), deterministic
# stratified splits, per-label embedding centroids.
# ---------------------------------------------------------------------------

_ROLLHASH_SQL = """list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(lower(trim(text))[i]) AS BIGINT)
                for i in range(1, len(lower(trim(text))) + 1)]),
             (acc, c) -> (acc * 131 + c) % 1000000007)"""


@query(
    "doc_repetition_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), bi AS (
      SELECT doc_id, t,
             [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS b
      FROM toks
    )
    SELECT doc_id,
           len(t) AS n_tokens,
           round(CAST(len(list_distinct(t)) AS DOUBLE)
                 / nullif(len(t), 0), 6) AS ttr,
           CASE WHEN len(b) > 0
                THEN round(1.0 - CAST(len(list_distinct(b)) AS DOUBLE)
                                 / len(b), 6)
                ELSE 0.0 END AS dup_bigram_frac
    FROM bi
    """,
)
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the Gopher repetition-filter
    family): type-token ratio and duplicated-bigram fraction per document.
    Pure map-side JVM array expressions — no shuffle, no Python; at 100 TB
    this is a scan-rate filter, which is the point of running repetition
    gates BEFORE any shuffling curation stage."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim(F.col("text"))), " ")
    d = docs.withColumn("_t", t).withColumn(
        "_b",
        # size(_t) < 2 would make sequence(1, size-1) descend ([1,0]) and
        # element_at(_t, 0) throw; single-token/empty docs must still be
        # scored, so guard to an empty bigram array (dup-bigram handles
        # size(_b) == 0 explicitly).
        F.expr(
            "CASE WHEN size(_t) >= 2 THEN"
            " transform(sequence(1, size(_t) - 1),"
            " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
            " ELSE CAST(array() AS array<string>) END"
        ),
    )
    return d.select(
        "doc_id",
        F.size("_t").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct("_t")).cast("double")
            / F.nullif(F.size("_t"), F.lit(0)).cast("double"), 6
        ).alias("ttr"),
        F.when(
            F.size("_b") > 0,
            F.round(
                1.0 - F.size(F.array_distinct("_b")).cast("double")
                / F.size("_b").cast("double"), 6
            ),
        ).otherwise(0.0).alias("dup_bigram_frac"),
    )


@query(
    "doc_split_assign",
    oracle=f"""
    WITH b AS (
      -- textless docs cannot be content-hash-assigned to a split and are
      -- quarantined out (no-op on real data; text is never NULL there)
      SELECT source, n_chars, {_ROLLHASH_SQL} % 100 AS bucket
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY 1, 2
    """,
)
def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split (80/10/10 by content
    rolling-hash bucket): per (source, split) document and char counts.
    Content-hash assignment — not ``df.randomSplit`` — so the split is
    reproducible across runs, partitionings, and re-ingestions, and a doc
    never migrates between splits when the corpus grows: the discipline a
    training-data pipeline needs for honest held-out sets."""
    from fxspark.ops.text import rolling_fingerprint

    docs = load_table(spark, sf_dir, "documents").filter(
        # textless docs are quarantined out — see the oracle note
        F.col("text").isNotNull()
    )
    bucket = rolling_fingerprint(F.col("text")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.select("source", "n_chars", split.alias("split")).groupBy(
        "source", "split"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "label_centroid_stats",
    oracle="""
    WITH ex AS (
      -- fixture embeddings are 64-dim at every SF (TESTDATA.md); a lateral
      -- generate_series over len(embedding) is unsupported in DuckDB
      SELECT label, g.i AS pos,
             CAST(CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(30,10)) AS val
      FROM embeddings, generate_series(1, 64) g(i)
      WHERE embedding IS NOT NULL
    ), cent AS (
      SELECT label, pos,
             CAST(sum(val) AS DOUBLE) / count(*) AS c
      FROM ex GROUP BY label, pos
    ), n AS (
      SELECT label, count(*) AS n_vecs FROM embeddings
      WHERE embedding IS NOT NULL GROUP BY label
    )
    SELECT cent.label, max(n.n_vecs) AS n_vecs,
           round(sqrt(CAST(sum(CAST(round(c * c, 12) AS DECIMAL(38,12)))
                           AS DOUBLE)), 6) AS centroid_l2,
           round(max(CASE WHEN pos = 1 THEN c END), 6) AS centroid_c0
    FROM cent JOIN n ON n.label = cent.label
    GROUP BY cent.label
    """,
)
def q_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid summary (count, centroid L2 norm, first
    component): the reduce side of k-means / class-prototype analysis, as a
    posexplode → two-level exact-decimal aggregation. At scale this is the
    canonical 'mean vector per key' shuffle: (label, pos) partial sums are
    map-side combined, so the exchange carries ≤ labels × dim rows
    regardless of corpus size. Decimal-exact sums keep the hash stable
    under any partitioning (same discipline as exact_sum)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # vector-space domain (class 10): a NULL embedding is not a vector —
    # excluded from BOTH the centroid mass and n_vecs. Spelled on both
    # sides because posexplode(NULL) silently emits no rows while the
    # oracle's bracket-index emits NULL elements that its count(*) mean
    # denominator WOULD count (round-16 independent-null sweep).
    emb = emb.filter(F.col("embedding").isNotNull())
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label", (F.col("pos0") + 1).alias("pos"),
        F.col("val").cast("double").cast("decimal(30,10)").alias("val"),
    )
    cent = ex.groupBy("label", "pos").agg(
        (F.sum("val").cast("double") / F.count(F.lit(1))).alias("c")
    )
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        cent.join(n, "label")
        .groupBy("label")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            F.round(
                F.sqrt(
                    F.sum(
                        F.round(F.col("c") * F.col("c"), 12).cast("decimal(38,12)")
                    ).cast("double")
                ), 6
            ).alias("centroid_l2"),
            F.round(
                F.max(F.when(F.col("pos") == 1, F.col("c"))), 6
            ).alias("centroid_c0"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming batch-replay family: the streaming module's operators run
# UNCHANGED on batch frames (watermarks are no-ops there), so each entry
# below pins a streaming function's semantics under the oracle differential —
# closing VERDICT r2 gap #5 ("streaming paths are pytest-verified only").
# ---------------------------------------------------------------------------


@query(
    "stream_windowed_rate_replay",
    oracle="""
    SELECT date_trunc('minute', ts) AS window_start,
           date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
           user_id,
           arg_max(value, event_id) AS latest_rate,
           count(*) AS n_obs
    -- NULL-ts rows have no tumbling window (same event-time contract
    -- as the session replays); a NULL value is not a rate observation
    -- (D23: Spark max_by carries the NULL payload, DuckDB arg_max skips)
    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def q_stream_windowed_rate_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming.runner.windowed_rate_stats`` — the SAME
    function the continuous query runs (event-time tumbling window +
    watermark + max_by), applied to the batch events table: per (1-min
    window, user) the latest value and observation count. ``event_id`` plays
    the unique event-time tiebreaker so ``max_by`` is deterministic. Spark's
    epoch-aligned 1-minute ``window`` ≡ the oracle's date_trunc."""
    from fxspark.streaming.runner import windowed_rate_stats

    events = load_table(spark, sf_dir, "events")
    # a NULL value is not a rate observation (D23); NULL ts is dropped by
    # the windowing itself — stated here so the feed matches the oracle
    events = events.filter(F.col("value").isNotNull())
    feed = events.select(
        "ts", "user_id",
        F.col("value").alias("rate"),
        F.col("event_id").alias("event_time"),
    )
    return windowed_rate_stats(feed, ts_col="ts", key_col="user_id")


@query(
    "stream_interval_join_replay",
    oracle="""
    SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_stream_interval_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming.runner.stream_stream_interval_join`` (the
    watermark-bounded stream-stream join): purchases matched to the same
    user's clicks in the preceding hour. Same join condition the streaming
    state manager enforces — replayed on the batch table so the differential
    pins it exactly."""
    from fxspark.streaming.runner import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    return stream_stream_interval_join(purchases, clicks)


@query(
    "stream_session_replay",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      -- an event without event time has no session window: Spark's
      -- session_window operator drops NULL-ts rows (a watermarked stream
      -- could never admit them); the oracle states the same contract.
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM g GROUP BY user_id, sid
    """,
)
def q_stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming.runner.session_window_stats`` — the exact
    streaming function (session_window + watermark + exact-decimal sum), so
    its output schema INCLUDING the session_end = last_event + gap half-open
    bound is oracle-pinned (the sibling ``session_window_stats`` query pins
    the built-in operator; this one pins the streaming wrapper)."""
    from fxspark.streaming.runner import session_window_stats

    events = load_table(spark, sf_dir, "events")
    return session_window_stats(events)


# ---------------------------------------------------------------------------
# Round-4 curation depth: duplicated-span detection, bounded-memory heavy
# hitters, SemDeDup, bigram LM scoring, logistic quality classifier.
# ---------------------------------------------------------------------------


@query(
    "doc_chunk_dup_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '),
                         t -> t != '') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id,
             unnest([array_to_string(toks[(i-1)*8+1 : i*8], ' ')
                     for i in range(1, CAST(ceil(len(toks)/8.0) AS BIGINT) + 1)])
               AS chunk_text
      FROM t
    )
    SELECT chunk_text,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences,
           min(doc_id) AS first_doc
    FROM c GROUP BY chunk_text HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_doc_chunk_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated 8-token spans (the distributed stand-in
    for suffix-array exact-substring dedup — Lee et al. 2022): map-side
    chunk explode, one partial-combined exchange on the chunk key. The
    span-level complement of whole-doc dedup: catches boilerplate repeated
    inside otherwise-distinct documents."""
    from fxspark.ops.dedup import chunk_dup_spans

    docs = spread(load_table(spark, sf_dir, "documents"))
    return chunk_dup_spans(docs, "doc_id", "text", width=8)


@query(
    "token_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS key
      FROM documents
    )
    SELECT key, count(*) AS cnt
    FROM toks GROUP BY key ORDER BY cnt DESC, key LIMIT 20
    """,
)
def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens via the two-pass Misra-Gries topology
    (ops/sketch): pass 1 is a bounded-memory (512-counter) per-partition
    sketch in an Arrow-batched mapInPandas, pass 2 an exact count of the
    surviving candidates only — the memory-safe heavy-hitters plan for an
    open key domain at 100 TB, exact whenever the k-th frequency clears the
    N/capacity pigeonhole bound (oracle-checked against the plain exact
    GROUP BY, which is the point of the two-pass scheme)."""
    from fxspark.ops.sketch import heavy_hitters_exact
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    return heavy_hitters_exact(toks, "w", k=20, capacity=512)


def _semantic_dedup_oracle() -> str | None:
    """Literal-centroid DuckDB replay of SemDeDup (same codebook-training
    routine and sample as the Spark plan — the `_ivf_oracle` discipline):
    cosine-argmax assignment, within-cell lower-id near-dup rule."""
    try:
        import numpy as np
        import pyarrow.parquet as pq

        from fxspark.ops.similarity import train_ivf_codebook

        sf_dir = os.environ.get("FXSPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01")
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_by("vec_id")
        # dtype=object: train_ivf_codebook drops NULL vectors from the
        # sample itself, so all callers derive the identical codebook
        sample = np.array(t.column("embedding").to_pylist()[:4096],
                          dtype=object)
        cents = train_ivf_codebook(sample, n_cells=16, seed=7)
    except Exception:  # noqa: BLE001 — no fixture ⇒ honest rows-only check
        return None
    if not cents:  # empty fixture ⇒ no VALUES list — rows-only check
        return None
    vals = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    return f"""
    WITH cent(cell, cv) AS (VALUES {vals}),
    e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings),
    assigned AS (
      SELECT vec_id,
             list_transform(emb,
               x -> x / sqrt(list_sum(list_apply(emb, y -> y*y)))) AS vn,
             (SELECT cell FROM cent
              ORDER BY {_COS_SQL.format(a='emb', b='cv')} DESC, cell ASC
              LIMIT 1) AS cid
      FROM e),
    pairs AS (
      SELECT b.vec_id AS vec_id, a.cid AS cid, a.vec_id AS kept_by,
             list_sum(list_apply(list_zip(a.vn, b.vn), p -> p[1]*p[2])) AS cos
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_sum(list_apply(list_zip(a.vn, b.vn), p -> p[1]*p[2])) >= 0.45)
    SELECT vec_id, cid, kept_by, cos FROM (
      SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cos DESC, kept_by) AS rn
      FROM pairs
    ) WHERE rn = 1
    """


@query("embedding_semantic_dedup", oracle=_semantic_dedup_oracle())
def q_embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup removal that is
    quadratic only WITHIN a k-means cell, never across the corpus
    (ops/similarity.semantic_dedup). One row per dropped vector with its
    keeper and cosine. The codebook is the shared seeded trainer, so the
    approximate data-adaptive index is still hash-checkable."""
    import numpy as np
    import pyarrow.parquet as pq

    from fxspark.ops.similarity import semantic_dedup, train_ivf_codebook

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    # dtype=object: train_ivf_codebook drops NULL vectors from the
    # sample itself, so all callers derive the identical codebook
    sample = np.array(t.column("embedding").to_pylist()[:4096], dtype=object)
    cents = train_ivf_codebook(sample, n_cells=16, seed=7)
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, embedding array<double>"
    )
    return semantic_dedup(emb, cent_df, threshold=0.45)


@query(
    "doc_bigram_logprob",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents
    ), bb AS (
      SELECT doc_id,
             unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
      FROM t
    ), f2 AS (
      SELECT bg, count(*) AS c12 FROM bb GROUP BY bg
    ), f1 AS (
      SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1 FROM bb GROUP BY 1
    ), scored AS (
      SELECT doc_id,
             CAST(round(-ln(CAST(c12 AS DOUBLE) / c1), 9)
                  AS DECIMAL(20,10)) AS s
      FROM bb JOIN f2 USING (bg)
      JOIN f1 ON f1.w1 = split_part(bb.bg, ' ', 1)
    )
    SELECT doc_id,
           round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS mean_logprob,
           count(*) AS n_bigrams
    FROM scored GROUP BY doc_id
    """,
)
def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram language-model score per document: mean −ln P(w₂|w₁)
    with P = corpus bigram count / first-token continuation count — one
    step up the n-gram ladder from ``doc_unigram_surprisal`` and the
    classic cheap stand-in for model-perplexity quality filtering. Two
    partial-combined count aggs (bounded by vocab²), joined back
    broadcast-promoted; per-bigram scores rounded then summed in exact
    decimal so the mean is partitioning-independent."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = tokens(F.col("text"))
    # size(t) < 2 would make sequence(1, size-1) DESCEND ([1,0]) and
    # slice(t, 0, 2) throw; guard to an empty array (explode then drops
    # the row, matching the oracle's empty range(1, len(w))).
    bg = F.explode(
        F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    bb = docs.select("doc_id", bg.alias("bg")).withColumn(
        "w1", F.substring_index("bg", " ", 1)
    )
    f2 = bb.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    f1 = bb.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    s = F.round(-F.log(F.col("c12").cast("double") / F.col("c1")), 9).cast(
        "decimal(20,10)"
    )
    return (
        bb.join(f2, "bg")
        .join(f1, "w1")
        .select("doc_id", s.alias("_s"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_s").cast("double") / F.count(F.lit(1)), 6)
            .alias("mean_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


@query(
    "doc_quality_logistic",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    ), bi AS (
      SELECT doc_id, toks,
             [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS b
      FROM t
    ), feats AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             coalesce(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t)))
                      / CAST(nullif(len(toks), 0) AS DOUBLE), 0.0) AS stop_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE)
               / nullif(len(toks), 0) AS ttr,
             CASE WHEN len(b) > 0
                  THEN 1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b)
                  ELSE 0.0 END AS dup_bi
      FROM bi
    ), z AS (
      SELECT doc_id, n_tokens,
             round(-1.5 + 0.02 * n_tokens + 3.0 * stop_ratio
                   + 2.0 * ttr - 4.0 * dup_bi, 9) AS z
      FROM feats
    )
    SELECT doc_id, n_tokens, z,
           round(1.0 / (1.0 + exp(-z)), 6) AS quality_prob,
           CAST(1.0 / (1.0 + exp(-z)) >= 0.5 AS BOOLEAN) AS keep
    FROM z
    """,
)
def q_doc_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic quality classifier with declared weights over interpretable
    features (token count, stopword ratio, type-token ratio, duplicated-
    bigram fraction) — the deterministic stand-in for a fastText-style
    quality model: same plan shape (map-only featurize → dot product →
    sigmoid → threshold), swap the literal weights for learned ones. Pure
    JVM expressions, no shuffle; the z-score is rounded before the sigmoid
    so the cross-engine hash is stable."""
    from fxspark.ops.text import stopword_ratio, tokens

    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    d = docs.withColumn("_t", t).withColumn(
        "_b",
        # size(_t) < 2 would make sequence(1, size-1) descend ([1,0]) and
        # element_at(_t, 0) throw; single-token/empty docs must still be
        # scored, so guard to an empty bigram array (dup-bigram handles
        # size(_b) == 0 explicitly).
        F.expr(
            "CASE WHEN size(_t) >= 2 THEN"
            " transform(sequence(1, size(_t) - 1),"
            " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
            " ELSE CAST(array() AS array<string>) END"
        ),
    )
    n_tokens = F.size("_t")
    stop_ratio = F.coalesce(stopword_ratio(F.col("text")), F.lit(0.0))
    ttr = F.size(F.array_distinct("_t")).cast("double") / F.nullif(
        F.size("_t"), F.lit(0)
    ).cast("double")
    dup_bi = F.when(
        F.size("_b") > 0,
        1.0 - F.size(F.array_distinct("_b")).cast("double")
        / F.size("_b").cast("double"),
    ).otherwise(0.0)
    z = F.round(
        -1.5 + 0.02 * n_tokens + 3.0 * stop_ratio + 2.0 * ttr - 4.0 * dup_bi, 9
    )
    prob = 1.0 / (1.0 + F.exp(-z))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        z.alias("z"),
        F.round(prob, 6).alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


@query(
    "doc_pack_bins",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(lower(trim(text)), ' ')) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ), b AS (
      SELECT source, CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS bin,
             doc_id, n_tok
      FROM c
    )
    SELECT source, bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM b GROUP BY source, bin
    """,
)
def q_doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to 2048-token context bins by
    running offset, packed independently PER SOURCE — the step that turns a
    curated corpus into fixed-length training examples. Per-source packing
    is the scale shape: the running-sum window partitions on source (each
    source is an independent stream), so no global sort exists and adding
    sources adds partitions, not depth. Deterministic doc_id order makes
    the packing reproducible across runs and partitionings."""
    from pyspark.sql import Window

    from fxspark.ops.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = t.withColumn("cum", F.sum("n_tok").over(w)).select(
        "source",
        F.floor((F.col("cum") - F.col("n_tok")) / F.lit(2048.0))
        .cast("long")
        .alias("bin"),
        "doc_id",
        "n_tok",
    )
    return b.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "source_mixing_plan",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(sum(len(string_split(lower(trim(text)), ' '))) AS BIGINT)
               AS source_tokens
      FROM documents GROUP BY source
    ), m AS (
      SELECT count(*) AS n_sources,
             min(source_tokens) * count(*) AS budget
      FROM s
    )
    SELECT source, source_tokens,
           round(CAST(budget AS DOUBLE) / (n_sources * source_tokens), 6)
             AS sample_rate,
           CAST(floor(CAST(budget AS DOUBLE) / n_sources) AS BIGINT)
             AS sampled_tokens
    FROM s, m
    """,
)
def q_source_mixing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weight planning (the DoReMi/Pile-style 'how much of each
    source' step): under a uniform target mixture, the largest achievable
    no-upsampling budget is min over sources of tokens_s/weight_s; each
    source then downsamples at rate budget·w_s/tokens_s. One tiny per-source
    aggregate (rows = #sources) and window math over it — the corpus scan
    is the only big stage, and it is a pure partial-combined count."""
    from pyspark.sql import Window

    from fxspark.ops.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("source_tokens")
    )
    wall = Window.partitionBy()
    g = s.withColumn("n_sources", F.count(F.lit(1)).over(wall)).withColumn(
        "budget",
        F.min(F.col("source_tokens") * F.col("n_sources")).over(wall),
    )
    return g.select(
        "source",
        "source_tokens",
        F.round(
            F.col("budget").cast("double")
            / (F.col("n_sources") * F.col("source_tokens")),
            6,
        ).alias("sample_rate"),
        F.floor(F.col("budget").cast("double") / F.col("n_sources"))
        .cast("long")
        .alias("sampled_tokens"),
    )


def _zorder_stats_oracle() -> str:
    from fxspark.ops.layout import zvalue_sql

    zv = zvalue_sql(
        "((user_id % 65536) + 65536) % 65536",
        "((CAST(floor(value * 100) AS BIGINT) % 65536) + 65536) % 65536",
    )
    return f"""
    WITH z AS (
      SELECT user_id,
             CAST(floor(value * 100) AS BIGINT) AS vb,
             {zv} AS zval
      FROM events
    )
    SELECT CAST(floor(zval / 67108864.0) AS BIGINT) AS zbin,
           count(*) AS n_events,
           min(user_id) AS min_user, max(user_id) AS max_user,
           min(vb) AS min_vb, max(vb) AS max_vb
    FROM z GROUP BY 1
    """


@query("events_zorder_stats", oracle=_zorder_stats_oracle())
def q_events_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering quality report: Morton-interleave (user_id,
    value-bucket), bin by the top z bits, and show that every bin bounds
    BOTH dimensions (the min/max ranges a parquet footer would carry after
    OPTIMIZE ZORDER — ops/layout.zorder_layout is the write path). The
    z-value is declared floor-div/mod arithmetic, so the DuckDB oracle
    reproduces the layout decision bit-for-bit; the whole query is one
    map-side expression plus a bounded groupBy."""
    from fxspark.ops.layout import zvalue

    events = load_table(spark, sf_dir, "events")
    a = F.pmod(F.col("user_id"), F.lit(65536))
    vb = F.floor(F.col("value") * 100).cast("long")
    b = F.pmod(vb, F.lit(65536))
    z = events.select(
        "user_id",
        vb.alias("vb"),
        zvalue(a, b).alias("zval"),
    )
    return z.groupBy(
        F.floor(F.col("zval") / F.lit(67108864.0)).cast("long").alias("zbin")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("vb").alias("min_vb"),
        F.max("vb").alias("max_vb"),
    )


@query(
    "events_kmv_distinct",
    oracle="""
    WITH h AS (
      SELECT DISTINCT
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
          / 1152921504606846976.0 AS h
      FROM events
    ), kmin AS (
      SELECT h FROM h ORDER BY h LIMIT 256
    ), s AS (
      SELECT count(*) AS n_seen, max(h) AS kth FROM kmin
    ), t AS (
      SELECT count(DISTINCT event_id) AS true_distinct FROM events
    )
    SELECT CAST(256 AS BIGINT) AS k,
           round(kth, 9) AS kth_min,
           CAST(round(CASE WHEN n_seen < 256 THEN n_seen
                           ELSE (256 - 1) / kth END, 0) AS BIGINT)
             AS est_distinct,
           true_distinct
    FROM s, t
    """,
)
def q_events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=256: keep the k
    smallest md5-derived hash fractions; estimate distinct = (k−1)/kth_min.
    The mergeable cardinality sketch of the HLL family — but built on an
    engine-portable hash, so unlike ``approx_count_distinct`` the ESTIMATE
    ITSELF is reproduced bit-for-bit by the DuckDB oracle (the point:
    approximate operators can still be differentially verified when their
    randomness is declared). Scale shape: the top-k is
    TakeOrderedAndProject — per-partition k-smallest then a k-sized merge,
    never a global sort; memory O(k) per task."""
    events = load_table(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(2**60))
    ).alias("h")
    kmin = events.select(h).distinct().orderBy("h").limit(256)
    s = kmin.agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth")
    )
    t = events.agg(F.countDistinct("event_id").alias("true_distinct"))
    return s.crossJoin(t).select(
        F.lit(256).cast("long").alias("k"),
        F.round(F.col("kth"), 9).alias("kth_min"),
        F.round(
            F.when(F.col("n_seen") < 256, F.col("n_seen").cast("double"))
            .otherwise(F.lit(255.0) / F.col("kth")),
            0,
        )
        .cast("long")
        .alias("est_distinct"),
        "true_distinct",
    )


@query(
    "user_value_ewma",
    oracle="""
    WITH v AS (
      -- keyed_ewma's domain contract: NULL-ts rows are unplaceable in
      -- the sequence, NULL values are skipped observations
      SELECT user_id,
             array_agg(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_total,
           -- RAW fold output, deliberately un-rounded: the fold is
           -- bit-identical IEEE in both engines, while ROUND(double, 6)
           -- diverges exactly on 1e-6 halves — which dyadic (alpha=0.5)
           -- combinations of low-decimal values produce routinely (rule
           -- D22, found by the round-15 sf0.1 Zipf-skew probe where the
           -- hot key's 40k-step fold hit a tie)
           list_reduce(vals, (acc, x) -> 0.5*x + 0.5*acc) AS ewma,
           vals[-1] AS last_value
    FROM v
    """,
)
def q_user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α=0.5) in event order as a declared sequential fold
    (ops/windows.keyed_ewma) — the BATCH twin of the streaming
    ``applyInPandasWithState`` state recurrence, so the custom stateful
    operator's semantics are pinned under the oracle differential (its
    cross-batch behavior stays pytest-pinned; a parity test holds the two
    to the same recurrence). DuckDB replays the identical fold via
    ``list_reduce``, seeding with the first ordered value. The ewma is
    emitted RAW (no round): the fold is bit-identical IEEE on both
    engines, while ROUND(double, 6) splits on the exact 1e-6 halves the
    dyadic alpha produces — rule D22, found by the round-15 sf0.1
    Zipf-skew probe."""
    from fxspark.ops.windows import keyed_ewma

    events = load_table(spark, sf_dir, "events")
    out = keyed_ewma(
        events, "user_id", ["ts", "event_id"], "value", alpha=0.5
    )
    return out.select("user_id", "n_total", "ewma", "last_value")


@query(
    "source_shared_spans",
    oracle="""
    WITH t AS (
      SELECT source,
             list_filter(string_split(lower(trim(text)), ' '),
                         t -> t != '') AS toks
      FROM documents
    ), c AS (
      SELECT DISTINCT source,
             unnest([array_to_string(toks[(i-1)*8+1 : i*8], ' ')
                     for i in range(1, CAST(ceil(len(toks)/8.0) AS BIGINT) + 1)])
               AS chunk_text
      FROM t
    )
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS shared_spans
    FROM c a JOIN c b
      ON a.chunk_text = b.chunk_text AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def q_source_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source boilerplate matrix: for every source pair, how many
    distinct 8-token spans they share — the provenance view of span-level
    dedup (which feeds/license pools reuse each other's boilerplate, and
    where decontamination pressure should go). Plan: map-side chunk
    explode → per-(source, chunk) distinct → self-join keyed on the chunk
    (bucket width = sources per chunk, bounded by the source count, never
    corpus rows) → pair count. All exchanges carry distinct chunks, not
    documents."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.filter(tokens(F.col("text")), lambda x: x != F.lit(""))
    n_chunks = F.ceil(F.size(t) / F.lit(8)).cast("int")
    starts = F.when(
        n_chunks < 1, F.array().cast("array<int>")
    ).otherwise(
        F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * 8 + 1)
    )
    chunks = docs.select(
        "source",
        F.explode(
            F.transform(starts, lambda s: F.concat_ws(" ", F.slice(t, s, 8)))
        ).alias("chunk_text"),
    ).distinct()
    a = chunks.select(
        F.col("source").alias("source_a"), "chunk_text"
    )
    b = chunks.select(
        F.col("source").alias("source_b"), "chunk_text"
    )
    return (
        a.join(b, "chunk_text")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_spans"))
    )


@query(
    "doc_importance_weights",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
      FROM documents
    ), b AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 256 AS bucket
      FROM tok WHERE tok <> ''
    ), tgt AS (
      SELECT bucket, count(*) AS c FROM b
      WHERE source IN ('src0','src1','src2','src3','src4') GROUP BY bucket
    ), raw AS (
      SELECT bucket, count(*) AS c FROM b GROUP BY bucket
    ), tot AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM b
              WHERE source IN ('src0','src1','src2','src3','src4')) AS tgt_n,
             (SELECT CAST(count(*) AS BIGINT) FROM b) AS raw_n
    ), scored AS (
      SELECT b.doc_id, b.source,
             CAST(round(ln((coalesce(tgt.c, 0) + 1.0) / (tot.tgt_n + 256.0))
                        - ln((raw.c + 1.0) / (tot.raw_n + 256.0)), 9)
                  AS DECIMAL(20,10)) AS s
      FROM b JOIN raw USING (bucket)
      LEFT JOIN tgt USING (bucket)
      CROSS JOIN tot
    )
    SELECT doc_id, source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(sum(s) AS DOUBLE), 6) AS log_weight
    FROM scored GROUP BY doc_id, source
    """,
)
def q_doc_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): per-document log-likelihood ratio between a
    TARGET domain (here the declared sources src0-src4) and the raw corpus,
    under hashed-unigram bag-of-words models (256 md5 buckets, add-one
    smoothing) — the standard cheap scorer for 'select web data that looks
    like the target'. Deterministic by construction: the feature hash is
    declared md5 arithmetic, so the weight itself is oracle-verifiable.
    Scale shape: the two bucket LMs are 256-row aggregates (broadcast
    back), the corpus side is explode → map-side bucket → one doc-keyed
    sum; nothing shuffles on the open token domain. Per-token scores are
    rounded then decimal-summed, so the doc weight is partition-order
    independent."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long"),
        F.lit(256),
    )
    b = tok.select("doc_id", "source", bucket.alias("bucket"))
    is_tgt = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    tgt = (
        b.filter(is_tgt).groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    )
    raw = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tot = b.agg(
        F.sum(F.when(is_tgt, 1).otherwise(0)).cast("long").alias("tgt_n"),
        F.count(F.lit(1)).alias("raw_n"),
    )
    s = F.round(
        F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1.0) / (F.col("tgt_n") + 256.0))
        - F.log((F.col("rc") + 1.0) / (F.col("raw_n") + 256.0)),
        9,
    ).cast("decimal(20,10)")
    return (
        b.join(F.broadcast(raw), "bucket")
        .join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(tot))
        .select("doc_id", "source", s.alias("_s"))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_s").cast("double"), 6).alias("log_weight"),
        )
    )


@query(
    "doc_token_budget_select",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, source,
             CAST(len(toks) AS BIGINT) AS n_tok,
             round(CAST(len(list_distinct(toks)) AS DOUBLE)
                   / nullif(len(toks), 0), 9) AS score
      FROM t
    ), c AS (
      SELECT doc_id, source, n_tok, score,
             sum(n_tok) OVER (PARTITION BY source
                              ORDER BY score DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM f
    )
    SELECT doc_id, source, n_tok, score,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(cum_tokens - n_tok < 600 AS BOOLEAN) AS kept
    FROM c
    """,
)
def q_doc_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy data selection under a per-source token budget: rank each
    source's documents by a declared quality score (type-token ratio,
    doc_id tiebreak), admit documents in rank order until the source's
    600-token budget is reached — the 'fill the training mixture to budget,
    best first' step that follows mixture planning (``source_mixing_plan``
    decides how much; this decides WHICH). A document is kept when it
    STARTS within budget, so the boundary document may overshoot — the
    deterministic variant of budget-filling. Scale shape: identical to
    sequence packing — the running-sum window partitions on source, so
    there is no global sort and source count scales partitions, not depth;
    scoring is map-only."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    f = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.nullif(F.size(toks), F.lit(0)).cast("double"),
            9,
        ).alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = f.withColumn("cum_tokens", F.sum("n_tok").over(w))
    return c.select(
        "doc_id",
        "source",
        "n_tok",
        "score",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        ((F.col("cum_tokens") - F.col("n_tok")) < 600).alias("kept"),
    )


def _minhash_cross_oracle(
    k: int = 64, bands: int = 16, threshold: float = 0.7
) -> str:
    from fxspark.ops.dedup import _MERSENNE_31 as M, _minhash_perms

    r = k // bands
    sig = ", ".join(
        f"min(({a}*x + {b}) % {M}) AS h{i}"
        for i, (a, b) in enumerate(_minhash_perms(k))
    )
    band_arms = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS bn, concat_ws(',', "
        + ", ".join(f"h{i}" for i in range(b * r, (b + 1) * r))
        + ") AS bk FROM sig"
        for b in range(bands)
    )
    jac = ("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)"
           " / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))")
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
                                    for i in range(1, len(t)-1)]) AS s
      FROM toks WHERE len(t) >= 3
    ), h AS (
      SELECT doc_id,
             CAST(('0x'||substr(md5(sh0),1,15)) AS BIGINT) % {M} AS x
      FROM (SELECT doc_id, unnest(s) AS sh0 FROM sh)
    ), sig AS (
      SELECT doc_id, {sig} FROM h GROUP BY doc_id
    ), bands AS (
      {band_arms}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS bench_id
      FROM bands a JOIN bands b ON a.bn = b.bn AND a.bk = b.bk
      WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
    )
    SELECT c.doc_id, c.bench_id, round({jac}, 6) AS jaccard
    FROM cand c JOIN sh sa ON sa.doc_id = c.doc_id
                JOIN sh sb ON sb.doc_id = c.bench_id
    WHERE {jac} >= {threshold}
    """


@query("benchmark_minhash_contamination", oracle=_minhash_cross_oracle())
def q_benchmark_minhash_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy benchmark contamination: MinHash-LSH candidate pairs between
    the training corpus and a benchmark set (stand-in eval set: docs with
    ``doc_id % 10 == 0``), verified with exact Jaccard ≥ 0.7 — catches the
    paraphrased/lightly-edited eval leakage that ``benchmark_contamination``'s
    exact 4-gram sweep misses. Runs with the cross-engine md5_60 hash family
    and exact band tuples, so the DuckDB oracle replays the same signatures
    and band collisions (full value differential over the LSH pipeline).
    Scale shape (``ops.dedup.minhash_cross_pairs``): the bench side's bands
    and shingle sets BROADCAST — the corpus never shuffles on band or
    shingle domains, the same topology as the exact-gram decontam sweep."""
    from fxspark.ops.dedup import minhash_cross_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return minhash_cross_pairs(
        corpus, bench, "doc_id", "text", n=3, k=64, bands=16,
        threshold=0.7, hash_fn="md5_60",
    )


@query(
    "user_value_trailing_1h",
    oracle="""
    SELECT event_id, user_id, ts,
           -- RAW IEEE quotient, deliberately un-rounded: sum and count
           -- are exact and identical on both engines, so the division is
           -- bit-identical — while ROUND(double, 6) diverges on exact
           -- 1e-6 halves, which sum/count quotients of low-decimal
           -- values hit (rule D22; 9 of 100k rows on the round-15 sf0.1
           -- one-key probe landed on ties like 51.1759375)
           CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / count(*) OVER w AS trailing_avg,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_user_value_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-window aggregate via a RANGE frame: for every event,
    the mean value over the same user's events in the preceding hour
    (inclusive) — the time-based sibling of ``rolling_value_avg``'s
    row-count frame, and the standard feature for burst/velocity signals.
    The frame is TIME-bounded (``rangeBetween`` on epoch MICROS — the
    data's full precision), so irregular event spacing is handled exactly;
    one shuffle+sort on user_id. The frame sum goes through the
    decimal-exact route: frame membership is identical across engines, but
    accumulation order within equal timestamps is not — decimal addition
    commutes, doubles don't.

    Round-15 fix (found by the sf_onekey skew sweep — the first fixture
    dense enough in same-user pairs to hit it): the frame originally
    ranged over ``unix_timestamp`` SECONDS, which truncates — same-second
    rows became mutual RANGE-peers in Spark but not in DuckDB's
    full-precision INTERVAL frame, and a pair straddling the hour
    boundary by sub-second spacing joined the Spark frame but not the
    oracle's. Micros grain restores the query's actual contract (exact
    trailing hour); value-identical on the driver data, where per-user
    event spacing never produced such a pair (every prior gate was
    green)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        # raw IEEE quotient — see the oracle's D22 note on ROUND ties
        (
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("trailing_avg"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
    )


@query(
    "token_bpe_pair_counts",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq
      FROM tok WHERE tok <> '' GROUP BY tok
    ), pairs AS (
      SELECT tok, freq,
             unnest([c[i] || c[i+1] for i in range(1, len(c))]) AS pair
      FROM (SELECT tok, freq, string_split(tok, '') AS c FROM vocab)
    )
    SELECT pair,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(freq) AS BIGINT) AS total_count
    FROM pairs
    GROUP BY pair
    ORDER BY total_count DESC, pair
    LIMIT 30
    """,
)
def q_token_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-selection step (the tokenizer-training inner loop):
    count adjacent symbol pairs across the corpus weighted by word
    frequency and rank the merge candidates — top-30 with a deterministic
    (count desc, pair asc) tiebreak. The critical scale move is aggregating
    to the VOCABULARY first (tokens → word counts, a partial-combined agg
    whose output is vocab-sized, not corpus-sized) and exploding
    character pairs from vocab entries only — 100 TB of text collapses to
    ~millions of distinct words before any per-character work happens.
    Single-char words contribute no pairs (the same descending-sequence
    guard as the bigram family); the final top-k is TakeOrderedAndProject,
    never a global sort."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), " ")
            ).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.select(
        "tok",
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN length(tok) >= 2 THEN"
                " transform(sequence(1, length(tok) - 1),"
                " i -> concat(substring(tok, i, 1), substring(tok, i + 1, 1)))"
                " ELSE CAST(array() AS array<string>) END"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("freq").alias("total_count"),
        )
        .orderBy(F.col("total_count").desc(), "pair")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Warehouse lifecycle family (round 5): CDC / SCD2 / funnel / retention /
# quality-audit / deterministic weighted sampling / iterative graph rank —
# the operations around the analytics core that a table's LIFETIME needs
# (versioning, diffing, auditing) plus product-analytics staples.
# ---------------------------------------------------------------------------


@query(
    "user_type_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      -- scd2_intervals drops NULL-order rows by contract
      FROM events WHERE ts IS NOT NULL
    ), versions AS (
      -- rn = 1 marks the first row; IS DISTINCT FROM is the null-safe
      -- state comparison scd2_intervals uses (a NULL state following a
      -- NULL state is NOT a new version — 'prev_type IS NULL' would
      -- conflate "no previous row" with "previous state NULL").
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM versions
    )
    """,
)
def q_user_type_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the event log: collapse
    consecutive same-state rows per user, then assign validity intervals
    (``ops/cdc.scd2_intervals``) — the versioned-dimension discipline the
    reference's overwrite-only store loses every tick
    (``update_exchange_rates.py:160-170`` truncate-and-reload)."""
    from fxspark.ops.cdc import scd2_intervals

    events = load_table(spark, sf_dir, "events")
    return scd2_intervals(
        events, "user_id", ["ts", "event_id"], ["event_type"]
    )


@query(
    "user_state_cdc_diff",
    oracle=f"""
    WITH old_snap AS (
      SELECT user_id, value AS old_value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts < TIMESTAMP '2024-01-10 00:00:00'
      ) WHERE rn = 1
    ), new_snap AS (
      SELECT user_id, value AS new_value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    -- presence FLAGS, not key-NULL probes: with a NULL user_id key the
    -- null-unsafe FULL OUTER never matches, and the old-only NULL-key
    -- row would read as 'insert' under `o.user_id IS NULL` (round-16
    -- sf_nullkeys sweep) — the engine classifies by _in_old/_in_new
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.in_old IS NULL THEN 'insert'
                WHEN n.in_new IS NULL THEN 'delete'
                WHEN o.old_value IS DISTINCT FROM n.new_value THEN 'update'
           END AS change_type,
           o.old_value, n.new_value
    FROM (SELECT *, TRUE AS in_old FROM old_snap) o
    FULL OUTER JOIN (SELECT *, TRUE AS in_new FROM new_snap) n
      ON o.user_id = n.user_id
    WHERE NOT (o.in_old IS NOT NULL AND n.in_new IS NOT NULL
               AND o.old_value IS NOT DISTINCT FROM n.new_value)
    """,
)
def q_user_state_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff (``ops/cdc.snapshot_diff``): the change set
    between each user's latest state in two adjacent time windows —
    insert/update/delete classification via one full-outer join, the
    incremental feed an overwrite-only store (the reference's) cannot
    produce."""
    from fxspark.ops.cdc import snapshot_diff
    from fxspark.ops.latest import latest_per_key_agg

    events = load_table(spark, sf_dir, "events")
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("2024-01-10 00:00:00").cast("timestamp")
    t2 = F.lit(CUTOFF).cast("timestamp")
    old = latest_per_key_agg(
        events.filter((F.col("ts") >= t0) & (F.col("ts") < t1)),
        "user_id", ["ts", "event_id"], payload=["value"],
    )
    new = latest_per_key_agg(
        events.filter((F.col("ts") >= t1) & (F.col("ts") < t2)),
        "user_id", ["ts", "event_id"], payload=["value"],
    )
    return snapshot_diff(old, new, "user_id", ["value"])


@query(
    "event_funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_event_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase per user
    (``ops/windows.funnel_stages``): earliest time each stage is reached
    strictly after the previous one, NULL once abandoned. Every stage is a
    filtered scan + per-key aggregation — shuffles only on user_id."""
    from fxspark.ops.windows import funnel_stages

    events = load_table(spark, sf_dir, "events")
    return funnel_stages(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


@query(
    "daily_retention",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d
    ), ret AS (
      SELECT a.d, CAST(count(*) AS BIGINT) AS retained7
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND b.d = a.d - 7
      GROUP BY a.d
    )
    SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau,
           COALESCE(ret.retained7, 0) AS retained7,
           round(COALESCE(ret.retained7, 0) / CAST(dau.dau AS DOUBLE), 6)
             AS retention_rate
    FROM dau LEFT JOIN ret ON dau.d = ret.d
    """,
)
def q_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + 7-day retention (users active on d who were
    also active on d-7) — the growth-analytics staple. Distinct (day,
    user) pairs once, then a self-join on (user, day-7): both sides hash
    on user_id, no skew (near-unique), linear in active pairs."""
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    b = du.select(F.col("d").alias("_bd"), F.col("user_id").alias("_bu"))
    ret = (
        du.join(
            b,
            (F.col("user_id") == F.col("_bu"))
            & (F.col("_bd") == F.date_sub(F.col("d"), 7)),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("retained7"))
    )
    return (
        dau.join(ret, "d", "left")
        .select(
            # midnight TIMESTAMP, not DATE: both engines then hand the
            # comparator the same datetime64 dtype (a DATE column arrives
            # as python objects from Spark but datetime64 from DuckDB)
            F.col("d").cast("timestamp").alias("day"),
            "dau",
            F.coalesce(F.col("retained7"), F.lit(0)).alias("retained7"),
            F.round(
                F.coalesce(F.col("retained7"), F.lit(0))
                / F.col("dau").cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )


@query(
    "orders_quality_audit",
    oracle="""
    SELECT 'bad_status' AS check_name, CAST(count(*) FILTER (
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
             AS violations FROM orders
    UNION ALL
    SELECT 'dup_orderkey', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'negative_totalprice', CAST(count(*) FILTER (
             WHERE o_totalprice < 0) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'null_custkey', CAST(count(*) FILTER (
             WHERE o_custkey IS NULL) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orphan_custkey', CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def q_orders_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit as a query: row-level constraints (nulls, ranges,
    domain, duplicate keys) in ONE conditional-aggregation pass over
    orders, plus the one check that needs a join — referential orphans via
    left-anti against customer (broadcast at dim scale). Complements the
    zero-extra-pass ``ops/checks.observe_checks`` (which rides a write
    action but cannot see cross-table constraints).

    The conditional counts are ``count(when(...))`` — not
    ``sum(when(..., 1), 0)`` — so an EMPTY orders table audits to 0
    violations per check like the oracle's ``count(*) FILTER``, instead
    of SUM's NULL (round-14 sf_empty sweep finding)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    row_checks = orders.agg(
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("bad_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "dup_orderkey"
        ),
        F.count(F.when(F.col("o_totalprice") < 0, 1)).alias(
            "negative_totalprice"
        ),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias(
            "null_custkey"
        ),
    )
    unpivoted = row_checks.selectExpr(
        "stack(4, 'bad_status', bad_status, 'dup_orderkey', dup_orderkey,"
        " 'negative_totalprice', negative_totalprice,"
        " 'null_custkey', null_custkey) AS (check_name, violations)"
    ).select("check_name", F.col("violations").cast("long"))
    orphans = (
        orders.join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("orphan_custkey").alias("check_name"), "violations")
    )
    return unpivoted.unionByName(orphans)


@query(
    "doc_weighted_sample",
    oracle="""
    WITH pr AS (
      SELECT doc_id, n_chars,
             CAST(n_chars AS DOUBLE) /
               ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000 + 1) / 1000000.0) AS p
      FROM documents
    )
    SELECT doc_id, n_chars, round(p, 6) AS priority
    FROM pr ORDER BY p DESC, doc_id LIMIT 25
    """,
)
def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sample of 25 documents by length:
    priority sampling (Duffield-Lund-Thorup) with DECLARED randomness —
    ``u`` derived from md5(doc_id), so the oracle replays the identical
    sample (``ops/sketch.weighted_priority_sample``). Map-side projection
    + TakeOrderedAndProject; no global sort at any corpus size."""
    from fxspark.ops.sketch import weighted_priority_sample

    docs = spread(load_table(spark, sf_dir, "documents"))
    return weighted_priority_sample(
        docs.select("doc_id", "n_chars"), "doc_id", "n_chars", k=25
    )


@query(
    "user_value_outliers",
    oracle="""
    WITH stats AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS ssq
      FROM events GROUP BY user_id
    ), z AS (
      SELECT e.event_id, e.user_id, e.value,
             (e.value - s / n) /
               sqrt((ssq - s * s / n) / (n - 1)) AS zscore
      FROM events e JOIN stats USING (user_id)
      WHERE n >= 3 AND (ssq - s * s / n) / (n - 1) > 0
    )
    SELECT event_id, user_id, value, round(zscore, 6) AS zscore
    FROM z WHERE abs(zscore) > 2.5
    """,
)
def q_user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flags: events whose value deviates > 2.5
    sample standard deviations from that user's mean. Moments are
    decimal-exact sums (order-independent — the built-in stddev is a
    float fold whose result depends on partitioning); the z arithmetic is
    then plain IEEE, bit-identical in any engine. One agg + one key join."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("value"), 6).alias("s"),
        exact_sum(F.col("value") * F.col("value"), 6).alias("ssq"),
    )
    var = (F.col("ssq") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(var)
    return (
        events.join(stats, "user_id")
        .filter((F.col("n") >= 3) & (var > 0))
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 2.5)
        .select(
            "event_id", "user_id", "value",
            F.round(F.col("zscore"), 6).alias("zscore"),
        )
    )


_PAGERANK_ITER = """
    r{i} AS (
      SELECT n.node,
             (1.0 - 0.85) / (SELECT n FROM params) + 0.85 * COALESCE(
               CAST(sum(CAST(r.rank * e.share AS DECIMAL(38,18))) AS DOUBLE),
               0.0) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r{prev} r ON r.node = e.src
      GROUP BY n.node
    )"""


@query(
    "nation_trade_pagerank",
    oracle="""
    WITH edges0 AS (
      SELECT cn.n_name AS src, sn.n_name AS dst,
             CAST(count(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      -- a NULL endpoint is not a node (pagerank drops such edges by
      -- contract); the oracle's LEFT JOINs would otherwise build a
      -- NULL node with a teleport-only rank.
      WHERE cn.n_name IS NOT NULL AND sn.n_name IS NOT NULL
      GROUP BY 1, 2
    ), outw AS (
      SELECT src, sum(w) AS out_w FROM edges0 GROUP BY src
    ), edges AS (
      SELECT e.src, e.dst, e.w / o.out_w AS share
      FROM edges0 e JOIN outw o ON e.src = o.src
    ), nodes AS (
      SELECT src AS node FROM edges0 UNION SELECT dst FROM edges0
    ), params AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
    ), r0 AS (
      SELECT node, 1.0 / (SELECT n FROM params) AS rank FROM nodes
    ),"""
    + ",".join(
        _PAGERANK_ITER.format(i=i, prev=i - 1) for i in range(1, 6)
    )
    + """
    SELECT node AS nation, round(rank, 6) AS pagerank FROM r5
    """,
)
def q_nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 synchronous iterations) over the
    customer-nation -> supplier-nation trade graph, edge weight = lineitem
    count (``ops/graph.pagerank``). The iterative loop localCheckpoints
    between iterations (O(1) lineage); per-node contribution sums are
    decimal-exact, so the unrolled SQL oracle replays the ranks
    bit-for-bit — the declared-determinism treatment applied to an
    iterative algorithm."""
    from fxspark.ops.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, li["l_suppkey"] == supplier["s_suppkey"])
        .join(
            nation.select(
                F.col("n_nationkey").alias("_cnk"),
                F.col("n_name").alias("src"),
            ),
            customer["c_nationkey"] == F.col("_cnk"),
        )
        .join(
            nation.select(
                F.col("n_nationkey").alias("_snk"),
                F.col("n_name").alias("dst"),
            ),
            supplier["s_nationkey"] == F.col("_snk"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        # ≤ 625 rows (nation × nation) whose lineage is the whole 6-table
        # join; pagerank's out-weight join consumes the edge frame twice
        # ABOVE its internal checkpoint, so without this the join pipeline
        # runs twice (round-11 audit, A/B 3.96 s → 2.99 s median at sf0.1).
        .localCheckpoint(eager=False)
    )
    ranks = pagerank(edges, "src", "dst", weight="w", n_iter=5, damping=0.85)
    return ranks.select(
        F.col("node").alias("nation"),
        F.round(F.col("rank"), 6).alias("pagerank"),
    )


@query(
    "bloom_decontam_candidates",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+3], ' ')
                            for i in range(1, len(t)-2)]) AS s
      FROM toks WHERE len(t) >= 4
    ), bench_grams AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 11 = 0
    ), bench_pos AS (
      SELECT DISTINCT
             ((h & 1048575) + i * (((h >> 20) & 1048575) | 1)) & 1048575 AS p
      FROM (SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
            FROM bench_grams), range(4) t(i)
    ), train AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 11 <> 0
    ), probe AS (
      SELECT doc_id, g,
             ((h & 1048575) + i * (((h >> 20) & 1048575) | 1)) & 1048575 AS p
      FROM (SELECT doc_id, g,
                   ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM train),
           range(4) t(i)
    ), cand AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidate_grams
      FROM (
        SELECT doc_id, g
        FROM probe JOIN bench_pos USING (p)
        GROUP BY doc_id, g HAVING count(*) = 4
      ) GROUP BY doc_id
    ), exact AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact_grams
      FROM train JOIN bench_grams USING (g)
      GROUP BY doc_id
    )
    SELECT cand.doc_id, cand.n_candidate_grams,
           COALESCE(exact.n_exact_grams, 0) AS n_exact_grams
    FROM cand LEFT JOIN exact ON cand.doc_id = exact.doc_id
    """,
)
def q_bloom_decontam_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination sweep
    (``ops/sketch.bloom_membership_prefilter``): the benchmark slice's
    4-grams become k=4 declared double-hash bit positions (m=2^20) — a
    compact int set broadcast to every task — and training docs report
    bloom-positive gram counts next to exact-verified counts (the gap is
    the realized false-positive rate). No false negatives by construction;
    the oracle replays the identical hash arithmetic, false positives and
    all."""
    from fxspark.ops.sketch import bloom_membership_prefilter

    docs = spread(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    train = docs.filter(F.col("doc_id") % 11 != 0)
    return bloom_membership_prefilter(train, bench, "doc_id", "text", n=4)


@query(
    "peak_concurrent_users",
    oracle="""
    WITH iv AS (
      SELECT CAST(ts AS DATE) AS d, user_id,
             min(ts) AS s, max(ts) AS e
      FROM events GROUP BY 1, 2
    ), pts AS (
      SELECT d, s AS t, 1 AS delta, user_id FROM iv
      UNION ALL
      SELECT d, e, -1, user_id FROM iv
    ), run AS (
      SELECT d,
             sum(delta) OVER (PARTITION BY d
                              ORDER BY t, delta DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS c
      FROM pts
    )
    SELECT CAST(d AS TIMESTAMP) AS day,
           CAST(max(c) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY d
    """,
)
def q_peak_concurrent_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day via the sweep-line: each user's daily
    active interval [first event, last event] becomes a +1/-1 point pair;
    the running sum's maximum is the peak number of simultaneously-active
    users (interval ends inclusive — +1 sorts before -1 at equal t). The
    window partitions by DAY, so no global single-partition sort exists at
    any scale; ties reorder only equal deltas, leaving the prefix maxima
    invariant."""
    events = load_table(spark, sf_dir, "events")
    iv = events.groupBy(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    pts = iv.select(
        "d", F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionByName(
        iv.select(
            "d", F.col("e").alias("t"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    w = (
        Window.partitionBy("d")
        .orderBy(F.col("t"), F.col("delta").desc(), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("c", F.sum("delta").over(w))
    return run.groupBy("d").agg(
        F.max("c").alias("peak_concurrent")
    ).select(
        F.col("d").cast("timestamp").alias("day"),
        F.col("peak_concurrent").cast("long").alias("peak_concurrent"),
    )


@query(
    "lang_source_chisq",
    oracle="""
    WITH obs AS (
      -- the independence test runs over LABELED documents: a NULL lang /
      -- source is a missing label, not a category (and the two engines
      -- disagree on whether distinct-counts include the NULL group).
      SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
      FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
      GROUP BY 1, 2
    ), rt AS (SELECT lang, sum(o) AS r FROM obs GROUP BY lang),
    ct AS (SELECT source, sum(o) AS c FROM obs GROUP BY source),
    n AS (SELECT sum(o) AS n FROM obs),
    cells AS (
      SELECT obs.o, rt.r * ct.c / (SELECT n FROM n) AS e
      FROM obs JOIN rt USING (lang) JOIN ct USING (source)
    )
    SELECT round(CAST(sum(CAST((o - e) * (o - e) / e AS DECIMAL(38,12)))
                 AS DOUBLE), 6) AS chi2,
           CAST(((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof
    FROM cells
    """,
)
def q_lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between document language and source —
    the corpus-composition drift check a curation pipeline runs per
    snapshot. Observed/expected from three aggregations of the same
    contingency cells (cell counts are exact integers in doubles, so the
    expected-count arithmetic is IEEE-deterministic); the final sum over
    cells is decimal-exact, making the statistic itself hash-verifiable."""
    docs = spread(load_table(spark, sf_dir, "documents")).filter(
        # labeled documents only — see the oracle note
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rt = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(rt, "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("r") * F.col("c") / F.col("n"))
    )
    chi2 = F.round(
        F.sum(
            ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
            .cast("decimal(38,12)")
        ).cast("double"),
        6,
    )
    dof = docs.agg(
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("long").alias("dof")
    )
    return cells.agg(chi2.alias("chi2")).crossJoin(F.broadcast(dof))


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      -- a sequence point needs a place (ts) and a state (event_type);
      -- rows missing either are outside the chain
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), pairs AS (
      SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ), totals AS (
      SELECT prev_type, sum(n) AS tot FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.event_type, p.n,
           round(p.n / CAST(t.tot AS DOUBLE), 6) AS prob
    FROM pairs p JOIN totals t USING (prev_type)
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (lag window keyed by user, then a state-pair count + row-normalized
    probabilities) — the sequence-mining staple behind next-action
    prediction and anomalous-flow detection. The window partitions on
    user_id (near-unique, no skew); the pair aggregation's key domain is
    |event types|^2, broadcast-sized at any corpus scale."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n") / F.col("tot").cast("double"), 6).alias(
                "prob"
            ),
        )
    )


@query(
    "trade_triangles",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT least(cn.n_name, sn.n_name) AS a,
             greatest(cn.n_name, sn.n_name) AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE cn.n_name <> sn.n_name
    )
    SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
    FROM e0 e1
    JOIN e0 e2 ON e2.a = e1.b
    JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the undirected nation trade graph — the
    graph-analytics cohesion primitive (clustering coefficient, community
    seeds). Edges are canonicalized (least, greatest) so each triangle
    is emitted exactly once with n1 < n2 < n3; the standard two-join
    enumeration keeps candidate growth bounded by the ordered-edge
    orientation (every join key is the smaller endpoint — the classic
    degree-ordering trick that caps skew at high-degree hubs)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, li["l_suppkey"] == supplier["s_suppkey"])
        .join(
            nation.select(
                F.col("n_nationkey").alias("_cnk"),
                F.col("n_name").alias("_cn"),
            ),
            customer["c_nationkey"] == F.col("_cnk"),
        )
        .join(
            nation.select(
                F.col("n_nationkey").alias("_snk"),
                F.col("n_name").alias("_sn"),
            ),
            supplier["s_nationkey"] == F.col("_snk"),
        )
        .filter(F.col("_cn") != F.col("_sn"))
    )
    # ≤ C(25,2) = 300 rows, but its lineage is the whole 6-table join —
    # checkpointed so the three triple-join branches below don't each
    # re-run it (18 base scans in the executed plan otherwise)
    edges = (
        base.select(
            F.least("_cn", "_sn").alias("a"),
            F.greatest("_cn", "_sn").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1 = edges.select(F.col("a").alias("n1"), F.col("b").alias("n2"))
    e2 = edges.select(F.col("a").alias("n2"), F.col("b").alias("n3"))
    e3 = edges.select(F.col("a").alias("n1"), F.col("b").alias("n3"))
    return e1.join(e2, "n2").join(e3, ["n1", "n3"]).select("n1", "n2", "n3")


@query(
    "doc_bm25_search",
    oracle="""
    WITH toks AS (
      -- the BM25 corpus is the TOKENIZABLE documents: a NULL text has no
      -- tokens (and Spark's size(NULL) would read -1 into the length sum)
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS t
      FROM documents WHERE text IS NOT NULL
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS DOUBLE) AS len FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(CAST(len AS DECIMAL(38,4))) AS DOUBLE) AS total_len
      FROM dl
    ), tf AS (
      SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS f
      FROM toks WHERE t IN ('data', 'model', 'quality') GROUP BY doc_id, t
    ), df AS (
      SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t
    ), scored AS (
      SELECT tf.doc_id,
             CAST(sum(CAST(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.f * 2.2
               / (tf.f + 1.2 * (1.0 - 0.75 + 0.75 * dl.len
                                / (stats.total_len / stats.n_docs)))
             AS DECIMAL(38,12))) AS DOUBLE) AS score
      FROM tf
      JOIN df USING (t)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q_doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text retrieval (k1=1.2, b=0.75): top-20 documents for the
    query terms {data, model, quality} — the lexical-retrieval baseline
    every RAG/dedup pipeline wants next to the embedding tiers.

    Scale shape: the token stream is FILTERED to the query terms before any
    aggregation (predicate on the exploded token — corpus-sized input, but
    query-term-sized aggregate state), df/idf and the corpus stats are
    broadcast scalars, and the final top-k is TakeOrderedAndProject. Score
    sums are decimal-exact; ln is bit-stable across engines (same pattern
    the driver-green surprisal/bigram queries rely on).

    Precondition: ``doc_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — duplicate ids double
    tf and doc-length rows; sf_dups boundary)."""
    from fxspark.ops.text import tokens as _tok

    k1, b = 1.2, 0.75
    terms = ["data", "model", "quality"]
    docs = require_unique(
        spread(load_table(spark, sf_dir, "documents")), "doc_id",
        context="doc_bm25_search",
    ).filter(
        F.col("text").isNotNull()  # see oracle note
    )
    toks = docs.select(
        "doc_id", F.explode(_tok(F.col("text"))).alias("t")
    )
    # doc length is size(tokens) map-side — no explode, no shuffle
    dl = docs.select(
        "doc_id", F.size(_tok(F.col("text"))).cast("double").alias("len")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        exact_sum(F.col("len"), 4).alias("total_len"),
    )
    tf = (
        toks.filter(F.col("t").isin(*terms))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("f"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("f") + k1 * (
        1.0 - b + b * F.col("len") / (F.col("total_len") / F.col("n_docs"))
    )
    scored = (
        tf.join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", idf * F.col("f") * (k1 + 1.0) / denom)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("_s").cast("decimal(38,12)"))
            .cast("double")
            .alias("score")
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )


@query(
    "value_histogram",
    oracle="""
    WITH b AS (
      SELECT min(value) AS lo, max(value) AS hi FROM events
    ), binned AS (
      SELECT CAST(least(floor((value - b.lo) / ((b.hi - b.lo) / 20.0)), 19)
             AS BIGINT) AS bin
      FROM events CROSS JOIN b
    )
    SELECT bin,
           round((SELECT lo FROM b) + bin * (((SELECT hi FROM b)
                 - (SELECT lo FROM b)) / 20.0), 6) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY bin
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of event values: global min/max as a
    broadcast scalar (one partial-combined agg), then a map-side bin
    projection + bin-keyed count — two scans, no sort, 20-row output at
    any input size. The max value clamps into the last bin (least(...,19)),
    the standard closed-top-bin convention. Bin arithmetic is plain IEEE
    (sub/div/floor), bit-identical in both engines. try_divide, not ``/``:
    a SINGLE-VALUED input makes the bin width 0, where DuckDB's division
    yields NULL (and both engines' least() then skips it → bin 19) but
    Spark's ANSI division throws — round-14 sf_unit registry sweep."""
    events = load_table(spark, sf_dir, "events")
    b = events.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    binned = events.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor(F.try_divide(F.col("value") - F.col("lo"), width)),
            F.lit(19),
        ).cast("long").alias("bin"),
        F.col("lo"),
        width.alias("w"),
    )
    return (
        binned.groupBy("bin", "lo", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.col("lo") + F.col("bin") * F.col("w"), 6).alias(
                "bin_lo"
            ),
            "n",
        )
    )


@query(
    "events_key_skew_report",
    oracle="""
    WITH kc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(max(c) AS BIGINT) AS max_c FROM kc
    ), cc AS (
      SELECT c, CAST(count(*) AS BIGINT) AS m FROM kc GROUP BY c
    ), cc2 AS (
      SELECT c, m,
             COALESCE(sum(m) OVER (ORDER BY c
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS start
      FROM cc
    ), s AS (
      SELECT CAST(sum(CAST(c * (m * start + (m * (m + 1)) // 2)
                   AS DECIMAL(38,0))) AS DOUBLE) AS rank_weighted
      FROM cc2
    )
    SELECT tot.n_keys, tot.n_rows,
           round(tot.max_c / CAST(tot.n_rows AS DOUBLE), 6) AS top_key_share,
           round(tot.n_rows / CAST(tot.n_keys AS DOUBLE), 6) AS mean_per_key,
           round((2.0 * (SELECT rank_weighted FROM s)
                  - (tot.n_keys + 1) * CAST(tot.n_rows AS DOUBLE))
                 / (tot.n_keys * CAST(tot.n_rows AS DOUBLE)), 6) AS gini
    FROM tot
    """,
)
def q_events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics for a prospective shuffle key: key count, row
    count, hottest key's row share, mean rows/key, and the Gini coefficient
    of the per-key distribution (0 = uniform, ->1 = one key owns
    everything) — the report that decides between a plain shuffle, AQE
    skew-join, or explicit salting (``ops/joins.salted_join``) BEFORE a
    100 TB job runs. The heavy input collapses to one row per key
    immediately (partial-combined count), then to COUNT-OF-COUNTS (one row
    per distinct frequency) before the Gini rank arithmetic — keys sharing
    a frequency contribute a closed-form rank-range sum (ranks within a
    tie are interchangeable), so the only window runs over the distinct
    frequency values, a domain orders of magnitude below the key count.
    All rank terms are integer-exact (DECIMAL(38,0) sum)."""
    events = load_table(spark, sf_dir, "events")
    kc = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    tot = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_c"),
    )
    cc = kc.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
    w = (
        Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cc2 = cc.withColumn(
        "start", F.coalesce(F.sum("m").over(w), F.lit(0))
    )
    term = F.col("c") * (
        F.col("m") * F.col("start")
        + F.expr("(m * (m + 1)) DIV 2")
    )
    s = cc2.agg(
        F.sum(term.cast("decimal(38,0)"))
        .cast("double")
        .alias("rank_weighted")
    )
    return (
        tot.crossJoin(F.broadcast(s))
        .select(
            "n_keys",
            "n_rows",
            F.round(
                F.col("max_c") / F.col("n_rows").cast("double"), 6
            ).alias("top_key_share"),
            F.round(
                F.col("n_rows") / F.col("n_keys").cast("double"), 6
            ).alias("mean_per_key"),
            F.round(
                (
                    2.0 * F.col("rank_weighted")
                    - (F.col("n_keys") + 1)
                    * F.col("n_rows").cast("double")
                )
                / (F.col("n_keys") * F.col("n_rows").cast("double")),
                6,
            ).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 second wave: closed-form model fits, drift detection, cohort
# analytics, association rules — the classic warehouse/curation surface the
# reference's latest-vs-previous report (Fx_1min.py:208-216) is the germ of.
# ---------------------------------------------------------------------------

# Epoch of 2024-01-01 00:00:00 UTC — the x-origin for trend fits (keeps the
# sufficient statistics small enough for DECIMAL(38,6) exactness).
_X0 = 1704067200


@query(
    "user_value_trend",
    oracle=f"""
    WITH s AS (
      SELECT user_id, count(*) AS n_obs,
             CAST(sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_X0} AS DECIMAL(38,0)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST((CAST(floor(epoch(ts)) AS BIGINT) - {_X0}) * value
                           AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST((CAST(floor(epoch(ts)) AS BIGINT) - {_X0})
                           * (CAST(floor(epoch(ts)) AS BIGINT) - {_X0})
                           AS DECIMAL(38,0))) AS DOUBLE) AS sxx
      FROM events GROUP BY user_id
    ), f AS (
      SELECT user_id, n_obs, sx, sy,
             CASE WHEN n_obs * sxx - sx * sx > 0
                  THEN (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx)
             END AS sl
      FROM s
    )
    SELECT user_id, n_obs,
           round(sl * 86400, 6) AS slope_per_day,
           round((sy - sl * sx) / n_obs, 6) AS intercept
    FROM f
    """,
)
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of ``value`` over time (``ops/stats.grouped_ols``):
    slope scaled to per-day units plus the fit intercept. One
    partial-aggregated groupBy computing five exact-decimal sufficient
    statistics — the same shuffle as a plain rollup, so the fit costs what a
    count does at 100 TB. The reference stops at last-vs-previous deltas;
    this is the closed-form regression a monitoring tier runs instead."""
    from fxspark.ops.stats import grouped_ols

    events = load_table(spark, sf_dir, "events")
    fit = grouped_ols(
        events,
        "user_id",
        x=F.unix_timestamp("ts") - F.lit(_X0),
        y=F.col("value"),
    )
    return fit.select(
        "user_id",
        "n_obs",
        F.round(F.col("slope") * 86400, 6).alias("slope_per_day"),
        F.round("intercept", 6).alias("intercept"),
    )


@query(
    "user_value_cusum",
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS vsum,
             CAST(count(*) AS DECIMAL(8,0)) AS n
      -- chart over OBSERVED events: NULL-ts (unplaceable) and NULL-value
      -- (missing observation) rows are outside the chart domain
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id
    ), e AS (
      SELECT e.user_id, e.ts, e.event_id, e.value, m.n,
             CAST(CAST(CAST(e.value AS DECIMAL(18,6)) * m.n AS DECIMAL(28,6))
                  - m.vsum
                  - CAST(m.n * CAST(10.0 AS DECIMAL(4,1)) AS DECIMAL(14,1))
                  AS DECIMAL(30,6)) AS ei
      FROM events e JOIN m USING (user_id)
      WHERE e.ts IS NOT NULL AND e.value IS NOT NULL
    ), c1 AS (
      SELECT user_id, ts, event_id, value, n,
             sum(ei) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS cum
      FROM e
    ), c AS (
      SELECT user_id, ts, event_id, value, n, cum,
             least(CAST(0 AS DECIMAL(38,6)),
                   min(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING)) AS low
      FROM c1
    )
    SELECT user_id, ts, event_id, value,
           (CAST(cum AS DOUBLE) - CAST(low AS DOUBLE))
             / CAST(n AS DOUBLE) AS cusum
    FROM c
    WHERE (CAST(cum AS DOUBLE) - CAST(low AS DOUBLE))
            / CAST(n AS DOUBLE) > 120.0
    """,
)
def q_user_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift alerts per user: rows where the cumulative
    positive deviation from the user's own mean (slack 10, threshold 120)
    is in alarm. Same running-sum-minus-low-water-mark closed form as
    ``ops/windows.keyed_cusum`` (two stacked windows, one key shuffle, no
    per-key state), but in the n-SCALED exact algebra: the per-user mean is
    a quotient, and deviations against a quotient would round through a
    double -> decimal cast that engines disagree on in the last decimal
    ulp, so the chart is computed on ``n·value − Σvalue − n·slack`` — every
    term an exact decimal product — and only divided back by n (pure IEEE,
    identical everywhere) at the output."""
    events = load_table(spark, sf_dir, "events").filter(
        # chart over OBSERVED events — see the oracle note
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    m = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .alias("_vsum"),
        F.count(F.lit(1)).cast("decimal(8,0)").alias("_n"),
    )
    ei = (
        (F.col("value").cast("decimal(18,6)") * F.col("_n")).cast(
            "decimal(28,6)"
        )
        - F.col("_vsum")
        - (F.col("_n") * F.lit(10.0).cast("decimal(4,1)")).cast(
            "decimal(14,1)"
        )
    ).cast("decimal(30,6)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        events.join(m, "user_id")
        .withColumn("_cum", F.sum(ei.alias("_ei")).over(w))
    )
    low = F.least(
        F.lit(0).cast("decimal(38,6)"), F.min("_cum").over(w)
    )
    cusum = (
        F.col("_cum").cast("double") - low.cast("double")
    ) / F.col("_n").cast("double")
    return (
        d.withColumn("cusum", cusum)
        .filter(F.col("cusum") > 120.0)
        .select("user_id", "ts", "event_id", "value", "cusum")
    )


@query(
    "customer_cohort_ltv",
    oracle="""
    WITH first_o AS (
      -- undated orders can neither open a cohort nor land in a month
      -- offset; excluded throughout
      SELECT o_custkey,
             date_trunc('month', min(o_orderdate)) AS cohort
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY o_custkey
    ), size_c AS (
      SELECT cohort, count(*) AS n_customers FROM first_o GROUP BY cohort
    ), rev AS (
      SELECT f.cohort,
             datediff('month', f.cohort,
                      date_trunc('month', o.o_orderdate)) AS month_offset,
             count(*) AS n_orders,
             sum(CAST(o.o_totalprice AS DECIMAL(38,4))) AS revd
      FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
      WHERE o.o_orderdate IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT r.cohort, r.month_offset, s.n_customers, r.n_orders,
           CAST(r.revd AS DOUBLE) AS revenue,
           -- RAW quotient (exact-decimal running sum / exact count):
           -- bit-identical both engines; ROUND(double, 6) splits on the
           -- 1e-6 halves cumulative-revenue/headcount quotients hit (D22)
           CAST(sum(r.revd) OVER (PARTITION BY r.cohort
                                  ORDER BY r.month_offset
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / s.n_customers AS cum_ltv_per_customer
    FROM rev r JOIN size_c s ON r.cohort = s.cohort
    """,
)
def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers cohorted by first-order
    month, revenue accumulated by month offset, LTV per cohort customer.
    The first-order agg and the revenue agg shuffle on the SAME key
    (custkey) — one exchange reused; the cumulative window runs over the
    tiny (cohort × offset) matrix, and cohort sizes broadcast-join back.
    Exact-decimal revenue so the running LTV is partitioning-independent."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()  # see oracle note
    )
    first_o = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    size_c = first_o.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rev = (
        orders.join(first_o, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")), F.col("cohort")
            )
            .cast("int")
            .alias("month_offset"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("_revd"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(F.broadcast(size_c), "cohort")
        .withColumn("_cum", F.sum("_revd").over(w))
        .select(
            "cohort",
            "month_offset",
            "n_customers",
            "n_orders",
            F.col("_revd").cast("double").alias("revenue"),
            # raw quotient — see the oracle's D22 note
            (F.col("_cum").cast("double") / F.col("n_customers"))
            .alias("cum_ltv_per_customer"),
        )
    )


@query(
    "basket_brand_lift",
    oracle="""
    WITH bk AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), n AS (
      SELECT count(DISTINCT o) AS n_orders FROM bk
    ), c AS (
      SELECT brand, count(*) AS cnt FROM bk GROUP BY brand
    ), p AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS pair_cnt
      FROM bk a JOIN bk b ON a.o = b.o AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT p.brand_a, p.brand_b, p.pair_cnt,
           round(CAST(p.pair_cnt AS DOUBLE) / n.n_orders, 6) AS support,
           round(CAST(p.pair_cnt AS DOUBLE) / ca.cnt, 6) AS confidence,
           round(CAST(p.pair_cnt AS DOUBLE) * n.n_orders
                 / (CAST(ca.cnt AS DOUBLE) * cb.cnt), 6) AS lift
    FROM p
    JOIN c ca ON ca.brand = p.brand_a
    JOIN c cb ON cb.brand = p.brand_b
    CROSS JOIN n
    WHERE p.pair_cnt >= 5
    """,
)
def q_basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: support,
    confidence and lift for every co-purchased brand pair seen in >= 5
    orders. The basket frame (order, brand) is deduped map-side then
    self-joined ON THE ORDER KEY — co-partitioned, so pair generation is
    one shuffle and is bounded by sum(basket_size²), never |orders|²; brand
    marginals broadcast back. Pure integer-ratio arithmetic — exact in any
    engine. The A-priori support threshold applies AFTER pair counting
    because pair cardinality (brand²=625) is tiny; at a million-SKU
    catalogue the same plan takes a pre-filter on item marginals first."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bk = (
        lineitem.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("brand"))
        .distinct()
        # five consumers below (denominator, marginals, both self-join
        # sides) — without the checkpoint each re-runs the join+dedup
        # (10 base scans in the executed plan)
        .localCheckpoint(eager=False)
    )
    n_orders = bk.agg(F.countDistinct("o").alias("n_orders"))
    c = bk.groupBy("brand").agg(F.count(F.lit(1)).alias("cnt"))
    a = bk.alias("a")
    b = bk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 5)
    )
    ca = c.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("_ca"))
    cb = c.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("_cb"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            F.round(
                F.col("pair_cnt").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            F.round(
                F.col("pair_cnt").cast("double") / F.col("_ca"), 6
            ).alias("confidence"),
            F.round(
                F.col("pair_cnt").cast("double")
                * F.col("n_orders")
                / (F.col("_ca").cast("double") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "user_value_interp",
    oracle="""
    WITH clean AS (
      SELECT user_id, ts, value FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
    ), span AS (
      SELECT user_id,
             CAST(epoch_us(min(ts)) AS BIGINT) AS lo,
             CAST(epoch_us(max(ts)) AS BIGINT) AS hi
      FROM clean GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(((lo + 21599999999) // 21600000000)
                                      * 21600000000,
                                    (hi // 21600000000) * 21600000000,
                                    21600000000)) AS us,
             1 AS is_grid, CAST(NULL AS DOUBLE) AS v
      FROM span
    ), obs AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, 0 AS is_grid,
             value AS v
      FROM clean
    ), u AS (
      SELECT * FROM obs UNION ALL BY NAME SELECT * FROM grid
    ), sw AS (
      SELECT user_id, us, is_grid,
             last_value(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS)
               OVER wp AS p_us,
             last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER wp AS p_v,
             first_value(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS)
               OVER wf AS n_us,
             first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER wf AS n_v
      FROM u
      WINDOW wp AS (PARTITION BY user_id ORDER BY us, is_grid, v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY us, is_grid, v
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, make_timestamp(us) AS grid_ts,
           CASE WHEN p_us = us THEN p_v
                ELSE p_v + (n_v - p_v) * (CAST(us - p_us AS DOUBLE)
                                          / CAST(n_us - p_us AS DOUBLE))
           END AS value
    FROM sw
    WHERE is_grid = 1 AND p_us IS NOT NULL
      AND (p_us = us OR n_us IS NOT NULL)
    """,
)
def q_user_value_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's irregular value series resampled onto an epoch-aligned
    6-hour grid with linear interpolation (``ops/windows.grid_interpolate``)
    — the exact-interpolation sibling of ``user_value_locf``. Grid points
    are generated map-side from each key's span (no spine join), neighbours
    come from one ignore-nulls window sweep over the obs+grid union, and
    the weight is a ratio of exact epoch-microseconds, so the doubles are
    bit-identical cross-engine without any rounding."""
    from fxspark.ops.windows import grid_interpolate

    events = load_table(spark, sf_dir, "events")
    return grid_interpolate(
        events, "user_id", "ts", "value", step_seconds=21600
    )


@query(
    "doc_hashed_features",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS t
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 64 AS bucket,
             CAST(('0x' || substr(md5(t), 16, 1)) AS BIGINT) % 2 * 2 - 1
               AS sign
      FROM toks
    )
    SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS weight
    FROM h GROUP BY doc_id, bucket
    HAVING CAST(sum(sign) AS BIGINT) <> 0
    """,
)
def q_doc_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing of the document corpus
    (``ops/text.hashed_features``): 64-dimensional vocabulary-free
    bag-of-words, bucket and ±1 sign both drawn from the engine-portable
    md5 family — the fixed-width representation a distributed linear model
    trains on without ever building a dictionary. Map-side explode + one
    partial-combined groupBy on (doc, bucket); sparse zero entries drop."""
    from fxspark.ops.text import hashed_features

    docs = spread(load_table(spark, sf_dir, "documents"))
    return hashed_features(docs, "doc_id", "text", n_buckets=64)


@query(
    "supplier_part_jaccard",
    oracle="""
    WITH sp AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), sz AS (
      SELECT s, count(*) AS c FROM sp GROUP BY s
    ), pairs AS (
      SELECT a.s AS supp_a, b.s AS supp_b, count(*) AS shared
      FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    )
    SELECT p.supp_a, p.supp_b, p.shared,
           ca.c + cb.c - p.shared AS union_cnt,
           round(CAST(p.shared AS DOUBLE) / (ca.c + cb.c - p.shared), 6)
             AS jaccard
    FROM pairs p
    JOIN sz ca ON ca.s = p.supp_a
    JOIN sz cb ON cb.s = p.supp_b
    WHERE p.shared >= 150
    """,
)
def q_supplier_part_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-similarity by shared part catalogue: Jaccard of part sets
    for every supplier pair co-occurring on >= 150 parts — the
    bipartite-projection node-similarity op (who could substitute for
    whom). Pair generation goes through the part-keyed inverted index
    (co-partitioned self-join on the part), so candidates are bounded by
    sum(suppliers-per-part²), never |suppliers|²; set sizes broadcast back
    and the Jaccard is an exact integer ratio. On a skewed catalogue the
    hot-part fan-out caps the same way ``doc_jaccard_pairs_capped`` caps
    its posting lists."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    sp = lineitem.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    sz = sp.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    a, b = sp.alias("a"), sp.alias("b")
    pairs = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(
            F.col("a.s").alias("supp_a"), F.col("b.s").alias("supp_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 150)
    )
    ca = sz.select(F.col("s").alias("supp_a"), F.col("c").alias("_ca"))
    cb = sz.select(F.col("s").alias("supp_b"), F.col("c").alias("_cb"))
    return (
        pairs.join(F.broadcast(ca), "supp_a")
        .join(F.broadcast(cb), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "shared",
            (F.col("_ca") + F.col("_cb") - F.col("shared")).alias("union_cnt"),
            F.round(
                F.col("shared").cast("double")
                / (F.col("_ca") + F.col("_cb") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "part_price_skyline",
    oracle="""
    -- NULL-coordinate rows are outside the dominance order (skyline2d
    -- drops them by contract); NOT EXISTS alone would admit every such
    -- row, since NULL comparisons never satisfy the inner predicate.
    SELECT p_partkey, p_brand, p_retailprice, p_size
    FROM part a
    WHERE a.p_retailprice IS NOT NULL AND a.p_size IS NOT NULL
      AND NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def q_part_price_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of the part catalogue — cheapest price for the
    largest size (``ops/skyline.skyline2d``): the bucketed two-phase sweep
    (per-bucket running max seeded by the earlier buckets' prefix max)
    replaces both the O(n²) dominance self-join the ORACLE deliberately
    keeps — an independent formulation, not a mirror — and the
    single-partition global-window sort. Prices scale to exact cents so
    the sweep's comparisons are integer."""
    from fxspark.ops.skyline import skyline2d

    part = load_table(spark, sf_dir, "part")
    d = part.withColumn(
        "_cents", F.round(F.col("p_retailprice") * 100).cast("long")
    )
    return skyline2d(d, "_cents", "p_size", n_buckets=32).select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )


@query(
    "stream_cdc_replay",
    oracle="""
    WITH b1 AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-11 00:00:00'
      ) WHERE rn = 1
    ), c1 AS (
      SELECT user_id, 'insert' AS change_type,
             CAST(NULL AS TIMESTAMP) AS old_ts,
             CAST(NULL AS DOUBLE) AS old_value,
             ts AS new_ts, value AS new_value, 0 AS batch_id
      FROM b1
    ), s1 AS (SELECT * FROM b1),
    b2 AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
                      AND ts < TIMESTAMP '2024-01-21 00:00:00'
      ) WHERE rn = 1
    ), c2 AS (
      SELECT b.user_id,
             CASE WHEN s.user_id IS NULL THEN 'insert'
                  WHEN NOT (s.ts IS NOT DISTINCT FROM b.ts
                            AND s.value IS NOT DISTINCT FROM b.value)
                  THEN 'update' END AS change_type,
             s.ts AS old_ts, s.value AS old_value,
             b.ts AS new_ts, b.value AS new_value, 1 AS batch_id
      FROM b2 b LEFT JOIN s1 s USING (user_id)
      WHERE s.user_id IS NULL
         OR NOT (s.ts IS NOT DISTINCT FROM b.ts
                 AND s.value IS NOT DISTINCT FROM b.value)
    ), s2 AS (
      SELECT * FROM s1 WHERE user_id NOT IN (SELECT user_id FROM b2)
      UNION ALL SELECT * FROM b2
    ), b3 AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
      ) WHERE rn = 1
    ), c3 AS (
      SELECT b.user_id,
             CASE WHEN s.user_id IS NULL THEN 'insert'
                  WHEN NOT (s.ts IS NOT DISTINCT FROM b.ts
                            AND s.value IS NOT DISTINCT FROM b.value)
                  THEN 'update' END AS change_type,
             s.ts AS old_ts, s.value AS old_value,
             b.ts AS new_ts, b.value AS new_value, 2 AS batch_id
      FROM b3 b LEFT JOIN s2 s USING (user_id)
      WHERE s.user_id IS NULL
         OR NOT (s.ts IS NOT DISTINCT FROM b.ts
                 AND s.value IS NOT DISTINCT FROM b.value)
    )
    SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3
    """,
)
def q_stream_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming.cdc.cdc_stream``'s per-micro-batch body
    (latest-per-key reduce → key-restricted ``snapshot_diff`` vs the store
    → LWW merge) with DETERMINISTIC batch boundaries — the events table
    split into three ten-day windows plays three micro-batches, so the full
    change log (insert/update rows with batch_id) is oracle-hashable, not
    just the final store. Composes the exact operators the streaming
    foreachBatch calls (``ops.latest.dedup_latest``,
    ``ops.cdc.snapshot_diff``); deletes never appear because absence from a
    micro-batch means "no news" (the tombstone convention), which the
    oracle's insert/update-only CASE mirrors."""
    from fxspark.ops.cdc import snapshot_diff
    from fxspark.ops.latest import dedup_latest

    events = load_table(spark, sf_dir, "events")
    bounds = [
        (None, "2024-01-11 00:00:00"),
        ("2024-01-11 00:00:00", "2024-01-21 00:00:00"),
        ("2024-01-21 00:00:00", None),
    ]
    store = None
    out = None
    for i, (lo, hi) in enumerate(bounds):
        batch = events
        if lo is not None:
            batch = batch.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            batch = batch.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
        latest = dedup_latest(batch, "user_id", ["ts", "event_id"]).select(
            "user_id", "ts", "value"
        )
        if store is None:
            changes = snapshot_diff(
                latest.limit(0), latest, "user_id", ["ts", "value"]
            )
            store = latest
        else:
            old_state = store.join(
                latest.select("user_id"), "user_id", "left_semi"
            )
            changes = snapshot_diff(
                old_state, latest, "user_id", ["ts", "value"]
            )
            store = store.join(
                latest.select("user_id"), "user_id", "left_anti"
            ).unionByName(latest)
        changes = changes.withColumn("batch_id", F.lit(i))
        out = changes if out is None else out.unionByName(changes)
    return out


_L2_SQL = (
    "list_sum(list_apply(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2])))"
)


def _kmeans_seed(sf_dir: str | None = None) -> list[list[float]] | None:
    """The k-means seed codebook: the 8 lowest-vec_id embeddings of the
    corpus being clustered (the ``_semantic_dedup_oracle`` literal-codebook
    discipline) so both engines iterate from identical doubles.  The query
    resolves the seed from ITS OWN ``sf_dir`` at run time; only the oracle
    string, generated once at import, falls back to the env-declared
    ``FXSPARK_ORACLE_SF_DIR`` (default sf0.01 — the driver's gate scale, so
    the two resolutions agree where the oracle actually runs)."""
    try:
        import pyarrow.parquet as pq

        if sf_dir is None:
            sf_dir = os.environ.get(
                "FXSPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01"
            )
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_by("vec_id")
        return [
            [float(x) for x in v]
            for v in t.column("embedding").to_pylist()
            if v is not None
        ][:8]
    except Exception:  # noqa: BLE001 — no fixture ⇒ honest rows-only check
        return None


def _kmeans_oracle() -> str | None:
    seed = _kmeans_seed()
    # `not seed` also covers the EMPTY fixture (zero embeddings ⇒ zero
    # seed rows): there is no SQL VALUES list for an empty codebook, so
    # the check honestly degrades to rows-only (round-14 degenerate sweep).
    if not seed:
        return None
    vals = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(seed)
    )
    d1 = _L2_SQL.format(a="e.emb", b="cv")
    return f"""
    WITH e AS (SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings
               WHERE embedding IS NOT NULL),
    c0(cell, cv) AS (VALUES {vals}),
    a1 AS (
      SELECT vec_id, emb,
             (SELECT cell FROM c0 ORDER BY {d1} ASC, cell ASC LIMIT 1) AS cell
      FROM e),
    u1 AS (
      SELECT cell, g.i AS pos,
             CAST(sum(CAST(emb[g.i] AS DECIMAL(30,10))) AS DOUBLE)
               / count(*) AS c
      FROM a1, generate_series(1, 64) g(i) GROUP BY cell, g.i),
    c1 AS (SELECT cell, list(c ORDER BY pos) AS cv FROM u1 GROUP BY cell),
    a2 AS (
      SELECT vec_id, emb,
             (SELECT cell FROM c1 ORDER BY {d1} ASC, cell ASC LIMIT 1) AS cell
      FROM e),
    u2 AS (
      SELECT cell, g.i AS pos,
             CAST(sum(CAST(emb[g.i] AS DECIMAL(30,10))) AS DOUBLE)
               / count(*) AS c
      FROM a2, generate_series(1, 64) g(i) GROUP BY cell, g.i),
    c2 AS (SELECT cell, list(c ORDER BY pos) AS cv FROM u2 GROUP BY cell),
    l2 AS (
      SELECT cell,
             round(sqrt(CAST(sum(CAST(c * c AS DECIMAL(38,12))) AS DOUBLE)),
                   6) AS centroid_l2
      FROM u2 GROUP BY cell),
    a3 AS (
      SELECT vec_id,
             (SELECT cell FROM c2 ORDER BY {d1} ASC, cell ASC LIMIT 1) AS cell,
             (SELECT min({d1}) FROM c2) AS dist
      FROM e)
    SELECT a.cell, count(*) AS n_vecs,
           round(CAST(sum(CAST(a.dist AS DECIMAL(38,9))) AS DOUBLE), 6)
             AS inertia,
           max(l2.centroid_l2) AS centroid_l2
    FROM a3 a JOIN l2 ON l2.cell = a.cell
    GROUP BY a.cell
    """


@query("embedding_kmeans_iters", oracle=_kmeans_oracle())
def q_embedding_kmeans_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full distributed Lloyd's iterations over the embedding corpus
    (``ops/similarity.kmeans_lloyd``) from the declared lowest-vec_id seed
    codebook, reporting per-cell size, inertia and centroid norm. The
    oracle replays BOTH iterations in SQL — assignment as a correlated
    argmin over the same literal seeds, updates as exact-decimal per-dim
    means — so the cross-iteration float propagation of an iterative ML
    training loop is pinned bit-for-bit, the same discipline that makes
    the IVF/SemDeDup codebooks hash-checkable."""
    import pyarrow.parquet as pq  # noqa: F401 — fixture presence gate

    from fxspark.ops.similarity import kmeans_lloyd

    seed = _kmeans_seed(sf_dir)
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    if seed is None:  # no local fixture: derive seed in-engine
        rows = (
            emb.filter(F.col("embedding").isNotNull())
            .orderBy("vec_id")
            .limit(8)
            .select("vec_id", "embedding")
            .collect()
        )
        seed = [[float(x) for x in r["embedding"]] for r in rows]
    cent0 = spark.createDataFrame(
        [(i, c) for i, c in enumerate(seed)], "cell int, cv array<double>"
    )
    return kmeans_lloyd(emb, "vec_id", "embedding", cent0, iters=2)


# ---------------------------------------------------------------------------
# Round-6 wave: the round-5 operator backlog wrapped as oracle-twinned
# queries — attribution (last-touch + linear), Fellegi-Sunter record
# linkage over blocked pairs, the generic table profiler, maintained OLS,
# robust-z outliers, Zipf corpus fit, stateful-streaming replay twins, and
# tokenizer fertility by language.
# ---------------------------------------------------------------------------


@query(
    "purchase_attribution",
    oracle="""
    SELECT p.user_id, p.ts AS conversion_ts,
           t.event_type AS touch_type, t.ts AS touch_ts,
           p.value AS conversion_value
    FROM events p LEFT JOIN LATERAL (
      SELECT ts, event_type FROM events t
      WHERE t.user_id = p.user_id AND t.event_type IN ('click', 'view')
        AND t.ts <= p.ts AND t.ts >= p.ts - INTERVAL 1 HOUR
      ORDER BY t.ts DESC, t.event_id DESC LIMIT 1
    ) t ON TRUE
    WHERE p.event_type = 'purchase' AND p.ts IS NOT NULL
    """,
)
def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution (``ops/windows.attribute_conversions``): each
    purchase credited to the same user's most recent click/view within the
    preceding hour, NULL touch = organic. One as-of pass (tagged union +
    running window — a single (key, time) sort-shuffle, linear in events,
    the scale shape the oracle's correlated LATERAL cannot have), with the
    ``event_id`` tiebreak making equal-timestamp touches deterministic —
    the generalization of the reference's latest-before argmax family
    (``/root/reference/Fx_1min.py:190-196``) to marketing credit."""
    from fxspark.ops.windows import attribute_conversions

    events = load_table(spark, sf_dir, "events")
    return attribute_conversions(
        events,
        "user_id",
        ts_col="ts",
        type_col="event_type",
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback=F.expr("INTERVAL 1 HOUR"),
        value_col="value",
        tiebreak_col="event_id",
    ).select(
        "user_id",
        "conversion_ts",
        "touch_type",
        "touch_ts",
        F.col("conversion_value"),
    )


@query(
    "purchase_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS conversion_id, ts AS conversion_ts,
             value AS conversion_value
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, event_id AS touch_id, ts AS touch_ts,
             event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
      SELECT p.user_id, p.conversion_id, p.conversion_ts,
             p.conversion_value, t.touch_id, t.touch_ts, t.touch_type
      FROM p JOIN t USING (user_id)
      WHERE t.touch_ts <= p.conversion_ts
        AND t.touch_ts >= p.conversion_ts - INTERVAL 1 HOUR
    )
    SELECT user_id, conversion_id, conversion_ts, conversion_value,
           touch_id, touch_ts, touch_type,
           1.0 / count(*) OVER (PARTITION BY user_id, conversion_id)
             AS credit,
           conversion_value
             * (1.0 / count(*) OVER (PARTITION BY user_id, conversion_id))
             AS attributed_value
    FROM j
    """,
)
def q_purchase_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution (``ops/windows.attribute_linear``):
    every click/view in the hour before a purchase shares the credit
    1/n_touches, and the purchase value splits by it. Candidate pairs come
    from the binned interval range join (``ops/asof.range_join`` — each
    side bucketed into tolerance-wide time bins, ±1-bin equi-join, exact
    filter: linear shuffle, never the oracle's theta-join cross product);
    the split is a count window over each conversion's touch group, bounded
    by touches-per-hour. Credit is an integer-ratio double (1.0/n), so both
    engines divide the same exact operands."""
    from fxspark.ops.windows import attribute_linear

    events = load_table(spark, sf_dir, "events")
    return attribute_linear(
        events,
        "user_id",
        id_col="event_id",
        ts_col="ts",
        type_col="event_type",
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_s=3600,
        value_col="value",
    ).select(
        "user_id",
        "conversion_id",
        "conversion_ts",
        "conversion_value",
        "touch_id",
        "touch_ts",
        "touch_type",
        "credit",
        "attributed_value",
    )


@query(
    "user_value_robust_outliers",
    oracle="""
    WITH m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    ), d AS (
      SELECT e.user_id, abs(e.value - m.med) AS ad
      FROM events e JOIN m USING (user_id)
    ), s AS (
      SELECT d.user_id, m.n_obs, m.med,
             quantile_cont(d.ad, 0.5) * 1.4826 AS mad
      FROM d JOIN m USING (user_id) GROUP BY d.user_id, m.n_obs, m.med
    )
    SELECT e.user_id, s.n_obs, e.ts, e.event_id, e.value,
           abs(e.value - s.med) / s.mad AS robust_z
    FROM events e JOIN s USING (user_id)
    WHERE s.mad > 0 AND abs(e.value - s.med) / s.mad > 3.5
    """,
)
def q_user_value_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-z outlier gate (``ops/stats.robust_outliers``): events whose
    |value − per-user median| / (1.4826·MAD) exceeds the Iglewicz-Hoaglin
    3.5 cut — the heavy-tail-safe sibling of the mean/stddev
    ``user_value_outliers``, immune to the outliers corrupting the very
    moments that hunt them (50% breakdown point). Two grouped percentile
    passes on one key partitioning + a broadcast join back; degenerate
    MAD = 0 keys are excluded at the query grain so both engines agree
    without an infinity convention. Spark ``percentile`` and DuckDB
    ``quantile_cont`` share linear interpolation; the driver's 1e-6
    canonicalization absorbs the sub-ulp libm spread."""
    from fxspark.ops.stats import robust_outliers

    events = load_table(spark, sf_dir, "events")
    return (
        robust_outliers(events, "user_id", "value", threshold=3.5)
        .filter(F.col("mad") > 0.0)
        .select("user_id", "n_obs", "ts", "event_id", "value", "robust_z")
    )


@query(
    "doc_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS t
      FROM documents
    ), c AS (
      SELECT t, count(*) AS c FROM toks GROUP BY t HAVING count(*) >= 2
    ), r AS (
      SELECT CAST(ln(CAST(row_number() OVER (ORDER BY c DESC, t) AS DOUBLE))
                  AS DECIMAL(38,9)) AS x,
             CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(38,9)) AS y
      FROM c
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
                           AS DECIMAL(38,9))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                           AS DECIMAL(38,9))) AS DOUBLE) AS sxx
      FROM r
    ), f AS (
      SELECT n_terms, sx, sy,
             CASE WHEN CAST(n_terms AS DOUBLE) * sxx - sx * sx > 0
                  THEN (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n_terms AS DOUBLE) * sxx - sx * sx)
             END AS sl
      FROM s
    )
    SELECT n_terms, round(sl, 6) AS zipf_slope,
           round((sy - sl * sx) / CAST(n_terms AS DOUBLE), 6) AS intercept
    FROM f
    """,
)
def q_doc_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus token distribution
    (``ops/text.zipf_fit``, min_count=2): OLS slope of ln(freq) on ln(rank)
    over the frequency table. Natural text tracks −1; template spam and
    failed boilerplate dedup bend it, so the exponent is a one-row corpus
    health gate. Token counts are one partial-combined agg; the rank window
    runs over the VOCABULARY-sized frequency table, orders below corpus
    size; both engines cast their ln() to DECIMAL(38,9) before the
    five-sum fit, absorbing last-ulp libm disagreement — the declared-
    randomness discipline applied to logarithms."""
    from fxspark.ops.text import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs, "text", min_count=2)


# Fellegi-Sunter field model for the customer linkage query: declared
# (m, u) per compared field; the log2 weights are computed ONCE here in
# Python and injected into BOTH engines as double literals (engines
# disagree in the last ulp of log, identical literals sum identically).
_FS_FIELDS = {"nation": (0.9, 0.05), "band": (0.85, 0.15), "seg": (0.7, 0.2)}


def _fs_oracle() -> str:
    from fxspark.ops.linkage import fs_weights

    terms = []
    for f, (m, u) in _FS_FIELDS.items():
        agree_w, disagree_w = fs_weights(m, u)
        # bare decimal literals are DECIMAL-typed in DuckDB (decimal
        # arithmetic rounds differently in the last ulp) — force DOUBLE so
        # both engines add the identical IEEE values in the same order
        terms.append(
            f"CASE WHEN ({f}_a IS NOT DISTINCT FROM {f}_b) "
            f"AND {f}_a IS NOT NULL THEN CAST({agree_w!r} AS DOUBLE) "
            f"ELSE CAST({disagree_w!r} AS DOUBLE) END"
        )
    score = "CAST(0.0 AS DOUBLE) + " + " + ".join(terms)
    return f"""
    WITH c AS (
      SELECT c_custkey, c_nationkey AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
             c_mktsegment AS seg,
             substr(c_name, 1, 17) AS blk
      FROM customer
    ), pairs AS (
      SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
             a.nation AS nation_a, b.nation AS nation_b,
             a.band AS band_a, b.band AS band_b,
             a.seg AS seg_a, b.seg AS seg_b
      FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    ), scored AS (
      SELECT custkey_a, custkey_b, {score} AS match_weight
      FROM pairs
    )
    SELECT custkey_a, custkey_b, match_weight,
           CASE WHEN match_weight >= 4.0 THEN 'match'
                WHEN match_weight <= -2.0 THEN 'no_match'
                ELSE 'possible' END AS decision
    FROM scored
    """


@query("customer_name_linkage", oracle=_fs_oracle())
def q_customer_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage
    (``ops/linkage.fs_score_pairs``) over BLOCKED customer pairs: candidate
    pairs share a 17-char name-prefix block (bounded neighborhoods — block
    size is set by the name format, not corpus size, so the pair stage
    never goes all-pairs customer² at any scale; the Splink-style
    block-then-score topology), scored on nation / acctbal-band /
    mktsegment agreement with declared (m, u) weights injected identically
    into both engines. Scoring itself is pure map-side arithmetic on the
    pair frame."""
    from fxspark.ops.linkage import fs_score_pairs

    cust = load_table(spark, sf_dir, "customer")

    def side(tag: str) -> DataFrame:
        return cust.select(
            F.col("c_custkey").alias(f"custkey_{tag}"),
            F.col("c_nationkey").alias(f"nation_{tag}"),
            F.floor(F.col("c_acctbal") / 1000)
            .cast("long")
            .alias(f"band_{tag}"),
            F.col("c_mktsegment").alias(f"seg_{tag}"),
            F.substring("c_name", 1, 17).alias("_blk"),
        )

    pairs = (
        side("a")
        .join(side("b"), "_blk")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
    )
    return fs_score_pairs(
        pairs, _FS_FIELDS, upper=4.0, lower=-2.0
    ).select("custkey_a", "custkey_b", "match_weight", "decision")


@query(
    "maintained_ols_tertiles",
    oracle=f"""
    WITH s AS (
      SELECT user_id, count(*) AS n_obs,
             CAST(sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_X0} AS DECIMAL(38,0)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST((CAST(floor(epoch(ts)) AS BIGINT) - {_X0}) * value
                           AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST((CAST(floor(epoch(ts)) AS BIGINT) - {_X0})
                           * (CAST(floor(epoch(ts)) AS BIGINT) - {_X0})
                           AS DECIMAL(38,0))) AS DOUBLE) AS sxx
      -- NULL ts cannot be assigned to any micro-batch: the maintained
      -- form's time-split quarantines such rows, so the oracle states the
      -- same exclusion (a no-op on real data, where ts is never NULL).
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ), f AS (
      SELECT user_id, n_obs, sx, sy,
             CASE WHEN n_obs * sxx - sx * sx > 0
                  THEN (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx)
             END AS sl
      FROM s
    )
    SELECT user_id, n_obs,
           round(sl * 86400, 6) AS slope_per_day,
           round((sy - sl * sx) / n_obs, 6) AS intercept
    FROM f
    """,
)
def q_maintained_ols_tertiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAINTAINED per-user OLS trend (``ops/rollup.ols_rollup_*``): the
    events table split at two fixed dates plays three micro-batches, each
    reduced to its five exact-decimal sufficient statistics
    (``ols_rollup_table``), merged pairwise (``merge_ols_rollup`` — union +
    keyed groupBy re-aggregation, so the maintained state keeps GROUP BY
    NULL-key semantics; associative to the bit), then fit once at read
    time.
    The oracle is ``user_value_trend``'s from-scratch SQL plus the
    explicit NULL-ts exclusion the micro-batch time-split implies: exact
    decimal moments merge exactly, so maintaining the fit incrementally —
    the 100 TB shape that replaces the reference's full-store rescan every
    tick (``/root/reference/Fx_1min.py:147-217``) — changes no bit of the
    answer."""
    from fxspark.ops.rollup import (
        merge_ols_rollup,
        ols_rollup_read,
        ols_rollup_table,
    )

    events = load_table(spark, sf_dir, "events")
    bounds = [
        (None, "2024-01-11 00:00:00"),
        ("2024-01-11 00:00:00", "2024-01-21 00:00:00"),
        ("2024-01-21 00:00:00", None),
    ]
    state = None
    for lo, hi in bounds:
        batch = events
        if lo is not None:
            batch = batch.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            batch = batch.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
        part = ols_rollup_table(
            batch,
            ["user_id"],
            x=F.unix_timestamp("ts") - F.lit(_X0),
            y=F.col("value"),
        )
        state = merge_ols_rollup(state, part, ["user_id"])
    fit = ols_rollup_read(state, ["user_id"])
    return fit.select(
        "user_id",
        "n_obs",
        F.round(F.col("slope") * 86400, 6).alias("slope_per_day"),
        F.round("intercept", 6).alias("intercept"),
    )


@query(
    "stream_cusum_replay",
    oracle="""
    WITH c1 AS (
      SELECT user_id, ts, event_id,
             sum(CAST((value - 50.0) - 10.0 AS DECIMAL(38,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS cum
      -- keyed_cusum's domain contract: observed (non-NULL ts/value) only
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), c AS (
      SELECT user_id, ts, event_id, cum,
             least(CAST(0 AS DECIMAL(38,6)),
                   min(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING)) AS low
      FROM c1
    ), s AS (
      SELECT user_id,
             CAST(cum AS DOUBLE) - CAST(low AS DOUBLE) AS cusum,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM c
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_total,
           max(CASE WHEN rn = 1 THEN cusum END) AS cusum,
           CAST(sum(CASE WHEN cusum > 120.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alerts
    FROM s GROUP BY user_id
    """,
)
def q_stream_cusum_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming/stateful.stateful_cusum``'s final
    emission: per user the event count, the closing CUSUM chart value
    (target 50, slack 10) and how many processed events were in alarm
    (threshold 120). The streaming operator's O(1) state (running sum +
    low-water-mark) is prefix-deterministic, so its last micro-batch output
    equals the batch closed form ``ops/windows.keyed_cusum`` materializes
    with two stacked windows — an equality pinned across real micro-batches
    by ``tests/test_streaming_multimodal.py::
    test_stateful_cusum_across_batches_matches_batch_closed_form``. The
    deviations are exact decimals, so the chart is bit-stable under any
    partitioning.

    Precondition: ``event_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — the closing-value
    ``max_by`` ties between id-equal rows with distinct payloads;
    sf_dups boundary)."""
    from fxspark.ops.windows import keyed_cusum

    events = require_unique(
        load_table(spark, sf_dir, "events"), "event_id",
        context="stream_cusum_replay",
    )
    out = keyed_cusum(
        events,
        "user_id",
        ["ts", "event_id"],
        "value",
        target=F.lit(50.0),
        slack=10.0,
        threshold=120.0,
    )
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.max_by(F.col("cusum"), F.struct("ts", "event_id")).alias("cusum"),
        # count(when), not sum(cast): a NULL alert (NULL-valued chart) is
        # "not in alarm" like the oracle's CASE ELSE 0, and an all-NULL
        # group must report 0, not NULL (sf_nulls sweep).
        F.count(F.when(F.col("alert"), F.lit(1))).alias("n_alerts"),
    )


@query(
    "stream_kmv_replay",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
          / 1152921504606846976.0 AS h
      FROM events
    ), k AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ), s AS (
      SELECT event_type, count(*) AS seen, max(h) AS kth
      FROM k WHERE rn <= 256 GROUP BY event_type
    ), c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen
      FROM events GROUP BY event_type
    )
    SELECT c.event_type, c.n_seen,
           CAST(round(CASE WHEN s.seen < 256 THEN s.seen
                           ELSE 255.0 / s.kth END, 0) AS BIGINT)
             AS est_distinct
    FROM c JOIN s USING (event_type)
    """,
)
def q_stream_kmv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming/stateful.stateful_kmv_distinct``'s final
    emission: per event_type, total events seen and the KMV (k=256)
    distinct estimate over the SAME declared md5 hash the streaming state
    keeps. The sketch state (k smallest distinct hash fractions) is a pure
    set function of the prefix — merge order can't change it — so the last
    micro-batch output equals this batch computation exactly, not just
    statistically. The k-smallest is two-phase (local distinct rank per
    scan partition, final rank over bounded survivors — the
    ``profile_table`` topology), never a single global per-group sort."""
    events = load_table(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(2**60))
    ).alias("h")
    pairs = events.select(F.col("event_type"), h)
    w_local = Window.partitionBy("event_type", "_pid").orderBy("h")
    local = (
        pairs.withColumn("_pid", F.spark_partition_id())
        .withColumn("_dr", F.dense_rank().over(w_local))
        .filter(F.col("_dr") <= 256)
        .select("event_type", "h")
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    s = (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 256)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("_seen"), F.max("h").alias("_kth"))
    )
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_seen")
    )
    return counts.join(s, "event_type").select(
        "event_type",
        "n_seen",
        F.round(
            F.when(F.col("_seen") < 256, F.col("_seen").cast("double"))
            .otherwise(F.lit(255.0) / F.col("_kth")),
            0,
        )
        .cast("long")
        .alias("est_distinct"),
    )


@query(
    "lang_token_fertility",
    oracle="""
    WITH t AS (
      SELECT lang, len(string_split(lower(trim(text)), ' ')) AS ntok, n_chars
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(n_chars) AS DOUBLE) / CAST(sum(ntok) AS DOUBLE)
             AS chars_per_token,
           CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS tokens_per_doc
    FROM t GROUP BY lang
    """,
)
def q_lang_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by document language: chars-per-token and
    tokens-per-doc per lang — the report that tells a training pipeline how
    expensively each language tokenizes (CJK text yields far fewer
    whitespace tokens per char than Latin scripts, so byte budgets and
    token budgets diverge BY LANGUAGE; mixture planners correct with
    exactly this table). Pure composition: ``ops/text.token_count`` inside
    one partial-combined groupBy — integer sums, so the ratios divide
    identical exact operands in both engines."""
    from fxspark.ops.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"))
        .alias("chars_per_token"),
        (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"))
        .alias("tokens_per_doc"),
    )


_PROFILE_COLS = [
    ("c_custkey", "bigint", True),
    ("c_name", "string", False),
    ("c_nationkey", "int", True),
    ("c_acctbal", "double", True),
    ("c_mktsegment", "string", False),
]


def _profile_oracle() -> str:
    """Replay ``ops/checks.profile_table`` over customer: per column the
    null count, the declared-md5 KMV distinct estimate, and (numerics)
    min/max/exact-decimal mean. Doubles hash through their string form —
    c_acctbal stays in the plain-decimal-notation range where Spark and
    DuckDB render doubles identically (both switch to scientific notation
    only outside ~[1e-4, 1e16))."""
    frac = (
        "CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15)) AS BIGINT)"
        " / 1152921504606846976.0"
    )
    parts = []
    for c, dt, num in _PROFILE_COLS:
        est = f"""
          (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS BIGINT)
                       ELSE CAST(round(255.0 / max(h), 0) AS BIGINT) END
           FROM (SELECT h FROM (SELECT DISTINCT {frac.format(c=c)} AS h
                                FROM customer WHERE {c} IS NOT NULL)
                 ORDER BY h LIMIT 256))"""
        if num:
            mn = f"(SELECT CAST(min({c}) AS DOUBLE) FROM customer)"
            mx = f"(SELECT CAST(max({c}) AS DOUBLE) FROM customer)"
            mean = (
                f"(SELECT CAST(sum(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"
                f" / count({c}) FROM customer)"
            )
        else:
            mn = mx = mean = "CAST(NULL AS DOUBLE)"
        parts.append(f"""
        SELECT '{c}' AS "column", '{dt}' AS dtype,
               (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
               (SELECT CAST(count(*) - count({c}) AS BIGINT) FROM customer)
                 AS n_null,
               {est} AS est_distinct,
               {mn} AS min_val, {mx} AS max_val, {mean} AS mean_val""")
    return " UNION ALL ".join(parts)


@query("customer_profile", oracle=_profile_oracle())
def q_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic table profiler (``ops/checks.profile_table``) on the
    customer dimension: one row per column with null count, KMV distinct
    ESTIMATE (declared md5 randomness — the approximate number itself is
    reproducible, so the oracle hash-checks it), and min/max/decimal-exact
    mean for numerics. Two jobs total regardless of column count: one
    simultaneous counter agg, one melt + two-phase per-column k-smallest —
    the schema-discovery pass a warehouse runs before designing
    partitioning for an unknown 100 TB table."""
    from fxspark.ops.checks import profile_table

    cust = load_table(spark, sf_dir, "customer")
    return profile_table(cust, kmv_k=256)


# ---------------------------------------------------------------------------
# Round-6 second wave: privacy (k-anonymity audit, declared-noise DP
# release), first-touch attribution, seasonality profile, join-view delta
# maintenance, largest-remainder stratified allocation, funnel latencies.
# ---------------------------------------------------------------------------


@query(
    "event_k_anonymity",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS value_band,
           strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY 1, 2, 3
    HAVING count(*) < 5
    """,
)
def q_event_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (``ops/checks.k_anonymity``) of the events table
    under the quasi-identifier set (event_type, 50-unit value band, day):
    every combination an attacker could pin to fewer than k=5 rows — the
    pre-release privacy gate that tells a curation pipeline which cells to
    suppress or generalize. One partial-aggregated groupBy + HAVING: the
    audit costs a count rollup at any scale, and the output is bounded by
    the small-class tail it exists to surface."""
    from fxspark.ops.checks import k_anonymity

    events = load_table(spark, sf_dir, "events")
    quasi = events.select(
        "event_type",
        F.floor(F.col("value") / 50.0).cast("long").alias("value_band"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    return k_anonymity(quasi, ["event_type", "value_band", "day"], k=5)


@query(
    "dp_event_counts",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
      FROM events GROUP BY event_type
    ), u AS (
      -- coalesce matches dp_counts' concat_ws key string, which maps a
      -- NULL key to '' (the NULL group still gets a deterministic draw).
      SELECT event_type, n_true,
             CAST(('0x' || substr(md5(coalesce(event_type, '')), 1, 15))
                  AS BIGINT)
               / 1152921504606846976.0 - 0.5 AS uu
      FROM c
    ), g AS (
      SELECT event_type, n_true, uu,
             greatest(1.0 - 2.0 * abs(uu), 1e-12) AS gg
      FROM u
    )
    SELECT event_type, n_true,
           round(CAST(n_true AS DOUBLE)
                 + (-(2.0) * sign(uu)
                    * CAST(CAST(ln(gg) AS DECIMAL(38,9)) AS DOUBLE)), 6)
             AS noisy_count
    FROM g
    """,
)
def q_dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private-SHAPED count release
    (``ops/privacy.dp_counts``, epsilon=0.5): per-event-type counts +
    Laplace(1/eps) noise via the inverse CDF, with the uniform draw from
    the DECLARED md5 family — so the released numbers replay bit-for-bit
    in the oracle. A production release swaps in a secret seed (one
    argument) and drops n_true; what this pins differentially is the
    MECHANISM algebra (sensitivity-1 scale, inverse-CDF shape, the
    DECIMAL(38,9)-quantized log that absorbs libm ulp spread) — the part
    of a DP pipeline that silently goes wrong. Cost: one partial-combined
    count rollup plus map-side arithmetic."""
    from fxspark.ops.privacy import dp_counts

    events = load_table(spark, sf_dir, "events")
    return dp_counts(events, "event_type", epsilon=0.5)


@query(
    "purchase_first_touch",
    oracle="""
    SELECT p.user_id, p.event_id AS conversion_id, p.ts AS conversion_ts,
           t.ts AS touch_ts, t.event_type AS touch_type,
           p.value AS conversion_value
    FROM events p LEFT JOIN LATERAL (
      SELECT ts, event_type FROM events t
      WHERE t.user_id = p.user_id AND t.event_type IN ('click', 'view')
        AND t.ts <= p.ts AND t.ts >= p.ts - INTERVAL 1 HOUR
      ORDER BY t.ts ASC, t.event_id ASC LIMIT 1
    ) t ON TRUE
    WHERE p.event_type = 'purchase'
    """,
)
def q_purchase_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch attribution (``ops/windows.attribute_first_touch``):
    each purchase credited to the EARLIEST click/view in the preceding
    hour, NULL = organic — the introduction-gets-the-credit complement of
    ``purchase_attribution``'s last-touch rule. The two-sided window rules
    out a single as-of sweep, so candidates come from the binned interval
    range join and the earliest touch is a partial-combined ``min_by``
    aggregate (no window sort at all); organic conversions re-enter via a
    key-partitioned left join."""
    from fxspark.ops.windows import attribute_first_touch

    events = load_table(spark, sf_dir, "events")
    return attribute_first_touch(
        events,
        "user_id",
        id_col="event_id",
        ts_col="ts",
        type_col="event_type",
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_s=3600,
        value_col="value",
    ).select(
        "user_id",
        "conversion_id",
        "conversion_ts",
        "touch_ts",
        "touch_type",
        "conversion_value",
    )


@query(
    "user_value_seasonality",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(isodow(ts) - 1 AS INTEGER) AS dow, value
      FROM events
    ), per AS (
      SELECT user_id, dow, CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*)
               AS mean_value
      FROM d GROUP BY user_id, dow
    ), tot AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*)
               AS overall_mean
      FROM d GROUP BY user_id
    )
    SELECT p.user_id, p.dow, p.n_obs, p.mean_value,
           p.mean_value / t.overall_mean AS seasonality_idx
    FROM per p JOIN tot t USING (user_id)
    """,
)
def q_user_value_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per user: each (user, weekday)'s
    observation count, exact-decimal mean value, and the seasonality index
    mean/overall-mean — the deseasonalization table a forecasting or
    anomaly tier divides through before thresholding (a Sunday dip that
    happens every Sunday is not an anomaly). Two partial-combined rollups
    sharing the user-key shuffle + one key-colocated join; weekday is
    ISO-Monday-based in both engines (Spark ``weekday`` ≡ DuckDB
    ``isodow − 1``)."""
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "user_id", F.weekday("ts").alias("dow"), "value"
    )
    per = d.groupBy("user_id", "dow").agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_value"),
    )
    tot = d.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("overall_mean"),
    )
    return per.join(tot, "user_id").select(
        "user_id",
        "dow",
        "n_obs",
        "mean_value",
        (F.col("mean_value") / F.col("overall_mean")).alias(
            "seasonality_idx"
        ),
    )


@query(
    "orders_delta_join",
    oracle="""
    WITH lo AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate < DATE '1995-01-01'
    ), ld AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
    ), ro AS (
      SELECT l_orderkey AS o_orderkey, l_linenumber, l_extendedprice
      FROM lineitem WHERE l_shipdate < DATE '1995-01-01'
    ), rd AS (
      SELECT l_orderkey AS o_orderkey, l_linenumber, l_extendedprice
      FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
    )
    SELECT ld.o_orderkey, ld.o_totalprice, ro.l_linenumber,
           ro.l_extendedprice, 'new_left' AS delta_term
    FROM ld JOIN ro USING (o_orderkey)
    UNION ALL
    SELECT lo.o_orderkey, lo.o_totalprice, rd.l_linenumber,
           rd.l_extendedprice, 'new_right'
    FROM lo JOIN rd USING (o_orderkey)
    UNION ALL
    SELECT ld.o_orderkey, ld.o_totalprice, rd.l_linenumber,
           rd.l_extendedprice, 'both_new'
    FROM ld JOIN rd USING (o_orderkey)
    """,
)
def q_orders_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the orders⋈lineitem JOIN view
    (``ops/ivm.delta_join``): with both sides split at 1995-01-01 into
    (old state, insert batch), the view delta is the three disjoint terms
    ΔL⋈R_old ∪ L_old⋈ΔR ∪ ΔL⋈ΔR — work proportional to the batches, never
    a re-join of state×state (the reference re-reads its whole store every
    tick; this is the algebra that replaces that at 100 TB, with the state
    sides bucketed on the join key). Disjointness-by-construction is what
    makes the delta itself hash-verifiable; the from-scratch equivalence
    is pinned in tests/test_round6_ops.py."""
    from fxspark.ops.ivm import delta_join

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1995-01-01").cast("date")
    l_all = orders.select("o_orderkey", "o_totalprice", "o_orderdate")
    r_all = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_extendedprice",
        "l_shipdate",
    )
    l_old = l_all.filter(F.col("o_orderdate") < cut).drop("o_orderdate")
    l_new = l_all.filter(F.col("o_orderdate") >= cut).drop("o_orderdate")
    r_old = r_all.filter(F.col("l_shipdate") < cut).drop("l_shipdate")
    r_new = r_all.filter(F.col("l_shipdate") >= cut).drop("l_shipdate")
    return delta_join(l_old, r_old, l_new, r_new, ["o_orderkey"])


@query(
    "doc_split_quota",
    oracle="""
    WITH c AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows
      FROM documents GROUP BY lang, source
    ), t AS (
      SELECT CAST(floor(CAST(sum(n_rows) AS BIGINT)
                        * CAST(0.8 AS DECIMAL(18,6))
                        + CAST(0.5 AS DECIMAL(2,1))) AS BIGINT) AS budget,
             CAST(sum(CAST(floor(n_rows * CAST(0.8 AS DECIMAL(18,6)))
                           AS BIGINT)) AS BIGINT) AS sumbase
      FROM c
    ), s AS (
      SELECT lang, source, n_rows,
             CAST(floor(n_rows * CAST(0.8 AS DECIMAL(18,6))) AS BIGINT)
               AS base,
             row_number() OVER (
               ORDER BY (n_rows * CAST(0.8 AS DECIMAL(18,6))
                         - floor(n_rows * CAST(0.8 AS DECIMAL(18,6)))) DESC,
                        lang NULLS FIRST, source NULLS FIRST) AS rk
      FROM c
    )
    SELECT lang, source, n_rows,
           CAST(base + CASE WHEN rk <= budget - sumbase THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM s, t
    """,
)
def q_doc_split_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) stratified allocation
    (``ops/layout.largest_remainder_quota``): the per-(lang, source) train
    quotas that hit the corpus-level 80% budget EXACTLY — independent
    per-stratum rounding drifts by up to #strata/2 rows, which breaks
    fixed-size eval sets; this is the allocation a stratified split uses
    instead. Corpus-sized work is one count rollup; the remainder-rank
    window runs over the STRATA table only. All arithmetic is exact
    decimal, so the seat assignment is hash-stable, never a
    float-boundary coin flip."""
    from fxspark.ops.layout import largest_remainder_quota

    docs = load_table(spark, sf_dir, "documents")
    return largest_remainder_quota(docs, ["lang", "source"], 0.8)


@query(
    "funnel_latency_stats",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    ), lat AS (
      SELECT 'signup->click' AS stage_pair,
             CAST(epoch_us(t2) - epoch_us(t1) AS BIGINT) AS us
      FROM s1 JOIN s2 USING (user_id)
      UNION ALL
      SELECT 'click->purchase',
             CAST(epoch_us(t3) - epoch_us(t2) AS BIGINT)
      FROM s2 JOIN s3 USING (user_id)
    )
    SELECT stage_pair, CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(CAST(us AS DOUBLE), 0.5) / 1000000.0, 6)
             AS median_latency_s,
           round(quantile_cont(CAST(us AS DOUBLE), 0.9) / 1000000.0, 6)
             AS p90_latency_s
    FROM lat GROUP BY stage_pair
    """,
)
def q_funnel_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-to-stage funnel LATENCY distribution: on top of
    ``ops/windows.funnel_stages``' earliest-qualifying-time funnel
    (signup → click → purchase, strictly increasing), the per-transition
    user count and median/p90 time-to-convert — the report that turns a
    conversion funnel into an SLA. Latencies are exact epoch-microsecond
    integers (no timestamp float trap); the percentiles interpolate the
    same doubles in both engines."""
    from fxspark.ops.windows import funnel_stages

    events = load_table(spark, sf_dir, "events")
    f = funnel_stages(
        events, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"],
    )
    # One pass over the funnel frame: a union of two filtered branches
    # would re-run the whole stage-window pipeline per branch (10 events
    # scans in the executed plan); the explode emits both transitions
    # from the same row.
    pairs = F.array(
        F.struct(
            F.lit("signup->click").alias("stage_pair"),
            (F.unix_micros("t_click") - F.unix_micros("t_signup")).alias(
                "us"
            ),
            F.col("t_click").isNotNull().alias("ok"),
        ),
        F.struct(
            F.lit("click->purchase").alias("stage_pair"),
            (F.unix_micros("t_purchase") - F.unix_micros("t_click")).alias(
                "us"
            ),
            F.col("t_purchase").isNotNull().alias("ok"),
        ),
    )
    lat = (
        f.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.ok"))
        .select(F.col("p.stage_pair").alias("stage_pair"), F.col("p.us").alias("us"))
    )
    return lat.groupBy("stage_pair").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.percentile(F.col("us").cast("double"), F.lit(0.5))
            / F.lit(1000000.0),
            6,
        ).alias("median_latency_s"),
        F.round(
            F.percentile(F.col("us").cast("double"), F.lit(0.9))
            / F.lit(1000000.0),
            6,
        ).alias("p90_latency_s"),
    )


@query(
    "doc_bpe_merges",
    oracle="""
    WITH RECURSIVE w0 AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq,
             string_split(word, '') AS syms
      FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS word
            FROM documents)
      WHERE word != '' GROUP BY word
    ),
    e1 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM w0),
    pc1 AS (
      SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM e1 GROUP BY 1, 2
    ),
    m1 AS (SELECT a, b, cnt FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
    r1 AS (
      SELECT word, freq, syms, CAST(2 AS BIGINT) AS i, [syms[1]] AS acc
      FROM w0
      UNION ALL
      SELECT word, freq, syms, i + 1,
             CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT a FROM m1)
                       AND syms[i] = (SELECT b FROM m1)
                  THEN acc[1:len(acc)-1] || [(SELECT a || b FROM m1)]
                  ELSE acc || [syms[i]] END
      FROM r1 WHERE i <= len(syms)
    ),
    w1 AS (SELECT word, freq, acc AS syms FROM r1 WHERE i = len(syms) + 1),
    e2 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM w1),
    pc2 AS (
      SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM e2 GROUP BY 1, 2
    ),
    m2 AS (SELECT a, b, cnt FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1),
    r2 AS (
      SELECT word, freq, syms, CAST(2 AS BIGINT) AS i, [syms[1]] AS acc
      FROM w1
      UNION ALL
      SELECT word, freq, syms, i + 1,
             CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT a FROM m2)
                       AND syms[i] = (SELECT b FROM m2)
                  THEN acc[1:len(acc)-1] || [(SELECT a || b FROM m2)]
                  ELSE acc || [syms[i]] END
      FROM r2 WHERE i <= len(syms)
    ),
    w2 AS (SELECT word, freq, acc AS syms FROM r2 WHERE i = len(syms) + 1),
    e3 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM w2),
    pc3 AS (
      SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM e3 GROUP BY 1, 2
    ),
    m3 AS (SELECT a, b, cnt FROM pc3 ORDER BY cnt DESC, a, b LIMIT 1)
    SELECT 1 AS merge_rank, a AS left_sym, b AS right_sym,
           cnt AS pair_count, a || b AS merged FROM m1
    UNION ALL
    SELECT 2, a, b, cnt, a || b FROM m2
    UNION ALL
    SELECT 3, a, b, cnt, a || b FROM m3
    """,
)
def q_doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge TRAINING (``ops/bpe.bpe_train``): the first
    three merge rules learned from the corpus — the tokenizer-learning
    loop itself, not just its application (``doc_bpe_pair_counts`` counts;
    this trains). The corpus collapses once to the vocabulary-sized
    word-frequency table; each iteration is a partial-combined pair count,
    a 1-row TakeOrdered argmax (ties broken lexically — exact integer
    counts, so the winner is hash-stable), and a per-word left-fold merge,
    with ``localCheckpoint`` keeping lineage O(1) like PageRank. The
    oracle replays ALL THREE iterations: pair counts in plain SQL, the
    leftmost-non-overlapping merge as a stack fold in a RECURSIVE CTE —
    an iterative ML training loop differentially verified end-to-end
    (the kmeans/PageRank discipline, now with data-dependent control
    flow: iteration k's merge pair is a subquery over iteration k-1's
    state)."""
    from fxspark.ops.bpe import bpe_train_df

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_df(docs, "text", 3)


@query(
    "stream_dedup_replay",
    oracle="""
    SELECT user_id, event_type, ts, event_id, value
    FROM (
      SELECT user_id, event_type, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rn
      -- event-time contract: a NULL-ts event never reaches the
      -- watermarked stream (Spark's min_by struct order would otherwise
      -- rank the NULL first where DuckDB ranks it last — D8)
      FROM events WHERE ts IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming/runner.dedup_stream``
    (``dropDuplicatesWithinWatermark`` — first arrival per natural key
    wins, state bounded by the watermark horizon): the first event per
    (user, event_type) in event-time order. The batch twin is a
    partial-combined ``min_by`` aggregate — equal to the stream whenever a
    key's duplicates span less than the watermark (the contract the
    streaming operator declares; beyond it the stream re-emits, which is
    the documented at-least-once boundary). Mirrors the reference's
    first-arrival duplicate swallow
    (``/root/reference/update_exchange_rates.py:101-102``)."""
    events = load_table(spark, sf_dir, "events")
    # event-time contract (class 8): NULL-ts rows never enter the stream
    events = events.filter(F.col("ts").isNotNull())
    first = events.groupBy("user_id", "event_type").agg(
        F.min_by(
            F.struct("ts", "event_id", "value"),
            F.struct("ts", "event_id"),
        ).alias("_f")
    )
    return first.select(
        "user_id",
        "event_type",
        F.col("_f.ts").alias("ts"),
        F.col("_f.event_id").alias("event_id"),
        F.col("_f.value").alias("value"),
    )


@query(
    "source_overlap_kmv",
    oracle="""
    WITH h AS (
      SELECT DISTINCT source,
        CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT)
          / 1152921504606846976.0 AS h
      FROM documents
    ), srcs AS (SELECT DISTINCT source FROM h),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM srcs a JOIN srcs b ON a.source < b.source
    ), u AS (
      SELECT p.source_a, p.source_b, h.h,
             max(CASE WHEN h.source = p.source_a THEN 1 ELSE 0 END)
               AS in_a,
             max(CASE WHEN h.source = p.source_b THEN 1 ELSE 0 END)
               AS in_b
      FROM pairs p JOIN h
        ON h.source = p.source_a OR h.source = p.source_b
      GROUP BY p.source_a, p.source_b, h.h
    ), r AS (
      SELECT source_a, source_b, h, in_a, in_b,
             row_number() OVER (PARTITION BY source_a, source_b
                                ORDER BY h) AS rn
      FROM u
    ), s AS (
      SELECT source_a, source_b,
             CAST(count(*) AS BIGINT) AS n_seen,
             max(h) AS kth,
             CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_common
      FROM r WHERE rn <= 128 GROUP BY source_a, source_b
    ), x AS (
      SELECT d.source_a, d.source_b,
             CAST(count(*) AS BIGINT) AS true_common
      FROM (
        SELECT ha.source AS source_a, hb.source AS source_b
        FROM h ha JOIN h hb
          ON ha.h = hb.h AND ha.source < hb.source
      ) d GROUP BY d.source_a, d.source_b
    )
    SELECT s.source_a, s.source_b,
           round(CAST(n_common AS DOUBLE) / n_seen, 6) AS jaccard_est,
           CAST(round(CASE WHEN n_seen < 128 THEN n_seen
                           ELSE 127.0 / kth END, 0) AS BIGINT)
             AS union_est,
           CAST(round((CAST(n_common AS DOUBLE) / n_seen)
                      * CASE WHEN n_seen < 128 THEN n_seen
                             ELSE 127.0 / kth END, 0) AS BIGINT)
             AS intersect_est,
           coalesce(x.true_common, 0) AS true_common
    FROM s LEFT JOIN x USING (source_a, source_b)
    """,
)
def q_source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap estimation from MERGED KMV sketches —
    the theta-sketch set algebra on the declared md5 family: per source
    pair, the k=128 smallest distinct fingerprint fractions of the UNION
    give θ (→ union cardinality) and the fraction of those minima present
    in BOTH sources estimates Jaccard, hence the intersection — how a
    100 TB warehouse asks "how much does source A duplicate source B"
    WITHOUT a cross-source join (each source's sketch is k numbers; only
    sketches meet). The declared hash makes the ESTIMATES bit-reproducible
    (the ``events_kmv_distinct`` pattern, extended from one sketch to set
    operations over sketches); the exact common count rides along as the
    verification column. Source-pair domain is |sources|² — tiny by
    construction."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        (
            F.conv(
                F.substring(F.md5(F.lower(F.trim(F.col("text")))), 1, 15),
                16,
                10,
            ).cast("long")
            / F.lit(float(2**60))
        ).alias("h"),
    ).distinct()
    srcs = h.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            srcs.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    u = (
        pairs.join(
            h,
            (F.col("source") == F.col("source_a"))
            | (F.col("source") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "h")
        .agg(
            F.max(
                F.when(F.col("source") == F.col("source_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("source") == F.col("source_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    w = Window.partitionBy("source_a", "source_b").orderBy("h")
    s = (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 128)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.max("h").alias("kth"),
            F.sum(
                ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
            ).alias("n_common"),
        )
    )
    x = (
        h.alias("ha")
        .join(
            h.alias("hb"),
            (F.col("ha.h") == F.col("hb.h"))
            & (F.col("ha.source") < F.col("hb.source")),
        )
        .groupBy(
            F.col("ha.source").alias("source_a"),
            F.col("hb.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("true_common"))
    )
    union_est = F.when(
        F.col("n_seen") < 128, F.col("n_seen").cast("double")
    ).otherwise(F.lit(127.0) / F.col("kth"))
    jacc = F.col("n_common").cast("double") / F.col("n_seen")
    return s.join(x, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.round(jacc, 6).alias("jaccard_est"),
        F.round(union_est, 0).cast("long").alias("union_est"),
        F.round(jacc * union_est, 0).cast("long").alias("intersect_est"),
        F.coalesce(F.col("true_common"), F.lit(0)).alias("true_common"),
    )


# ---------------------------------------------------------------------------
# Round-6 third wave: bidirectional nearest join, gaps-and-islands, running
# cumulative distinct, bounded reservoir sampling, robust/trimmed stats,
# collocation PMI, distributional KL drift, iterative BFS, Z-set aggregate
# maintenance, and corpus coverage curves.
# ---------------------------------------------------------------------------


@query(
    "purchase_nearest_touch",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value,
           t.touch_id, t.touch_type, t.touch_ts
    FROM events p LEFT JOIN LATERAL (
      SELECT e.event_id AS touch_id, e.event_type AS touch_type,
             e.ts AS touch_ts
      FROM events e
      WHERE e.user_id = p.user_id AND e.event_type IN ('click', 'view')
        AND e.ts IS NOT NULL
        AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 30 * 60 * 1000000
      ORDER BY abs(epoch_us(e.ts) - epoch_us(p.ts)) ASC,
               (e.ts <= p.ts) DESC,
               CASE WHEN e.ts <= p.ts THEN -e.event_id
                    ELSE e.event_id END ASC
      LIMIT 1
    ) t ON TRUE
    WHERE p.event_type = 'purchase' AND p.ts IS NOT NULL
    """,
)
def q_purchase_nearest_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time attribution: for each purchase the CLOSEST click or
    view in EITHER direction within ±30 min (``ops/asof.nearest_join`` —
    ``merge_asof(direction='nearest')``, distributed). One (user, time)
    sort-shuffle produces both directional candidates from the same
    ordered window; the winner is the smaller exact-micros distance, ties
    prefer the backward match and equal-time right rows resolve by
    largest/smallest event_id per the as-of tiebreak contract — all of
    which the LATERAL oracle restates ordinally. Generalizes the
    reference's latest-before lookup (``Fx_1min.py:159-188``) to
    bidirectional proximity."""
    from fxspark.ops.asof import nearest_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts"),
        F.col("value").alias("purchase_value"),
    )
    touches = events.filter(
        F.col("event_type").isin("click", "view")
    ).select(
        "user_id",
        "ts",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
    )
    res = nearest_join(
        purchases,
        touches,
        keys="user_id",
        on="ts",
        right_payload=["touch_id", "touch_type"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
        right_tiebreak=["touch_id"],
    )
    return res.select(
        "user_id",
        "purchase_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_value",
        "touch_id",
        "touch_type",
        F.col("ts_near").alias("touch_ts"),
    )


@query(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      -- NULL user identifies no entity: dropped by the op's contract
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE user_id IS NOT NULL
    ), rn AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, grp, count(*) AS slen, min(day) AS sstart
      FROM rn GROUP BY user_id, grp
    ), agg AS (
      SELECT user_id,
             CAST(sum(slen) AS BIGINT) AS n_active_days,
             CAST(count(*) AS BIGINT) AS n_streaks,
             CAST(max(slen) AS BIGINT) AS longest_streak
      FROM streaks GROUP BY user_id
    ), pick AS (
      SELECT user_id, sstart,
             row_number() OVER (
               PARTITION BY user_id ORDER BY slen DESC, sstart) AS r
      FROM streaks
    )
    SELECT a.user_id, a.n_active_days, a.n_streaks, a.longest_streak,
           CAST(p.sstart AS TIMESTAMP) AS longest_streak_start
    FROM agg a JOIN pick p ON a.user_id = p.user_id AND p.r = 1
    """,
)
def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands per user at day grain
    (``ops/windows.activity_streaks``): consecutive active days collapse
    into streaks via the ``day − row_number`` constant-per-island trick;
    output is each user's total active days, streak count, longest streak
    and its (first, on ties) start date. The event→distinct-day hash-agg
    runs first, so the per-user window sorts days, never raw events —
    shuffle-minimal at 100 TB. Generalizes the reference's 30-s recency
    check (``Fx_1min.py:174-178``) to continuous-activity analysis."""
    from fxspark.ops.windows import activity_streaks

    events = load_table(spark, sf_dir, "events")
    return activity_streaks(events, "user_id", "ts").select(
        "user_id",
        "n_active_days",
        "n_streaks",
        "longest_streak",
        # midnight TIMESTAMP, not DATE: both engines then hand the
        # comparator the same datetime64 dtype
        F.col("longest_streak_start").cast("timestamp").alias(
            "longest_streak_start"
        ),
    )


@query(
    "daily_new_users",
    oracle="""
    WITH du AS (
      -- an event without event time belongs to no day (and the engines
      -- would place the NULL day differently in the cumulative order)
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE ts IS NOT NULL
    ), act AS (
      SELECT day, count(*) AS active_users FROM du GROUP BY day
    ), fs AS (
      SELECT user_id, min(day) AS day FROM du GROUP BY user_id
    ), d AS (
      SELECT day, count(*) AS new_users FROM fs GROUP BY day
    )
    SELECT CAST(a.day AS TIMESTAMP) AS day,
           CAST(a.active_users AS BIGINT) AS active_users,
           CAST(coalesce(d.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(d.new_users, 0)) OVER (
             ORDER BY a.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM act a LEFT JOIN d ON a.day = d.day
    """,
)
def q_daily_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative distinct users by day WITHOUT per-day
    COUNT(DISTINCT) recomputation: each user collapses to a first-seen day
    (hash-agg, map-side combined), days aggregate to new-user counts, and
    the cumulative sum runs over DAY-GRAIN rows only. The naive form — one
    COUNT(DISTINCT user) per day over all history — is O(days × users)
    and re-shuffles the fact table per day; this is one pass. The final
    ordered window is a single partition, but its input is calendar-
    bounded (≤ a few thousand rows for a decade of days), stated
    explicitly — never data-sized."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # see oracle note
    )
    du = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    act = du.groupBy("day").agg(F.count(F.lit(1)).alias("active_users"))
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("day"))
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        act.join(daily, "day", "left")
        .withColumn("new_users", F.coalesce(F.col("new_users"), F.lit(0)))
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "active_users",
            "new_users",
            F.sum("new_users").over(w).alias("cum_users"),
        )
    )


@query(
    "events_reservoir_sample",
    oracle="""
    SELECT event_type, event_id, user_id, value, h AS sample_hash
    FROM (
      SELECT event_type, event_id, user_id, value,
             md5(CAST(event_id AS VARCHAR)) AS h,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events
    ) WHERE rn <= 20
    """,
)
def q_events_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-stratum sample with DECLARED randomness: rank rows by
    md5(event_id) and keep each event_type's 20 smallest — distribution-
    equivalent to reservoir sampling but reproducible, so the sample
    itself is oracle-verifiable (the ``events_kmv_distinct`` treatment
    applied to row sampling). The rank is computed with the TWO-PHASE
    ``ops/latest.k_smallest_per_key`` topology: event_type has ~5 values,
    so a single global window would pull every row of a stratum through
    one task at 100 TB; phase 1 keeps 20 per (stratum, scan partition),
    phase 2 sorts ≤ 20 × numPartitions survivors."""
    from fxspark.ops.latest import k_smallest_per_key

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type", "event_id", "user_id", "value"
    ).withColumn("sample_hash", F.md5(F.col("event_id").cast("string")))
    return k_smallest_per_key(
        ev, "event_type", ["sample_hash", "event_id"], 20
    ).select("event_type", "event_id", "user_id", "value", "sample_hash")


@query(
    "user_value_trimmed_mean",
    oracle="""
    WITH r AS (
      SELECT user_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY value, event_id) AS ra,
             row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id DESC
             ) AS rd,
             count(*) OVER (PARTITION BY user_id) AS n
      -- missing observations (NULL value) can be neither ranked nor
      -- averaged; engines disagree on where NULLs rank
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_obs,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             / count(*) AS raw_mean,
           CAST(sum(CASE WHEN ra > n // 10 AND rd > n // 10
                         THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
             / sum(CASE WHEN ra > n // 10 AND rd > n // 10
                        THEN 1 ELSE 0 END) AS trimmed_mean
    FROM r GROUP BY user_id
    """,
)
def q_user_value_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 % trimmed mean per user: rank each user's values from both ends
    (deterministic ``(value, event_id)`` order), drop ⌊n/10⌋ rows per
    side, average the rest — the robust location estimate that ignores
    tail spikes without the quantile interpolation trap. Sums are
    decimal-exact before the final double division, so both engines
    divide identical operands. One shuffle on user_id; per-user sort is
    bounded by the per-key event count like every ``user_value_*``
    window."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()  # observed values only — see oracle
    )
    wa = Window.partitionBy("user_id").orderBy("value", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").desc()
    )
    wn = Window.partitionBy("user_id")
    r = events.select(
        "user_id",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    keep = (F.col("ra") > F.floor(F.col("n") / 10)) & (
        F.col("rd") > F.floor(F.col("n") / 10)
    )
    dec = F.col("value").cast("decimal(38,6)")
    return r.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_obs"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("raw_mean"),
        (
            F.sum(F.when(keep, dec)).cast("double")
            / F.sum(F.when(keep, F.lit(1)).otherwise(F.lit(0)))
        ).alias("trimmed_mean"),
    )


@query(
    "token_pmi_pairs",
    oracle="""
    WITH td AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    ), dfreq AS (
      SELECT token, count(*) AS df FROM td GROUP BY token
    ), top AS (
      SELECT token, df FROM dfreq ORDER BY df DESC, token LIMIT 150
    ), tdf AS (
      SELECT td.doc_id, td.token FROM td JOIN top ON td.token = top.token
    ), p AS (
      SELECT a.token AS token_a, b.token AS token_b, count(*) AS c_ab
      FROM tdf a JOIN tdf b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2 HAVING count(*) >= 5
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT p.token_a, p.token_b, CAST(p.c_ab AS BIGINT) AS c_ab,
           CAST(ta.df AS BIGINT) AS df_a, CAST(tb.df AS BIGINT) AS df_b,
           CAST(CAST(ln(CAST(p.c_ab AS DOUBLE) * n.n_docs / (ta.df * tb.df))
                AS DECIMAL(38,9)) AS DOUBLE) AS pmi
    FROM p
    CROSS JOIN n
    JOIN top ta ON p.token_a = ta.token
    JOIN top tb ON p.token_b = tb.token
    """,
)
def q_token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token co-occurrence at document
    grain — the collocation statistic a curation pipeline uses to find
    multi-word expressions and template boilerplate. Candidate-bounded by
    construction: only the top-150 tokens by document frequency (rank
    deterministic on (df desc, token)) enter the doc-keyed self-join, so
    each document contributes ≤ C(150,2) pairs regardless of corpus size,
    and the vocabulary ranking itself uses the two-phase bounded top-k —
    no global sort of a corpus-sized vocabulary. PMI's ln lands in
    DECIMAL(38,9) (the ``doc_zipf_fit`` treatment) so last-ulp libm
    differences cannot reach the hash."""
    from fxspark.ops.latest import k_largest_global
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    td = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).distinct()
    dfreq = td.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    top = k_largest_global(dfreq, "df", 150, "token").select(
        "token", "df"
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tdf = td.join(F.broadcast(top.select("token")), "token")
    a = tdf.select(
        F.col("doc_id"), F.col("token").alias("token_a")
    )
    b = tdf.select(
        F.col("doc_id"), F.col("token").alias("token_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    ta = top.select(
        F.col("token").alias("token_a"), F.col("df").alias("df_a")
    )
    tb = top.select(
        F.col("token").alias("token_b"), F.col("df").alias("df_b")
    )
    out = (
        pairs.crossJoin(F.broadcast(n_docs))
        .join(F.broadcast(ta), "token_a")
        .join(F.broadcast(tb), "token_b")
    )
    pmi = F.log(
        F.col("c_ab").cast("double")
        * F.col("n_docs")
        / (F.col("df_a") * F.col("df_b"))
    )
    return out.select(
        "token_a",
        "token_b",
        "c_ab",
        "df_a",
        "df_b",
        pmi.cast("decimal(38,9)").cast("double").alias("pmi"),
    )


@query(
    "source_token_kl",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    ), cc AS (
      SELECT token, count(*) AS cv FROM tok GROUP BY token
    ), top AS (
      SELECT token, cv FROM cc ORDER BY cv DESC, token LIMIT 200
    ), tot AS (SELECT sum(cv) AS tv FROM top),
    sv AS (
      SELECT tok.source, tok.token, count(*) AS c
      FROM tok JOIN top ON tok.token = top.token
      GROUP BY tok.source, tok.token
    ), st AS (
      SELECT source, sum(c) AS ts FROM sv GROUP BY source
    ), grid AS (
      SELECT st.source, st.ts, top.token, top.cv, tot.tv,
             coalesce(sv.c, 0) AS c
      FROM st CROSS JOIN top CROSS JOIN tot
      LEFT JOIN sv ON sv.source = st.source AND sv.token = top.token
    )
    SELECT source, CAST(max(ts) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(
             (CAST(c + 1 AS DOUBLE) / CAST(ts + 200 AS DOUBLE))
             * ln((CAST(c + 1 AS DOUBLE) / CAST(ts + 200 AS DOUBLE))
                  / (CAST(cv + 1 AS DOUBLE) / CAST(tv + 200 AS DOUBLE)))
             AS DECIMAL(38,9))) AS DOUBLE) AS kl_divergence
    FROM grid GROUP BY source
    """,
)
def q_source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per source: KL(source ‖ corpus) over the shared
    top-200-token vocabulary with add-one smoothing — the mixture-quality
    diagnostic that flags a source whose unigram distribution diverges
    from the corpus (template spam, wrong language, boilerplate). The
    vocabulary is bounded top-k (two-phase rank), the (source × vocab)
    grid is |sources|×200 rows — broadcast-sized state, corpus stays
    map-side — and every KL term is double-computed in a pinned operand
    order then truncated to DECIMAL(38,9) before the exact sum, so libm's
    last ulp never reaches the hash."""
    from fxspark.ops.latest import k_largest_global
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    # ONE corpus pass: the (source, token) rollup feeds the global counts
    # (source-collapsing agg over the small grouped frame) and, via the
    # top join, the per-source counts. Same-JVM A/B at sf0.1 (4 reps
    # each): this shape 1.40 s vs 1.77 s for the double-explode form and
    # 1.51 s with a localCheckpoint of the rollup — share the rollup,
    # do NOT materialize it (the checkpoint job costs more than the
    # recompute it avoids at this scale).
    sv0 = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    cc = sv0.groupBy("token").agg(F.sum("c").cast("long").alias("cv"))
    top = k_largest_global(cc, "cv", 200, "token").select("token", "cv")
    tot = top.agg(F.sum("cv").alias("tv"))
    sv = sv0.join(F.broadcast(top.select("token")), "token").select(
        "source", "token", "c"
    )
    st = sv.groupBy("source").agg(F.sum("c").alias("ts"))
    grid = (
        st.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(tot))
        .join(sv, ["source", "token"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    p = (F.col("c") + 1).cast("double") / (F.col("ts") + 200).cast("double")
    q = (F.col("cv") + 1).cast("double") / (F.col("tv") + 200).cast("double")
    term = (p * F.log(p / q)).cast("decimal(38,9)")
    return grid.groupBy("source").agg(
        F.max("ts").cast("long").alias("n_tokens"),
        F.sum(term).cast("double").alias("kl_divergence"),
    )


_BFS_ITER = """
    f{i} AS (
      SELECT DISTINCT e.dst AS node, {i} AS hops
      FROM edges e JOIN f{prev} ON e.src = f{prev}.node
      WHERE e.dst NOT IN (SELECT node FROM v{prev})
    ), v{i} AS (
      SELECT node FROM v{prev} UNION ALL SELECT node FROM f{i}
    )"""


@query(
    "part_copurchase_bfs",
    oracle="""
    WITH e0 AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), edges AS (
      SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
    ), f0 AS (
      SELECT min(l_partkey) AS node, 0 AS hops FROM lineitem
    ), v0 AS (SELECT node FROM f0),
    """
    + ",".join(_BFS_ITER.format(i=i, prev=i - 1) for i in range(1, 4))
    + """
    SELECT node AS part, CAST(hops AS INTEGER) AS hops FROM (
      SELECT * FROM f0 UNION ALL SELECT * FROM f1
      UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
    )
    """,
)
def q_part_copurchase_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability over the part co-purchase graph: BFS hop
    distance from the lowest part key, where parts are adjacent when some
    order contains both (``ops/graph.bfs_hops``, 3 synchronous frontier
    expansions) — the "customers who bought X also bought..." neighborhood
    expansion. Edge generation is the order-keyed self-join (bounded
    pairs per order — orders hold a handful of lineitems, never
    quadratic); per iteration the CURRENT frontier joins the checkpointed
    edge list and anti-joins the visited set, so work is
    frontier × degree, never |V|²; lineage stays O(1) via localCheckpoint.
    Distances are exact integers — the oracle replays the same frontier
    algebra as unrolled SQL."""
    from fxspark.ops.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    # Dedup on the CANONICAL (src < dst) pairs — half the rows of the
    # directed list — and checkpoint BEFORE mirroring, so the union's two
    # branches read the materialized 1.2M-row frame instead of each
    # re-running the order-keyed self-join (round 17; the mirror of a
    # canonical distinct is distinct by construction, so bfs_hops skips
    # its own 2.4M-row dedup via assume_distinct).
    e0 = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = li.agg(F.min("l_partkey").alias("node"))
    return bfs_hops(edges, seeds, max_hops=3, assume_distinct=True).select(
        F.col("node").alias("part"),
        F.col("hops").cast("int").alias("hops"),
    )


@query(
    "orders_delta_agg_replay",
    oracle="""
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    -- an undated order has no tick (never enters state OR delta); a NULL
    -- status is NOT a finalized order, so it is never retracted — spelled
    -- null-safe because bare status='F' is three-valued under NULLs
    WHERE o.o_orderdate IS NOT NULL
      AND NOT (o.o_orderdate < TIMESTAMP '1995-07-01'
               AND coalesce(o.o_orderstatus, '') = 'F')
    GROUP BY n.n_name
    """,
)
def q_orders_delta_agg_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-set maintenance of a revenue-by-nation aggregate view
    (``ops/ivm.delta_agg``): the stored state is built from pre-1995-07
    orders, then ONE batch folds in the later orders as inserts (+1) AND
    retracts the old fulfilled ('F') orders (−1) — signed-multiset
    algebra, never a base-table re-read. Counts/sums maintain in exact
    DECIMAL(38,6), fully-retracted keys drop, so the maintained view is
    bit-equal to the oracle's from-scratch recompute over the net row
    set. The aggregate-side complement of ``orders_delta_join``'s
    join-view maintenance; replaces the reference's per-tick full-store
    re-aggregation (``Fx_1min.py:147-217``) with batch-proportional
    work."""
    from fxspark.ops.ivm import delta_agg

    split = F.lit("1995-07-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    with_nation = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders["o_custkey"] == F.col("c_custkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(
        F.col("n_name").alias("nation"),
        "o_totalprice",
        "o_orderdate",
        "o_orderstatus",
    )
    old = with_nation.filter(F.col("o_orderdate") < split)
    state = old.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("o_totalprice"),
    )
    delta = (
        with_nation.filter(F.col("o_orderdate") >= split)
        .withColumn("sign", F.lit(1))
        .unionByName(
            old.filter(F.col("o_orderstatus") == "F").withColumn(
                "sign", F.lit(-1)
            )
        )
    )
    view = delta_agg(
        state,
        delta,
        keys=["nation"],
        sum_cols=["o_totalprice"],
        sign_col="sign",
        count_col="n_orders",
    )
    return view.select(
        "nation",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("o_totalprice").cast("double").alias("revenue"),
    )


@query(
    "doc_token_coverage",
    oracle="""
    WITH t AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    ), c AS (
      SELECT token, count(*) AS cnt FROM t GROUP BY token
    ), tot AS (SELECT count(*) AS total FROM t),
    top AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank
      FROM c ORDER BY cnt DESC, token LIMIT 500
    )
    SELECT rank, token, CAST(cnt AS BIGINT) AS cnt,
           CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT) AS cum_tokens,
           CAST(sum(cnt) OVER (ORDER BY rank) AS DOUBLE) / tot.total
             AS cum_share
    FROM top CROSS JOIN tot
    """,
)
def q_doc_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all token occurrences
    the top-k vocabulary covers, for k = 1…500 — the table that sizes a
    tokenizer vocabulary (the knee of this curve IS the vocab-size
    decision). The corpus-sized vocabulary never sorts globally: the
    top-500 cut uses the two-phase bounded rank, and only those 500 rows
    enter the cumulative window. The share divides an exact cumulative
    BIGINT by the exact corpus total, double-cast in pinned order."""
    from fxspark.ops.latest import k_largest_global
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    c = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # total from the vocabulary-sized counts frame: deriving it from `tok`
    # would re-execute the corpus tokenize+explode (different exchange, no
    # reuse) — same cost class as the containment_pairs 2.5x re-execution
    tot = c.agg(F.sum("cnt").alias("total"))
    top = k_largest_global(c, "cnt", 500, "token").select("token", "cnt")
    w = Window.orderBy(F.col("cnt").desc(), "token")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "cnt",
            F.sum("cnt").over(wc).cast("long").alias("cum_tokens"),
            (F.sum("cnt").over(wc).cast("double") / F.col("total")).alias(
                "cum_share"
            ),
        )
    )


@query(
    "session_top_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      -- sessionize drops NULL-ts rows by contract (unplaceable on
      -- the timeline; engines disagree on default NULL placement)
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM flagged
    ), paths AS (
      -- coalesce to '': both engines SKIP NULL types inside a path, but
      -- an all-NULL session renders '' via Spark's array_join where
      -- string_agg over zero non-NULLs yields NULL.
      SELECT user_id, session_id,
             coalesce(string_agg(event_type, '>' ORDER BY ts, event_id),
                      '') AS path,
             count(*) AS n
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def q_session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining: sessionize (30-min gap), render each
    session as its ordered event-type sequence, rank the 20 most common
    paths — the funnel-discovery complement of ``event_funnel_stages``
    (which checks ONE declared path; this finds which paths exist). The
    per-session sequence is a ``collect_list`` of (ts, event_id, type)
    structs sorted in-row — bounded by session length, deterministic via
    the unique event_id even under equal timestamps (session ASSIGNMENT is
    tie-robust by construction: an equal-ts row never opens a new
    session). Path counting is a hash-agg on the path string; the global
    top-20 is TakeOrdered, never a full sort."""
    from fxspark.ops.windows import sessionize

    events = load_table(spark, sf_dir, "events")
    sess = sessionize(
        events, "user_id", "ts", F.expr("INTERVAL 30 MINUTES"),
        tiebreak=["event_id"],
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"), F.col("event_id"), F.col("event_type")
                        )
                    )
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@query(
    "events_histogram_quantiles",
    oracle="""
    WITH stats AS (
      SELECT min(value) AS mn, max(value) AS mx,
             (max(value) - min(value)) / 64 AS width
      FROM events
    ), binned AS (
      SELECT e.event_type,
             CAST(least(63, floor((e.value - s.mn) / s.width)) AS INTEGER)
               AS bin
      FROM events e CROSS JOIN stats s
    ), bc AS (
      SELECT event_type, bin, count(*) AS cnt
      FROM binned GROUP BY event_type, bin
    ), cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM bc
    ), qb AS (
      SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             min(CASE WHEN cum * 100 >= 50 * n THEN bin END) AS b50,
             min(CASE WHEN cum * 100 >= 90 * n THEN bin END) AS b90,
             min(CASE WHEN cum * 100 >= 99 * n THEN bin END) AS b99
      FROM cum GROUP BY event_type
    )
    SELECT q.event_type, q.n,
           s.mn + CAST(q.b50 + 1 AS DOUBLE) * s.width AS p50_est,
           s.mn + CAST(q.b90 + 1 AS DOUBLE) * s.width AS p90_est,
           s.mn + CAST(q.b99 + 1 AS DOUBLE) * s.width AS p99_est
    FROM qb q CROSS JOIN stats s
    """,
)
def q_events_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile estimation: a 64-bin equi-width histogram per
    event_type (bins from the global value range), quantile = upper edge
    of the first bin whose cumulative count crosses the rank — the
    fixed-bin sketch whose per-partition counts merge associatively, vs
    the exact ``percentile`` aggregate (``order_value_percentiles``)
    which must see every value. At 100 TB the histogram is the one that
    streams: 64 longs per (type, partition), map-side combined; the
    cumulative pass runs over ≤ 64 rows per type. Every estimate is
    derived with exact integer rank predicates (cum·100 ≥ q·n) and
    pinned-order double edge arithmetic — no interpolation, no
    engine-specific percentile variant in the hash path."""
    events = load_table(spark, sf_dir, "events")
    stats = events.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        ((F.max("value") - F.min("value")) / 64).alias("width"),
    )
    # try_divide: a single-valued input makes width 0 → DuckDB's division
    # yields NULL (least() then skips it → bin 63) while Spark's ANSI
    # division throws (round-14 sf_unit registry sweep).
    binned = events.crossJoin(F.broadcast(stats)).select(
        "event_type",
        F.least(
            F.lit(63),
            F.floor(
                F.try_divide(F.col("value") - F.col("mn"), F.col("width"))
            ),
        )
        .cast("int")
        .alias("bin"),
    )
    bc = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wb = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("event_type")
    cum = bc.select(
        "event_type",
        "bin",
        F.sum("cnt").over(wb).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    qb = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("cum") * 100 >= 50 * F.col("n"), F.col("bin"))
        ).alias("b50"),
        F.min(
            F.when(F.col("cum") * 100 >= 90 * F.col("n"), F.col("bin"))
        ).alias("b90"),
        F.min(
            F.when(F.col("cum") * 100 >= 99 * F.col("n"), F.col("bin"))
        ).alias("b99"),
    )
    return qb.crossJoin(F.broadcast(stats)).select(
        "event_type",
        "n",
        (F.col("mn") + (F.col("b50") + 1).cast("double") * F.col("width"))
        .alias("p50_est"),
        (F.col("mn") + (F.col("b90") + 1).cast("double") * F.col("width"))
        .alias("p90_est"),
        (F.col("mn") + (F.col("b99") + 1).cast("double") * F.col("width"))
        .alias("p99_est"),
    )


@query(
    "doc_shingle_containment",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t)-1)])) AS s
      FROM toks WHERE len(t) >= 3
    ), rare AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) <= 50
    ), inv AS (
      SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM inv GROUP BY doc_id
    ), pair AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT p.id_a, p.id_b,
           CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
           CAST(p.shared AS BIGINT) AS shared,
           round(CAST(p.shared AS DOUBLE) / least(sa.sz, sb.sz), 6)
             AS containment
    FROM pair p
    JOIN sz sa ON p.id_a = sa.doc_id
    JOIN sz sb ON p.id_b = sb.doc_id
    WHERE round(CAST(p.shared AS DOUBLE) / least(sa.sz, sb.sz), 6) >= 0.5
    """,
)
def q_doc_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup detection
    (``ops/dedup.containment_pairs``): pairs where one document's rare-
    shingle set is ≥50 % contained in the other — the partial-copy /
    quotation detector symmetric Jaccard misses (a paragraph pasted into
    a 10× longer page has low resemblance but high containment). The
    inverted index drops shingles with document frequency > 50 (declared:
    stop-shingles carry no identification signal and their posting lists
    are what makes the self-join quadratic), so the pair stage is
    candidate-bounded; the oracle replays the same rare-shingle
    universe."""
    from fxspark.ops.dedup import containment_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    return containment_pairs(
        docs, "doc_id", "text", n=3, min_shared=2,
        max_shingle_freq=50, threshold=0.5,
    ).select(
        F.col("id_a"), F.col("id_b"),
        F.col("sz_a").cast("long").alias("sz_a"),
        F.col("sz_b").cast("long").alias("sz_b"),
        F.col("shared").cast("long").alias("shared"),
        "containment",
    )


@query(
    "orders_mom_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    )
    SELECT CAST(c.mon AS TIMESTAMP) AS month, c.n_orders, c.revenue,
           round((c.revenue - p.revenue) / p.revenue, 6) AS mom_growth,
           round((c.revenue - y.revenue) / y.revenue, 6) AS yoy_growth
    FROM m c
    LEFT JOIN m p ON p.mon = c.mon - INTERVAL 1 MONTH
    LEFT JOIN m y ON y.mon = c.mon - INTERVAL 12 MONTH
    """,
)
def q_orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth — the BI
    staple, built calendar-safely: growth joins the month rollup to
    itself on explicit month arithmetic (``add_months``), so a missing
    month yields NULL growth instead of silently comparing against the
    wrong lag row (the ``lag(1)``-over-months form breaks on gaps).
    Corpus-sized work is one hash rollup; the growth joins run on
    month-grain rows (calendar-bounded). Decimal-exact revenue sums are
    double-cast BEFORE the subtraction — DECIMAL(38,6)−DECIMAL(38,6)
    needs 39 digits and silently demotes to float in DuckDB, so both
    engines subtract the same doubles instead."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.trunc("o_orderdate", "month").alias("mon")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("revenue"),
    )
    c = m.alias("c")
    p = m.select(
        F.add_months("mon", 1).alias("mon_p"),
        F.col("revenue").alias("rev_p"),
    )
    y = m.select(
        F.add_months("mon", 12).alias("mon_y"),
        F.col("revenue").alias("rev_y"),
    )
    return (
        c.join(p, F.col("mon") == F.col("mon_p"), "left")
        .join(y, F.col("mon") == F.col("mon_y"), "left")
        .select(
            F.col("mon").cast("timestamp").alias("month"),
            "n_orders",
            "revenue",
            F.round(
                (F.col("revenue") - F.col("rev_p")) / F.col("rev_p"), 6
            ).alias("mom_growth"),
            F.round(
                (F.col("revenue") - F.col("rev_y")) / F.col("rev_y"), 6
            ).alias("yoy_growth"),
        )
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT c.c_custkey,
             date_diff('day', CAST(max(o.o_orderdate) AS DATE),
                       (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             count(*) AS n_orders,
             sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS monetary
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ),
    -- boundaries are PER-DIMENSION over that dimension's NON-NULL values
    -- (quantile_bins' domain): a shared rank set from the total row count
    -- would shift every boundary as soon as one dimension has NULLs
    -- (round-16 sf0.01-scale independent-null probe)
    rst AS (SELECT count(*) AS c FROM base WHERE recency_days IS NOT NULL),
    rtk AS (SELECT i, (c * i + 4) // 5 AS k
            FROM rst, (SELECT unnest(range(1, 5)) AS i)),
    rr AS (SELECT recency_days AS v,
                  row_number() OVER (ORDER BY recency_days) AS rn
           FROM base WHERE recency_days IS NOT NULL),
    rb AS (SELECT rr.v AS bv FROM rr JOIN rtk ON rr.rn = rtk.k),
    fst AS (SELECT count(*) AS c FROM base WHERE n_orders IS NOT NULL),
    ftk AS (SELECT i, (c * i + 4) // 5 AS k
            FROM fst, (SELECT unnest(range(1, 5)) AS i)),
    fr AS (SELECT n_orders AS v,
                  row_number() OVER (ORDER BY n_orders) AS rn
           FROM base WHERE n_orders IS NOT NULL),
    fb AS (SELECT fr.v AS bv FROM fr JOIN ftk ON fr.rn = ftk.k),
    mst AS (SELECT count(*) AS c FROM base WHERE monetary IS NOT NULL),
    mtk AS (SELECT i, (c * i + 4) // 5 AS k
            FROM mst, (SELECT unnest(range(1, 5)) AS i)),
    mr AS (SELECT monetary AS v,
                  row_number() OVER (ORDER BY monetary) AS rn
           FROM base WHERE monetary IS NOT NULL),
    mb AS (SELECT mr.v AS bv FROM mr JOIN mtk ON mr.rn = mtk.k),
    scored AS (
      -- NULL dimension values are outside the bin domain (NULL score),
      -- matching quantile_bins_multi; n_orders is a count and never NULL.
      SELECT c_custkey, recency_days, n_orders, monetary,
             CASE WHEN b.recency_days IS NULL THEN NULL
                  ELSE CAST(5 - (SELECT count(*) FROM rb
                            WHERE rb.bv < b.recency_days) AS INTEGER) END AS r,
             CAST(1 + (SELECT count(*) FROM fb
                       WHERE fb.bv < b.n_orders) AS INTEGER) AS f,
             CASE WHEN b.monetary IS NULL THEN NULL
                  ELSE CAST(1 + (SELECT count(*) FROM mb
                            WHERE mb.bv < b.monetary) AS INTEGER) END AS m
      FROM base b
    )
    SELECT r AS r_score, f AS f_score, m AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(recency_days AS DECIMAL(38,0))) AS DOUBLE)
             / count(*) AS avg_recency_days,
           CAST(sum(monetary) AS DOUBLE) / count(*) AS avg_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: score every customer 1-5 on Recency / Frequency /
    Monetary quintiles and report each of the ≤125 segments' size and
    averages — the marketing-warehouse workhorse, now through
    ``ops/quantile.quantile_bins`` (the scale form the previous global-
    ntile version's docstring promised): exact rank-``ceil(c*i/5)``
    boundaries per dimension, located via coarse histograms, broadcast,
    binned map-side — no unpartitioned window. Declared tie semantics:
    equal values share a quintile (value-deterministic, no tiebreak
    column). The customer-grain base is lazily localCheckpointed so the
    three dimensions' boundary scans reuse one computed frame instead of
    re-running the join."""
    from fxspark.ops.quantile import quantile_bins_multi

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    maxd = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("_maxd")
    )
    base = (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"]
        )
        .groupBy("c_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_lastd"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias(
                "monetary"
            ),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn("recency_days", F.datediff("_maxd", "_lastd"))
        .select("c_custkey", "recency_days", "n_orders", "monetary")
        .localCheckpoint(eager=False)
    )
    # r_score: recent (low recency_days) = 5 — exactly descending labels.
    # One fused boundary pass for all three dimensions; every dimension is
    # exactly representable in decimal(38,6) (int days, long counts,
    # decimal(38,6) monetary), so the shared cast loses nothing.
    scored = quantile_bins_multi(
        base,
        [
            ("recency_days", 5, "r_score", True),
            ("n_orders", 5, "f_score", False),
            ("monetary", 5, "m_score", False),
        ],
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.sum(F.col("recency_days").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_recency_days"),
        (F.sum("monetary").cast("double") / F.count(F.lit(1))).alias(
            "avg_monetary"
        ),
    )


@query(
    "lineitem_discount_elasticity",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS x,
             l_extendedprice * (1 - l_discount) AS y
      FROM lineitem
    ), s AS (
      SELECT l_returnflag, count(*) AS n_obs,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(38,6)))
                  AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx
      FROM r GROUP BY l_returnflag
    ), f AS (
      SELECT l_returnflag, n_obs, sx, sy,
             CASE WHEN n_obs * sxx - sx * sx > 0
                  THEN (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx)
             END AS sl
      FROM s
    )
    SELECT l_returnflag, CAST(n_obs AS BIGINT) AS n_obs,
           round(sl, 6) AS slope_per_pct,
           round((sy - sl * sx) / n_obs, 6) AS intercept
    FROM f
    """,
)
def q_lineitem_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-vs-discount regression per return flag
    (``ops/stats.grouped_ols`` on TPC-H facts): slope of line revenue
    against the discount percentage — the pricing-analytics read of
    whether discounts correlate with larger line values. Demonstrates the
    OLS operator on an integer regressor that is NOT time (discount
    points 0-10): five exact-decimal sufficient statistics in one
    partial-combined groupBy, same shuffle as a plain rollup."""
    from fxspark.ops.stats import grouped_ols

    li = load_table(spark, sf_dir, "lineitem")
    fit = grouped_ols(
        li,
        "l_returnflag",
        x=F.round(F.col("l_discount") * 100, 0),
        y=F.col("l_extendedprice") * (1 - F.col("l_discount")),
    )
    return fit.select(
        "l_returnflag",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round("slope", 6).alias("slope_per_pct"),
        F.round("intercept", 6).alias("intercept"),
    )


@query(
    "embedding_knn_label_agreement",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, {_dbl('embedding')} AS emb FROM embeddings
    ), p AS (
      SELECT vec_id AS qid, label AS plabel, emb AS qv FROM e
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64
    ), scored AS (
      SELECT p.qid, p.plabel, e.vec_id, e.label,
             {_COS_SQL.format(a='e.emb', b='p.qv')} AS cos
      FROM e CROSS JOIN p WHERE e.vec_id <> p.qid
    ), top AS (
      SELECT qid, plabel, label,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id) AS rk
      FROM scored
    ), sel AS (
      SELECT qid, plabel,
             sum(CASE WHEN label = plabel THEN 1 ELSE 0 END) AS m
      FROM top WHERE rk <= 5 GROUP BY 1, 2
    )
    SELECT CAST(plabel AS INTEGER) AS label,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(m) AS BIGINT) AS n_matches,
           CAST(sum(m) AS DOUBLE) / (5 * count(*)) AS agreement
    FROM sel GROUP BY plabel
    """,
)
def q_embedding_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality eval: k-NN label agreement@5 on a DECLARED
    64-vector probe sample (md5-smallest vec_ids — the reservoir-sample
    treatment, so the eval set is reproducible and the oracle replays
    it). For each probe, do its 5 nearest neighbors share its label? —
    the standard sanity metric before trusting an embedding column for
    semantic dedup or ANN retrieval. The probe set is broadcast
    (``ops/similarity.knn_join``), so the corpus never shuffles:
    eval cost is |probes| × corpus map-side, constant in corpus count
    for a fixed probe budget; the probe CUT itself is the two-phase
    bounded rank.

    Precondition: ``vec_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — sf_dups boundary):
    duplicate ids fan out the label re-join AND double neighbor slots,
    silently corrupting agreement@5 (found by the round-17 full-registry
    sf_dups sweep — the one silent mismatch among 13 affected queries)."""
    from fxspark.ops.latest import k_smallest_global
    from fxspark.ops.similarity import knn_join

    emb = require_unique(
        spread(load_table(spark, sf_dir, "embeddings")),
        "vec_id",
        context="embedding_knn_label_agreement",
    )
    probes = k_smallest_global(
        emb.withColumn("_h", F.md5(F.col("vec_id").cast("string"))),
        ["_h", "vec_id"],
        64,
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("plabel"),
        "embedding",
    )
    knn = knn_join(
        probes.select("qid", "embedding"), emb, k=5, exclude_same_id=True
    )
    labeled = knn.join(
        emb.select("vec_id", "label"), "vec_id"
    ).join(F.broadcast(probes.select("qid", "plabel")), "qid")
    sel = labeled.groupBy("qid", "plabel").agg(
        F.sum(
            F.when(F.col("label") == F.col("plabel"), 1).otherwise(0)
        ).alias("m")
    )
    return sel.groupBy(F.col("plabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("m").cast("long").alias("n_matches"),
        (
            F.sum("m").cast("double") / (5 * F.count(F.lit(1)))
        ).alias("agreement"),
    )


@query(
    "user_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type, CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 1000000.0, 6)
             AS median_gap_s,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.95) / 1000000.0, 6)
             AS p95_gap_s,
           round(max(gap_us) / 1000000.0, 6) AS max_gap_s
    FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
    """,
)
def q_user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per event type: the time since the
    same user's PREVIOUS event (any type), as exact epoch-microsecond
    integers from one lag window — the measurement that SIZES the
    sessionization gap (`session_stats`' 30-min parameter) and a
    streaming watermark delay: pick the gap quantile you are willing to
    bridge, everything longer is a new session / late data. One key
    shuffle; percentiles interpolate identical doubles in both
    engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = events.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(
            F.expr("percentile(CAST(gap_us AS DOUBLE), 0.5)") / 1000000.0, 6
        ).alias("median_gap_s"),
        F.round(
            F.expr("percentile(CAST(gap_us AS DOUBLE), 0.95)") / 1000000.0, 6
        ).alias("p95_gap_s"),
        F.round(F.max("gap_us") / 1000000.0, 6).alias("max_gap_s"),
    )


@query(
    "shingle_novelty_curve",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id // 25 AS batch,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t)-1)])) AS s
      FROM toks WHERE len(t) >= 3
    ), occ AS (
      SELECT doc_id // 25 AS batch, count(*) AS n_docs,
             sum(len(string_split(lower(trim(text)), ' '))) AS n_tokens
      FROM documents GROUP BY 1
    ), first AS (
      SELECT s, min(batch) AS fb FROM sh GROUP BY s
    ), newt AS (
      SELECT fb AS batch, count(*) AS new_shingles FROM first GROUP BY fb
    )
    SELECT o.batch,
           CAST(o.n_docs AS BIGINT) AS n_docs,
           CAST(o.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(n.new_shingles, 0) AS BIGINT) AS new_shingles,
           CAST(sum(coalesce(n.new_shingles, 0)) OVER (
             ORDER BY o.batch
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS shingle_vocab
    FROM occ o LEFT JOIN newt n ON o.batch = n.batch
    """,
)
def q_shingle_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law novelty curve over token TRIGRAMS: split the corpus into
    25-document batches (by doc_id — declared order), count each batch's
    never-seen-before shingles (first-seen batch per shingle — the
    ``daily_new_users`` collapse applied to the shingle space) and the
    cumulative shingle vocabulary — the flattening test that tells a
    curation pipeline when additional corpus stops contributing novel
    n-gram structure (and exposes template/synthetic text, whose curve
    goes flat early). Corpus-sized work is two hash-aggs (distinct
    (batch, shingle), first-seen min); the cumulative window runs over
    BATCH-grain rows only."""
    from fxspark.ops.dedup import shingles
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        F.expr("doc_id div 25").alias("batch"),
        F.explode(shingles(F.col("text"), 3)).alias("s"),
    ).distinct()
    occ = docs.groupBy(F.expr("doc_id div 25").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("n_tokens"),
    )
    first = sh.groupBy("s").agg(F.min("batch").alias("fb"))
    newt = first.groupBy(F.col("fb").alias("batch")).agg(
        F.count(F.lit(1)).alias("new_shingles")
    )
    w = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        occ.join(newt, "batch", "left")
        .withColumn(
            "new_shingles", F.coalesce(F.col("new_shingles"), F.lit(0))
        )
        .select(
            "batch",
            "n_docs",
            "n_tokens",
            F.col("new_shingles").cast("long").alias("new_shingles"),
            F.sum("new_shingles").over(w).cast("long").alias("shingle_vocab"),
        )
    )


@query(
    "user_value_autocorr",
    oracle="""
    WITH q AS (
      -- the series is the user's OBSERVED points: NULL-ts rows are
      -- unplaceable, NULL values are missing observations
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(38,6)) AS DECIMAL(18,6)) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), p AS (
      SELECT user_id, v AS y,
             lag(v) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
      FROM q
    ), s AS (
      SELECT user_id, count(*) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM p WHERE x IS NOT NULL GROUP BY user_id HAVING count(*) >= 10
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS lag1_autocorr
    FROM s
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
)
def q_user_value_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series — the
    mean-reversion / momentum diagnostic (near 0: values are i.i.d.
    noise; positive: trending; negative: oscillating), and the
    single-series companion of ``user_value_correlation``'s cross-series
    Pearson. Consecutive pairs come from one lag window per user;
    values are quantized to DECIMAL(18,6) so every product is an exact
    DECIMAL(37,12) and every sum exact — the final Pearson expression
    divides identical doubles in both engines."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    v = F.col("value").cast("decimal(38,6)").cast("decimal(18,6)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = events.select(
        "user_id", v.alias("y"), F.lag(v).over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    s = p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    ).filter(F.col("n") >= 10)
    n = F.col("n").cast("double")
    det_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    det_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(det_x) * F.sqrt(det_y)
    )
    return s.filter((det_x > 0) & (det_y > 0)).select(
        "user_id",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(corr, 6).alias("lag1_autocorr"),
    )


@query(
    "events_value_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(regexp_extract(CAST(value AS VARCHAR), '[1-9]')
                  AS INTEGER) AS digit
      FROM events WHERE value > 0
    ), c AS (
      SELECT digit, count(*) AS n FROM d
      WHERE digit IS NOT NULL GROUP BY digit
    ), t AS (SELECT sum(n) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / t.total AS obs_share,
           CASE digit
             WHEN 1 THEN CAST(0.3010299956639812 AS DOUBLE)
             WHEN 2 THEN CAST(0.17609125905568124 AS DOUBLE)
             WHEN 3 THEN CAST(0.12493873660829992 AS DOUBLE)
             WHEN 4 THEN CAST(0.09691001300805642 AS DOUBLE)
             WHEN 5 THEN CAST(0.07918124604762482 AS DOUBLE)
             WHEN 6 THEN CAST(0.06694678963061322 AS DOUBLE)
             WHEN 7 THEN CAST(0.05799194697768673 AS DOUBLE)
             WHEN 8 THEN CAST(0.05115252244738129 AS DOUBLE)
             WHEN 9 THEN CAST(0.04575749056067514 AS DOUBLE)
           END AS benford_share
    FROM c CROSS JOIN t
    """,
)
def q_events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic screen: the first-significant-digit
    distribution of positive values vs the log10(1+1/d) expectation —
    the classic fabricated-data / unit-mixing detector for a numeric
    fact column. The digit is extracted from the value's STRING form
    (first [1-9] — correct for plain and scientific notation alike,
    avoiding the floor(log10) ulp trap at powers of ten); expected
    shares are python-computed literals injected into BOTH engines
    (the Fellegi-Sunter injected-weights discipline). One map-side
    projection + a 9-row aggregate."""
    events = load_table(spark, sf_dir, "events")
    ben = {1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992, 4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322, 7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514}
    d = events.filter(F.col("value") > 0).select(
        F.regexp_extract(F.col("value").cast("string"), "[1-9]", 0)
        .cast("int")
        .alias("digit")
    ).filter(F.col("digit").isNotNull())
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    expected = F.lit(None).cast("double")
    for dg, share in sorted(ben.items(), reverse=True):
        expected = F.when(F.col("digit") == dg, F.lit(share)).otherwise(
            expected
        )
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("total")).alias("obs_share"),
        expected.alias("benford_share"),
    )


@query(
    "supplier_nation_herfindahl",
    oracle="""
    WITH sr AS (
      SELECT s.s_nationkey, l.l_suppkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(38,6))) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ), nr AS (
      SELECT s_nationkey, count(*) AS n_suppliers, sum(rev) AS nrev
      FROM sr GROUP BY s_nationkey
    ), shares AS (
      SELECT sr.s_nationkey,
             CAST(sr.rev AS DOUBLE) / CAST(nr.nrev AS DOUBLE) AS share
      FROM sr JOIN nr USING (s_nationkey)
    )
    SELECT n.n_name AS nation,
           CAST(max(nr.n_suppliers) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(s.share * s.share AS DECIMAL(38,9)))
                AS DOUBLE) AS hhi,
           round(max(s.share), 6) AS top_share
    FROM shares s
    JOIN nr ON s.s_nationkey = nr.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_supplier_nation_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation: the Herfindahl-
    Hirschman index (sum of squared revenue shares) plus the top
    supplier's share — the market-structure read that flags nations
    where one supplier dominates (procurement risk). Revenue rolls up
    decimal-exact; each share divides identical exact operands, and the
    squared-share terms are truncated to DECIMAL(38,9) before the exact
    sum so the HHI is order-independent. Two key-partitioned rollups +
    a broadcast nation join."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(38,6)")
    sr = (
        li.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(rev).alias("rev"))
    )
    nr = sr.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev").alias("nrev"),
    )
    shares = sr.join(nr, "s_nationkey").select(
        "s_nationkey",
        "n_suppliers",
        (F.col("rev").cast("double") / F.col("nrev").cast("double"))
        .alias("share"),
    )
    return (
        shares.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n_suppliers").cast("long").alias("n_suppliers"),
            F.sum(
                (F.col("share") * F.col("share")).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("hhi"),
            F.round(F.max("share"), 6).alias("top_share"),
        )
    )



@query(
    "doc_language_confusion",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> list_contains(['the','and','of','is','to'], x))) AS en,
        len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht'], x))) AS de,
        len(list_filter(toks, x -> list_contains(['le','la','et','est','les'], x))) AS fr,
        len(list_filter(toks, x -> list_contains(['el','los','que','y','es'], x))) AS es
      FROM t
    ), pred AS (
      SELECT lang AS actual_lang,
        CASE WHEN en IS NULL OR greatest(en, de, fr, es) = 0 THEN 'unknown'
             WHEN es > greatest(en, de, fr) THEN 'es'
             WHEN fr > greatest(en, de) THEN 'fr'
             WHEN de > en THEN 'de'
             ELSE 'en' END AS pred_lang
      FROM s
    ), cell AS (
      SELECT actual_lang, pred_lang, count(*) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT actual_lang, pred_lang, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY actual_lang) AS share_of_actual
    FROM cell
    """,
)
def q_doc_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the engine's OWN language
    identifier: `ops/text.lang_id` predictions against the table's
    ground-truth ``lang``, as (actual, predicted, count, share-of-actual)
    cells — the per-class recall diagonal read. Evaluating a built-in
    operator against labels inside the engine is the pattern every
    curation pipeline needs before trusting a heuristic gate at 100 TB;
    the matrix itself is a hash-agg plus a language-cardinality-bounded
    share window."""
    from fxspark.ops.text import lang_id

    docs = spread(load_table(spark, sf_dir, "documents"))
    pred = docs.select(
        F.col("lang").alias("actual_lang"),
        lang_id(F.col("text")).alias("pred_lang"),
    )
    cell = pred.groupBy("actual_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("actual_lang")
    return cell.select(
        "actual_lang",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias(
            "share_of_actual"
        ),
    )


@query(
    "event_transition_eval",
    oracle="""
    WITH r AS (
      -- same chain domain as event_transition_matrix
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), pairs AS (
      SELECT user_id, rn, n, event_type AS dst,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS src
      FROM r
    ), train AS (
      SELECT src, dst FROM pairs
      WHERE src IS NOT NULL AND rn * 10 <= 8 * n
    ), model AS (
      SELECT src, dst AS pred FROM (
        SELECT src, dst, row_number() OVER (
          PARTITION BY src ORDER BY count(*) DESC, dst) AS rk
        FROM train GROUP BY src, dst
      ) WHERE rk = 1
    ), test AS (
      SELECT src, dst FROM pairs
      WHERE src IS NOT NULL AND (rn - 1) * 10 > 8 * n
    )
    SELECT t.src, CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.dst = m.pred THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(sum(CASE WHEN t.dst = m.pred THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS accuracy
    FROM test t JOIN model m ON t.src = m.src
    GROUP BY t.src
    """,
)
def q_event_transition_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtested next-event prediction: train a first-order Markov
    argmax model (most frequent successor per event type, deterministic
    tiebreak) on each user's FIRST 80 % of events and score it on pairs
    fully inside the LAST 20 % — the train/test temporal-split
    discipline applied to ``event_transition_matrix``, with exact
    integer rank predicates (rn·10 ≤ 8·n) so the split is engine-
    identical. The model is states²-bounded (broadcast); both phases
    share the per-user sequence shuffle."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    r = events.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pairs = r.select(
        "rn",
        "n",
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("rn")
        ).alias("src"),
    ).filter(F.col("src").isNotNull())
    train = pairs.filter(F.col("rn") * 10 <= 8 * F.col("n"))
    wm = Window.partitionBy("src").orderBy(
        F.col("cnt").desc(), "dst"
    )
    model = (
        train.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("src", F.col("dst").alias("pred"))
    )
    test = pairs.filter((F.col("rn") - 1) * 10 > 8 * F.col("n"))
    hit = F.when(F.col("dst") == F.col("pred"), 1).otherwise(0)
    return (
        test.join(F.broadcast(model), "src")
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(hit).cast("long").alias("n_correct"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias(
                "accuracy"
            ),
        )
    )


@query(
    "embedding_label_outliers",
    oracle="""
    WITH ex AS (
      -- NULL embedding = not a vector (class 10): posexplode emits no
      -- rows for it, so the oracle states the same exclusion — else the
      -- bracket-index NULL elements inflate the centroid mean denominator
      SELECT vec_id, label, g.i AS pos,
             CAST(CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(30,10)) AS val
      FROM embeddings, generate_series(1, 64) g(i)
      WHERE embedding IS NOT NULL
    ), cent AS (
      SELECT label, pos, CAST(sum(val) AS DOUBLE) / count(*) AS c
      FROM ex GROUP BY label, pos
    ), dist AS (
      SELECT ex.vec_id, ex.label,
             sqrt(CAST(sum(CAST(round((CAST(ex.val AS DOUBLE) - cent.c)
                                      * (CAST(ex.val AS DOUBLE) - cent.c),
                                      12) AS DECIMAL(38,12)))
                       AS DOUBLE)) AS d
      FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
      GROUP BY ex.vec_id, ex.label
    ), q AS (
      SELECT vec_id, label, d,
             CAST(CAST(d AS DECIMAL(18,9)) AS DOUBLE) AS dq
      FROM dist
    ), s AS (
      SELECT label, count(*) AS n,
             CAST(sum(CAST(d AS DECIMAL(18,9))) AS DOUBLE) AS sd,
             CAST(sum(CAST(d AS DECIMAL(18,9))
                      * CAST(d AS DECIMAL(18,9))) AS DOUBLE) AS sdd
      FROM q GROUP BY label
    )
    SELECT q.vec_id, q.label, round(q.d, 6) AS dist,
           round((q.dq - s.sd / s.n)
                 / sqrt(s.sdd / s.n - (s.sd / s.n) * (s.sd / s.n)), 6)
             AS z
    FROM q JOIN s ON q.label = s.label
    WHERE s.sdd / s.n - (s.sd / s.n) * (s.sd / s.n) > 0
      AND (q.dq - s.sd / s.n)
            / sqrt(s.sdd / s.n - (s.sd / s.n) * (s.sd / s.n)) > 2
    """,
)
def q_embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label outliers — vectors unusually FAR from their
    own label's centroid (z-score of centroid distance > 2 within the
    label): the mislabeled-or-noisy-example pruning gate a training-data
    pipeline runs before fitting on labeled embeddings. Centroids are
    the exact-decimal (label, dim) partial-sum exchange from
    ``label_centroid_stats``; squared deviations are quantized to
    DECIMAL(38,12) before the per-vector sum, and the distance moments
    to DECIMAL(18,9) before the per-label sums — every double division
    then has identical operands in both engines."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "val"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val").cast("double").cast("decimal(30,10)").alias("val"),
    )
    cent = ex.groupBy("label", "pos").agg(
        (F.sum("val").cast("double") / F.count(F.lit(1))).alias("c")
    )
    dev = F.col("val").cast("double") - F.col("c")
    dist = (
        ex.join(cent, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(
                F.sum(F.round(dev * dev, 12).cast("decimal(38,12)"))
                .cast("double")
            ).alias("d")
        )
    )
    dq = F.col("d").cast("decimal(18,9)")
    q = dist.select(
        "vec_id", "label", "d", dq.cast("double").alias("dq")
    )
    s = dist.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dq).cast("double").alias("sd"),
        F.sum(dq * dq).cast("double").alias("sdd"),
    )
    mean = F.col("sd") / F.col("n")
    var = F.col("sdd") / F.col("n") - mean * mean
    z = (F.col("dq") - mean) / F.sqrt(var)
    return (
        q.join(F.broadcast(s), "label")
        .filter((var > 0) & (z > 2))
        .select(
            "vec_id",
            "label",
            F.round("d", 6).alias("dist"),
            F.round(z, 6).alias("z"),
        )
    )


@query(
    "embedding_quantized_recall",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, {_dbl('embedding')} AS emb FROM embeddings
    ), qz AS (
      SELECT vec_id,
             list_apply(emb,
               x -> greatest(-127, least(127, round(x * 127))) / 127.0)
               AS dq
      FROM e
    ), p AS (
      SELECT e.vec_id AS qid, e.emb AS qv, qz.dq AS qvq
      FROM e JOIN qz ON e.vec_id = qz.vec_id
      ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id LIMIT 16
    ), truth AS (
      SELECT qid, vec_id FROM (
        SELECT p.qid, e.vec_id,
               row_number() OVER (PARTITION BY p.qid ORDER BY
                 {_COS_SQL.format(a='e.emb', b='p.qv')} DESC, e.vec_id)
                 AS rk
        FROM e CROSS JOIN p WHERE e.vec_id <> p.qid
      ) WHERE rk <= 5
    ), approx AS (
      SELECT qid, vec_id FROM (
        SELECT p.qid, qz.vec_id,
               row_number() OVER (PARTITION BY p.qid ORDER BY
                 {_COS_SQL.format(a='qz.dq', b='p.qvq')} DESC, qz.vec_id)
                 AS rk
        FROM qz CROSS JOIN p WHERE qz.vec_id <> p.qid
      ) WHERE rk <= 5
    )
    SELECT t.qid, CAST(count(a.vec_id) AS BIGINT) AS n_overlap,
           CAST(count(a.vec_id) AS DOUBLE) / 5 AS recall_at_5
    FROM truth t LEFT JOIN approx a
      ON t.qid = a.qid AND t.vec_id = a.vec_id
    GROUP BY t.qid
    """,
)
def q_embedding_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of int8 scalar quantization against full-precision
    ground truth, on a DECLARED 16-probe md5 sample — the eval that
    answers "how much retrieval quality does 4× vector compression
    cost" BEFORE shipping a quantized index. Both rankings run as
    broadcast-probe kNN joins (corpus never shuffles); the probe cut is
    the two-phase bounded rank, and quantized values are exact 1/127
    multiples so both engines rank identical doubles.

    Precondition: ``vec_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — sf_dups boundary)."""
    from fxspark.ops.latest import k_smallest_global
    from fxspark.ops.similarity import cosine, dequantize_vec, quantize_vec

    emb = require_unique(
        spread(load_table(spark, sf_dir, "embeddings")), "vec_id",
        context="embedding_quantized_recall",
    )
    e = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
    ).withColumn("dq", dequantize_vec(quantize_vec(F.col("emb"))))
    p = k_smallest_global(
        e.withColumn("_h", F.md5(F.col("vec_id").cast("string"))),
        ["_h", "vec_id"],
        16,
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qv"),
        F.col("dq").alias("qvq"),
    )

    def topk(side: str, probe: str):
        scored = e.crossJoin(F.broadcast(p)).filter(
            F.col("vec_id") != F.col("qid")
        ).select(
            "qid",
            "vec_id",
            cosine(F.col(side), F.col(probe)).alias("cos"),
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("cos").desc(), "vec_id"
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("qid", "vec_id")
        )

    truth = topk("emb", "qv")
    approx = topk("dq", "qvq")
    hit = approx.withColumn("_hit", F.lit(1))
    return (
        truth.join(hit, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("_hit").alias("n_overlap"),
            (F.count("_hit").cast("double") / 5).alias("recall_at_5"),
        )
    )


@query(
    "doc_top_sentence",
    oracle="""
    WITH t AS (
      SELECT doc_id, lower(trim(text)) AS txt FROM documents
    ), sent0 AS (
      SELECT doc_id,
             unnest(string_split(txt, '. ')) AS sentence,
             unnest(range(1, len(string_split(txt, '. ')) + 1))
               AS position
      FROM t
    ), stok AS (
      SELECT doc_id, position, sentence,
             string_split(sentence, ' ') AS toks
      FROM sent0 WHERE len(string_split(sentence, ' ')) >= 3
    ), df AS (
      SELECT token, count(*) AS dfreq FROM (
        SELECT DISTINCT doc_id,
               unnest(string_split(txt, ' ')) AS token
        FROM t
      ) GROUP BY token
    ), tokrows AS (
      SELECT doc_id, position, sentence, len(toks) AS slen,
             unnest(toks) AS token
      FROM stok
    ), scored AS (
      SELECT s.doc_id, s.position, s.sentence,
             CAST(sum(CAST(1.0 / df.dfreq AS DECIMAL(18,9))) AS DOUBLE)
               / s.slen AS score
      FROM tokrows s JOIN df ON s.token = df.token
      GROUP BY s.doc_id, s.position, s.sentence, s.slen
    )
    SELECT doc_id, position, sentence, round(score, 6) AS score
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, position) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def q_doc_top_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractive one-sentence summarization: split each document on
    '. ', score sentences by mean token RARITY (1/document-frequency —
    the transcendental-free idf surrogate, each weight quantized to
    DECIMAL(18,9) before the exact sum), keep the top sentence per doc
    (earliest on ties). The corpus-level document-frequency table is
    the only shuffle-heavy piece and it is vocabulary-sized; sentences
    explode map-side. This is the document-condensation primitive for
    preview/snippet generation over a 100 TB corpus."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("txt")
    )
    sent = t.select(
        "doc_id",
        F.posexplode(F.split(F.col("txt"), "\\. ")).alias(
            "pos0", "sentence"
        ),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("position"),
        "sentence",
        F.split(F.col("sentence"), " ").alias("toks"),
    ).filter(F.size("toks") >= 3)
    dfreq = (
        t.select(
            "doc_id", F.explode(F.split(F.col("txt"), " ")).alias("token")
        )
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("dfreq"))
    )
    stok = sent.select(
        "doc_id",
        "position",
        "sentence",
        F.size("toks").alias("slen"),
        F.explode("toks").alias("token"),
    )
    scored = (
        stok.join(dfreq, "token")
        .groupBy("doc_id", "position", "sentence", "slen")
        .agg(
            (
                F.sum(
                    (F.lit(1.0) / F.col("dfreq")).cast("decimal(18,9)")
                ).cast("double")
                / F.col("slen")
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), "position"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "position", "sentence", F.round("score", 6).alias("score"))
    )



@query(
    "stream_histogram_replay",
    oracle="""
    WITH stats AS (
      SELECT min(value) AS mn, (max(value) - min(value)) / 64 AS width
      FROM events
    )
    SELECT e.event_type,
           CAST(least(63, floor((e.value - s.mn) / s.width)) AS INTEGER)
             AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events e CROSS JOIN stats s
    GROUP BY 1, 2
    """,
)
def q_stream_histogram_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming/stateful.stateful_histogram``'s final
    emission: per event_type the full 64-bin fixed-edge bin vector over
    ``value`` — the bin counters ``events_histogram_quantiles`` derives its
    quantiles from, maintained as O(n_bins) streaming state. Bin counts are
    a pure function of the prefix (order-free integer adds), so the last
    micro-batch emission equals this batch groupBy exactly when the
    declared edges equal the batch min/width — pinned across real
    micro-batches in tests/test_streaming_multimodal.py. Same exact edge
    arithmetic as the quantile query (min/width doubles, floor, clamp 63)."""
    events = load_table(spark, sf_dir, "events")
    stats = events.agg(
        F.min("value").alias("mn"),
        ((F.max("value") - F.min("value")) / 64).alias("width"),
    )
    # try_divide: single-valued input → width 0 → DuckDB NULL vs Spark
    # ANSI throw (round-14 sf_unit registry sweep; see value_histogram).
    return (
        events.crossJoin(F.broadcast(stats))
        .select(
            "event_type",
            F.least(
                F.lit(63),
                F.floor(
                    F.try_divide(
                        F.col("value") - F.col("mn"), F.col("width")
                    )
                ),
            )
            .cast("int")
            .alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "orders_delta_join_ticks",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderdate < DATE '1996-09-01' THEN 0
                  WHEN o_orderdate < DATE '1998-05-01' THEN 1
                  WHEN o_orderdate < DATE '2000-01-01' THEN 2
                  ELSE 3 END AS tko
      FROM orders
    ), l AS (
      SELECT l_orderkey AS o_orderkey, l_extendedprice,
             CASE WHEN l_shipdate < DATE '1996-09-01' THEN 0
                  WHEN l_shipdate < DATE '1998-05-01' THEN 1
                  WHEN l_shipdate < DATE '2000-01-01' THEN 2
                  ELSE 3 END AS tkr
      FROM lineitem
    )
    SELECT CAST(greatest(o.tko, l.tkr) AS INTEGER) AS tick,
           CASE WHEN o.tko = l.tkr AND o.tko = 0 THEN 'initial'
                WHEN o.tko = l.tkr THEN 'both_new'
                WHEN o.tko > l.tkr THEN 'new_left'
                ELSE 'new_right' END AS delta_term,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
             AS sum_price
    FROM o JOIN l USING (o_orderkey)
    GROUP BY 1, 2
    """,
)
def q_orders_delta_join_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TICK incremental maintenance of the orders⋈lineitem view
    (``ops/ivm.delta_join`` beyond the single-tick ``orders_delta_join``):
    both sides split into an initial state plus three yearly insert
    batches; each tick's view delta is the three disjoint terms against
    the then-current state, the deltas fold into the state, and the
    accumulated (initial ∪ Δ₁ ∪ Δ₂ ∪ Δ₃) view is rolled up per (tick,
    term). The oracle is the CLOSED FORM of that loop: every joined pair
    materializes at tick max(tick_left, tick_right) with a term decided
    by which side is newer — equality of the iterative algebra with this
    relabeled full join is exactly the IVM correctness statement. Each
    tick's work is batch×state, never state×state."""
    from fxspark.ops.ivm import delta_join

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cuts = ["1996-09-01", "1998-05-01", "2000-01-01"]

    def tick_of(col: F.Column) -> F.Column:
        t = F.when(col < F.lit(cuts[0]).cast("date"), F.lit(0))
        for i, c in enumerate(cuts[1:], start=1):
            t = t.when(col < F.lit(c).cast("date"), F.lit(i))
        return t.otherwise(F.lit(len(cuts)))

    l_all = orders.select(
        "o_orderkey", tick_of(F.col("o_orderdate")).alias("_tk")
    )
    r_all = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        tick_of(F.col("l_shipdate")).alias("_tk"),
    )
    lp = [l_all.filter(F.col("_tk") == t).drop("_tk") for t in range(4)]
    rp = [r_all.filter(F.col("_tk") == t).drop("_tk") for t in range(4)]
    state_l, state_r = lp[0], rp[0]
    acc = (
        state_l.join(state_r, "o_orderkey")
        .withColumn("delta_term", F.lit("initial"))
        .withColumn("tick", F.lit(0))
    )
    for t in (1, 2, 3):
        d = delta_join(
            state_l, state_r, lp[t], rp[t], ["o_orderkey"]
        ).withColumn("tick", F.lit(t))
        acc = acc.unionByName(d)
        state_l = state_l.unionByName(lp[t])
        state_r = state_r.unionByName(rp[t])
    return acc.groupBy("tick", "delta_term").agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum(F.col("l_extendedprice"), 4).alias("sum_price"),
    )


@query(
    "events_value_topk",
    oracle="""
    -- k_smallest_per_key drops NULL order values by contract (they'd
    -- sort as "largest" via the negation trick); the oracle says so too.
    SELECT user_id, event_id, ts, event_type, value
    FROM events WHERE value IS NOT NULL
    ORDER BY value DESC, event_id
    LIMIT 100
    """,
)
def q_events_value_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global bounded top-k: the 100 highest-value events corpus-wide via
    ``ops/latest.k_largest_global`` — the TWO-PHASE rank (partition-local
    top-k, then a final rank over ≤ k×numPartitions survivors) that
    replaces the single-task global sort a plain ``ORDER BY ... LIMIT``
    window would serialize through. Ties at the cut resolved by event_id
    ascending, declared on both engines."""
    from fxspark.ops.latest import k_largest_global

    events = load_table(spark, sf_dir, "events")
    return k_largest_global(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        "value",
        100,
        "event_id",
    )


@query(
    "nation_revenue_ranking",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT nation, revenue,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM rev WINDOW w AS (ORDER BY revenue DESC, nation)
    """,
)
def q_nation_revenue_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact SQL ranking family (ntile / percent_rank / cume_dist) on
    a frame where a global window is the RIGHT plan: lifetime revenue per
    nation — a 25-row rollup (nation grain is bounded by the dimension
    table). This is the pattern pair to ``customer_spend_quartiles``:
    rank-family windows belong on already-aggregated bounded-grain frames;
    per-entity unbounded frames take the ``ops/quantile`` boundary form.
    The corpus-sized work is one hash rollup; the window sees 25 rows.
    percent_rank and cume_dist are rank/count rationals — identical
    doubles in both engines."""
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), "nation")
    return rev.select(
        "nation",
        "revenue",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "region_customer_spend_quartiles",
    oracle="""
    WITH spend AS (
      SELECT r.r_name AS region, o.o_custkey,
             sum(CAST(o.o_totalprice AS DECIMAL(38,4))) AS sp
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      -- a NULL region name is outside the grouped-binning domain
      -- (quantile_bins_grouped drops NULL group keys by contract)
      WHERE r.r_name IS NOT NULL
      GROUP BY r.r_name, o.o_custkey
    ),
    nn AS (SELECT region, sp FROM spend WHERE sp IS NOT NULL),
    st AS (SELECT region, count(*) AS c FROM nn GROUP BY region),
    rk AS (SELECT region, sp,
                  row_number() OVER (PARTITION BY region ORDER BY sp) AS rn
           FROM nn),
    b AS (
      SELECT rk.region, rk.sp AS bv
      FROM rk JOIN (SELECT region, i, (c * i + 3) // 4 AS k
                    FROM st, (SELECT unnest(range(1, 4)) AS i)) t
        ON rk.region = t.region AND rk.rn = t.k
    ),
    binned AS (
      SELECT s.region, s.sp,
             CASE WHEN s.sp IS NULL THEN NULL
                  ELSE CAST(4 - (SELECT count(*) FROM b
                                 WHERE b.region = s.region AND b.bv < s.sp)
                       AS INTEGER) END AS quartile
      FROM spend s
    )
    SELECT region, quartile, count(*) AS n_customers,
           CAST(min(sp) AS DOUBLE) AS min_spend,
           CAST(max(sp) AS DOUBLE) AS max_spend
    FROM binned GROUP BY region, quartile
    """,
)
def q_region_customer_spend_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-REGION customer spend quartiles via
    ``ops/quantile.quantile_bins_grouped`` — the few-large-groups shape
    where the textbook ``ntile OVER (PARTITION BY region)`` is a scale
    trap: 5 regions over a billion customers serialize each region's
    whole frame through one window task. The grouped boundary form keeps
    every stage keyed — per-(region, bucket) histogram, per-region
    <=1024-row prefix window, extraction ranked inside boundary-bucket
    slices — so parallelism never drops to the group count. Quartile 1 =
    top spenders; declared tie semantics as in ``customer_spend_quartiles``."""
    from fxspark.ops.quantile import quantile_bins_grouped

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    spend = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy(F.col("r_name").alias("region"), F.col("o_custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("sp")
        )
        .localCheckpoint(eager=False)
    )
    binned = quantile_bins_grouped(
        spend, ["region"], "sp", 4, "quartile", descending=True
    )
    return binned.groupBy("region", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("sp").cast("double").alias("min_spend"),
        F.max("sp").cast("double").alias("max_spend"),
    )


@query(
    "lineitem_volume_price_quartiles",
    oracle="""
    WITH src AS (
      SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    mass AS (SELECT v, w FROM src
             WHERE v IS NOT NULL AND w IS NOT NULL),
    st AS (SELECT sum(w) AS tw FROM mass),
    dv AS (SELECT v, sum(w) AS wv FROM mass GROUP BY v),
    cw AS (SELECT v, sum(wv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS cum FROM dv),
    b AS (
      SELECT t.i, min(c.v) AS bv
      FROM (SELECT i, (tw * i + 3) // 4 AS k
            FROM st, (SELECT unnest(range(1, 4)) AS i)) t
      JOIN cw c ON c.cum >= t.k
      GROUP BY t.i
    ),
    binned AS (
      SELECT s.v, s.w,
             CASE WHEN s.v IS NULL OR s.w IS NULL THEN NULL
                  ELSE CAST(4 - (SELECT count(*) FROM b WHERE b.bv < s.v)
                       AS INTEGER) END AS quartile
      FROM src s
    )
    SELECT quartile, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(w) AS BIGINT) AS total_qty,
           CAST(min(v) AS DOUBLE) AS min_price,
           CAST(max(v) AS DOUBLE) AS max_price
    FROM binned GROUP BY quartile
    """,
)
def q_lineitem_volume_price_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VOLUME-WEIGHTED price quartiles over raw lineitem rows
    (``ops/quantile.quantile_bins_weighted``): each boundary is the
    smallest price whose cumulative SHIPPED QUANTITY reaches a quarter of
    total volume — "what price band moves half the units", which plain
    row-count quartiles misstate whenever cheap lines ship big volumes.
    Fact-grain input (not a per-key aggregate): this is the quantile
    family member that must never see a global sort, and doesn't — weight
    histograms localize the crossing, extraction collapses to distinct
    values inside boundary buckets (tie-order-free by construction).
    Quartile 1 = most expensive band."""
    from fxspark.ops.quantile import quantile_bins_weighted

    li = load_table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("w"),
    )
    binned = quantile_bins_weighted(
        src, "v", "w", 4, "quartile", descending=True
    )
    return binned.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("w").cast("long")).alias("total_qty"),
        F.min("v").cast("double").alias("min_price"),
        F.max("v").cast("double").alias("max_price"),
    )


@query(
    "doc_pair_budget_estimate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t)-1)])) AS s
      FROM toks WHERE len(t) >= 3
    ), c AS (
      SELECT s, count(*) AS c FROM sh GROUP BY s
    ), e AS (
      SELECT CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS exact_pairs
      FROM c
    ), smp AS (
      SELECT c FROM c
      WHERE CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
            / 1152921504606846976.0 < 0.125
    ), s2 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_sampled,
             CAST(8 * sum(c * (c - 1) // 2) AS BIGINT) AS est_pairs
      FROM smp
    )
    SELECT e.n_shingles, e.exact_pairs, s2.n_sampled, s2.est_pairs,
           round(abs(CAST(s2.est_pairs AS DOUBLE) - e.exact_pairs)
                 / e.exact_pairs, 6) AS rel_err
    FROM e, s2
    """,
)
def q_doc_pair_budget_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair BUDGET estimator for the dedup tier's inverted-index
    joins (the planning diagnostic that belongs next to
    ``events_key_skew_report``): the shingle self-join behind
    ``doc_jaccard_pairs``/``doc_shingle_containment`` generates
    Σ c·(c−1)/2 pairs over per-shingle document frequencies — this query
    computes that number exactly AND from a declared 1/8 md5 key sample
    (scale-up ×8, exact integer arithmetic), so at 100 TB the estimate
    costs an eighth of the frequency aggregation and tells you whether the
    pair join fits the cluster BEFORE you run it. Sampling by KEY (not by
    row) is what keeps Σc² estimable — row sampling biases pair counts
    quadratically. Both numbers and the relative error are in the output,
    so the estimator's quality is itself differentially pinned."""
    from fxspark.ops.dedup import shingles

    # spread: the shingle explode is the CPU-heavy step and the scan is a
    # single row group locally (round 17 — this was the one heavy documents
    # query missing the module-standard rebalance; solo 2.0 → ~1.2 s).
    docs = spread(load_table(spark, sf_dir, "documents"))
    inv = docs.select(F.explode(shingles(F.col("text"), 3)).alias("s"))
    hfrac = (
        F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long")
        / F.lit(float(2**60))
    )
    # exact and sampled totals in ONE pass over the frequency table: the
    # sample is a predicate, not a second scan (halves the shingle-agg cost
    # vs the two-branch + crossJoin form — and that is also the point of
    # the estimator at 100 TB: the scan you'd actually run is the sampled
    # one alone, with the md5 predicate pushed below the aggregation)
    c = inv.groupBy("s").agg(F.count(F.lit(1)).alias("c")).withColumn(
        "_in", hfrac < 0.125
    )
    e = c.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.expr("c * (c - 1) div 2")).alias("exact_pairs"),
        # count(when), not sum(cast): an EMPTY frequency table must report
        # n_sampled = 0 like the oracle's count(*), not SUM's NULL
        # (round-14 sf_empty sweep finding; _in is never NULL so the two
        # agree on every non-empty input)
        F.count(F.when(F.col("_in"), F.lit(1))).alias("n_sampled"),
        (
            F.lit(8)
            * F.sum(F.when(F.col("_in"), F.expr("c * (c - 1) div 2")))
        ).alias("est_pairs"),
    )
    return e.select(
        "n_shingles",
        "exact_pairs",
        "n_sampled",
        "est_pairs",
        # try_divide: exact_pairs = 0 (no repeated shingle — degenerate
        # inputs) makes DuckDB's division yield NULL where Spark's ANSI
        # division throws (round-14 sf_unit registry sweep).
        F.round(
            F.try_divide(
                F.abs(
                    F.col("est_pairs").cast("double") - F.col("exact_pairs")
                ),
                F.col("exact_pairs"),
            ),
            6,
        ).alias("rel_err"),
    )


def _minhash_agreement_oracle(k: int = 64, bands: int = 16) -> str:
    from fxspark.ops.dedup import _MERSENNE_31 as M
    from fxspark.ops.dedup import _minhash_perms

    r = k // bands
    sig = ", ".join(
        f"min(({a}*x + {b}) % {M}) AS h{i}"
        for i, (a, b) in enumerate(_minhash_perms(k))
    )
    band_arms = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS bn, concat_ws(',', "
        + ", ".join(f"h{i}" for i in range(b * r, (b + 1) * r))
        + ") AS bk FROM sig"
        for b in range(bands)
    )
    eq = " + ".join(f"CAST(sa.h{i} = sb.h{i} AS INT)" for i in range(k))
    jac = (
        "CAST(len(list_intersect(ta.s, tb.s)) AS DOUBLE)"
        " / (len(ta.s) + len(tb.s) - len(list_intersect(ta.s, tb.s)))"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
                                    for i in range(1, len(t)-1)]) AS s
      FROM toks WHERE len(t) >= 3
    ), h AS (
      SELECT doc_id, {_MD5_60.format(c='sh0')} % {M} AS x
      FROM (SELECT doc_id, unnest(s) AS sh0 FROM sh)
    ), sig AS (
      SELECT doc_id, {sig} FROM h GROUP BY doc_id
    ), bands AS (
      {band_arms}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.bn = b.bn AND a.bk = b.bk
                               AND a.doc_id < b.doc_id
    ), p AS (
      SELECT round({jac}, 6) AS jac, ({eq}) AS eq
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
      JOIN sh ta ON ta.doc_id = c.id_a
      JOIN sh tb ON tb.doc_id = c.id_b
    ), bd AS (
      SELECT CAST(CAST(round(jac * 1000000, 0) AS BIGINT) // 100000
                  AS INTEGER) AS jac_band, jac, eq
      FROM p
    )
    SELECT jac_band, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(jac AS DECIMAL(38,6))) AS DOUBLE) / count(*)
             AS mean_jaccard,
           CAST(sum(eq) AS DOUBLE) / ({k}.0 * count(*)) AS mean_estimate,
           CAST(sum(CAST(abs(jac - eq / {k}.0) AS DECIMAL(38,12))) AS DOUBLE)
             / count(*) AS mean_abs_err
    FROM bd GROUP BY jac_band
    """


@query("minhash_estimate_agreement", oracle=_minhash_agreement_oracle())
def q_minhash_estimate_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup-eval family: how faithful is the k=64 MinHash estimate to the
    exact trigram Jaccard, measured on the LSH tier's OWN candidate pairs
    (``ops/dedup.minhash_agreement``) and folded per 0.1-wide exact-Jaccard
    band — the in-engine answer to "can the sketch replace the exact
    verify at this k", the dedup twin of ``embedding_quantized_recall``.
    Estimates are exact multiples of 1/64, so equality counts sum as
    integers; the per-pair |error| is DECIMAL(38,12)-quantized before the
    exact sum (the ``embedding_label_outliers`` pattern) — band means are
    identical doubles in both engines. Candidate generation stays banded
    (never all pairs); low bands exist BECAUSE band collisions happen below
    the S-curve knee, which is exactly the region worth measuring."""
    from fxspark.ops.dedup import minhash_agreement

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = minhash_agreement(
        docs, "doc_id", "text", n=3, k=64, bands=16, hash_fn="md5_60"
    )
    err = F.abs(
        F.col("jaccard") - F.col("eq_components") / F.lit(64.0)
    ).cast("decimal(38,12)")
    return (
        pairs.withColumn(
            "jac_band",
            F.expr(
                "CAST(CAST(round(jaccard * 1000000, 0) AS BIGINT)"
                " div 100000 AS INT)"
            ),
        )
        .groupBy("jac_band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(F.col("jaccard").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_jaccard"),
            (
                F.sum("eq_components").cast("double")
                / (64.0 * F.count(F.lit(1)))
            ).alias("mean_estimate"),
            (F.sum(err).cast("double") / F.count(F.lit(1))).alias(
                "mean_abs_err"
            ),
        )
    )


@query(
    "purchase_regime_enrich",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
      WHERE event_type IN ('view', 'click') AND ts IS NOT NULL
    ), versions AS (
      SELECT user_id, event_type AS regime_type, ts AS valid_from
      FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
    ), purchases AS (
      SELECT user_id, event_id AS p_event_id, ts AS p_ts, value AS p_value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    )
    SELECT user_id, p_event_id, p_ts, p_value, regime_type, regime_since
    FROM (
      SELECT p.user_id, p.p_event_id, p.p_ts, p.p_value,
             v.regime_type, v.valid_from AS regime_since,
             row_number() OVER (PARTITION BY p.user_id, p.p_event_id
                                ORDER BY v.valid_from DESC,
                                         v.regime_type DESC) AS rn
      FROM purchases p LEFT JOIN versions v
        ON p.user_id = v.user_id AND v.valid_from <= p.p_ts
    ) WHERE rn = 1
    """,
)
def q_purchase_regime_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-versioned-dimension lookup — the dimensional-warehouse
    pattern the SCD2 build exists FOR: enrich each purchase with the
    user's browsing regime (the view/click state run from
    ``ops/cdc.scd2_intervals``) valid AT purchase time. Because SCD2
    intervals are consecutive per key, interval containment
    (``valid_from <= t < valid_to``) reduces to a backward as-of join on
    ``valid_from`` — so the lookup runs as ``ops/asof.asof_join``'s
    single sort-shuffle, linear in facts+versions, instead of the
    oracle's quadratic interval join + rank. Purchases before any browse
    event keep NULL regime (left semantics); equal-``valid_from``
    versions resolve by the declared regime_type tiebreak.

    Precondition: ``event_id`` unique (``ops.checks.require_unique``,
    enforced under FXSPARK_VALIDATE_CONTRACTS=1 — a duplicated purchase
    event doubles its enriched fact row; sf_dups boundary)."""
    from fxspark.ops.cdc import scd2_intervals

    events = require_unique(
        load_table(spark, sf_dir, "events"), "event_id",
        context="purchase_regime_enrich",
    )
    browse = events.filter(F.col("event_type").isin("view", "click"))
    dim = scd2_intervals(
        browse, "user_id", ["ts", "event_id"], ["event_type"]
    ).select(
        "user_id",
        F.col("event_type").alias("regime_type"),
        F.col("valid_from").alias("regime_since"),
        F.col("valid_from").alias("p_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    return asof_join(
        purchases,
        dim,
        keys="user_id",
        on="p_ts",
        right_payload=["regime_type", "regime_since"],
        right_tiebreak=["regime_type"],
    )


@query(
    "promo_price_ttest",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(sum(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_treat,
             CAST(sum(CASE WHEN p_type = 'PROMO' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_ctrl,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(38,4))
                  ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS st,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(0 AS DECIMAL(38,4))
                  ELSE CAST(l_extendedprice AS DECIMAL(38,4)) END)
                  AS DOUBLE) AS sc,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * l_extendedprice
                            AS DECIMAL(38,4))
                  ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS qt,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(0 AS DECIMAL(38,4))
                  ELSE CAST(l_extendedprice * l_extendedprice
                            AS DECIMAL(38,4)) END) AS DOUBLE) AS qc
      -- welch_ttest is pairwise-complete by contract: NULL values and
      -- NULL treatment flags are excluded up front on both engines.
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_extendedprice IS NOT NULL AND p_type IS NOT NULL
      GROUP BY 1
    ), d AS (
      SELECT l_returnflag, n_treat, n_ctrl,
             CAST(n_treat AS DOUBLE) AS n1, CAST(n_ctrl AS DOUBLE) AS n2,
             st, sc, qt, qc
      FROM s
    ), v AS (
      SELECT l_returnflag, n_treat, n_ctrl, n1, n2,
             st / n1 AS m1, sc / n2 AS m2,
             ((qt - st * st / n1) / (n1 - 1.0)) / n1 AS se1,
             ((qc - sc * sc / n2) / (n2 - 1.0)) / n2 AS se2
      FROM d
    )
    SELECT l_returnflag, n_treat, n_ctrl,
           round(m1, 6) AS mean_treat, round(m2, 6) AS mean_ctrl,
           round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
           round((se1 + se2) * (se1 + se2)
             / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0)), 6)
             AS welch_df
    FROM v
    """,
)
def q_promo_price_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B significance primitive: Welch two-sample t statistic (unequal
    variances) of extended price, PROMO parts vs the rest, per return
    flag — ``ops/stats.welch_ttest``. One conditional-aggregation pass
    over the fact⋈dim join (part broadcasts): both samples' moments
    accumulate under ``F.when`` in the same map-side-combined rollup, so
    the A/B test costs exactly one scan regardless of group count. Sums
    are decimal-exact; t and the Welch–Satterthwaite df are double
    arithmetic on those exact sums, written with the same association in
    both engines. Outputs are rounded to 6 decimals: a Σx² of ≥17
    significant digits is not exactly representable in a double, and the
    two engines round the DECIMAL→DOUBLE cast differently in the last
    ulp (BigDecimal.doubleValue vs DuckDB's hugeint-scaled path —
    measured: 1408065302744.9591 → ...f58 vs ...f59), so the raw
    statistics can differ at 1e-13 relative; rounding is the declared
    absorber, as in the ln family."""
    from fxspark.ops.stats import welch_ttest

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    t = welch_ttest(
        j,
        "l_returnflag",
        F.col("l_extendedprice"),
        F.col("p_type") == "PROMO",
    )
    return t.select(
        "l_returnflag",
        "n_treat",
        "n_ctrl",
        F.round("mean_treat", 6).alias("mean_treat"),
        F.round("mean_ctrl", 6).alias("mean_ctrl"),
        F.round("t_stat", 6).alias("t_stat"),
        F.round("welch_df", 6).alias("welch_df"),
    )


@query(
    "nation_spend_gini",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, c_nationkey,
             COALESCE(sum(CAST(o_totalprice AS DECIMAL(38,4))),
                      CAST(0 AS DECIMAL(38,4))) AS spend
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_nationkey, spend,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY spend, c_custkey)
                  AS DECIMAL(18,0)) AS i
      FROM spend
    ), agg AS (
      SELECT c_nationkey, count(*) AS n_entities,
             CAST(sum(spend) AS DOUBLE) AS sx,
             CAST(sum(i * spend) AS DOUBLE) AS six
      FROM ranked GROUP BY 1
    )
    SELECT n_name, CAST(n_entities AS BIGINT) AS n_entities,
           CASE WHEN sx > 0.0 THEN
             (2.0 * six - (CAST(n_entities AS DOUBLE) + 1.0) * sx)
               / (CAST(n_entities AS DOUBLE) * sx)
           END AS gini
    FROM agg JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_nation_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality analytics: per-nation Gini coefficient of customer
    lifetime spend (``ops/stats.gini_by_group``) — the Lorenz-curve
    complement of ``supplier_nation_herfindahl``'s share-of-squares
    concentration. Zero-order customers count at spend 0 (the left join
    — inequality over the population, not over buyers). The ranking
    window runs over the customer-grain ROLLUP (one row per customer,
    never raw orders); rank products accumulate in decimal so both Σ
    terms are exact and the final ratio is the only double step."""
    from fxspark.ops.stats import gini_by_group

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        customer.join(
            orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(38,4)")),
                F.lit(0).cast("decimal(38,4)"),
            ).alias("spend")
        )
    )
    g = gini_by_group(spend, "c_nationkey", "spend", "c_custkey")
    return g.join(
        F.broadcast(nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("n_name", "n_entities", "gini")


@query(
    "customer_churn_hazard",
    oracle="""
    WITH m AS (SELECT max(o_orderdate) AS mx FROM orders),
    u AS (
      SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
      FROM orders GROUP BY 1
    ), t AS (
      SELECT CASE WHEN l < mx - INTERVAL 180 DAY
                  THEN (epoch_us(l) - epoch_us(f)) // 2592000000000
                  ELSE (epoch_us(mx) - epoch_us(f)) // 2592000000000
             END AS t_months,
             (l < mx - INTERVAL 180 DAY) AS churned
      FROM u CROSS JOIN m
    ), g AS (
      SELECT t_months,
             CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
               AS deaths,
             count(*) AS n_all
      FROM t GROUP BY 1
    ), r AS (
      SELECT t_months, deaths,
             CAST(sum(n_all) OVER (ORDER BY t_months DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS at_risk
      FROM g
    )
    SELECT t_months, deaths, at_risk,
           CAST(deaths * 1000000 // at_risk AS BIGINT) AS hazard_ppm,
           CAST(sum(deaths * 1000000 // at_risk) OVER (ORDER BY t_months
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_hazard_ppm
    FROM r WHERE deaths > 0
    """,
)
def q_customer_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis over right-censored customer lifetimes
    (``ops/stats.cumulative_hazard``): lifetime = whole 30-day months
    from first to last order; churned if the last order predates the
    study end by >180 days, else censored at study end. Emits the
    Nelson-Aalen cumulative hazard in exact integer parts-per-million —
    the additive estimator chosen BECAUSE the Kaplan-Meier float product
    is not cross-engine hash-stable (KM ≈ exp(−H/ppm) when a caller
    wants the curve). The at-risk set is a reverse running sum over the
    month-grain rollup, so no subject-level self-join exists at any
    scale — the customer-grain agg is the only pass over data."""
    from fxspark.ops.stats import cumulative_hazard

    orders = load_table(spark, sf_dir, "orders")
    u = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    mx = orders.agg(F.max("o_orderdate").alias("mx"))
    month_us = 2_592_000_000_000
    ent = u.crossJoin(F.broadcast(mx)).select(
        (F.col("l") < F.col("mx") - F.expr("INTERVAL 180 DAYS")).alias(
            "churned"
        ),
        F.when(
            F.col("l") < F.col("mx") - F.expr("INTERVAL 180 DAYS"),
            (F.unix_micros("l") - F.unix_micros("f")),
        )
        .otherwise(F.unix_micros("mx") - F.unix_micros("f"))
        .alias("_us"),
    ).select(
        "churned",
        F.expr(f"_us div {month_us}").alias("t_months"),
    )
    return cumulative_hazard(ent, "t_months", "churned")


@query(
    "user_value_lag_features",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value, 1) OVER w AS lag1,
           lag(value, 2) OVER w AS lag2,
           value - lag(value, 1) OVER w AS delta1,
           CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_5,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_5
    -- event-time contract: NULL-ts rows are unplaceable in the feature
    -- ordering (lag/rolling positions would be engine-dependent)
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_user_value_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML feature generation: the per-key lag/delta/rolling feature frame
    a training pipeline derives from an event log — lag-1/lag-2 values,
    first difference, and a trailing 5-row sum/count, all over ONE
    (user, time)-sorted window partitioning so the whole feature set
    costs a single sort-shuffle (every window shares the same ordering;
    Catalyst collapses them into one Window node). Leading rows keep
    NULL lags (no synthetic padding — downstream imputation is a
    declared choice, ``user_value_locf``/``user_value_interp``). The
    rolling sum is decimal-exact; lag/delta are single-value moves with
    no accumulation, so plain doubles are already bit-stable."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # event-time contract — see oracle note
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(-4, 0)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta1"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(wr)
        .cast("double")
        .alias("sum_5"),
        F.count(F.lit(1)).over(wr).alias("n_5"),
    )


@query(
    "events_value_psi",
    oracle="""
    WITH ref AS (
      SELECT event_type, value FROM events
      WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
    ), cur AS (
      SELECT event_type, value FROM events
      WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    ), st AS (
      SELECT event_type, min(value) AS mn,
             (max(value) - min(value)) / 16 AS width,
             count(*) AS n_ref
      FROM ref GROUP BY 1 HAVING (max(value) - min(value)) / 16 > 0
    ), nc AS (
      SELECT c.event_type, count(*) AS n_cur
      FROM cur c JOIN st ON c.event_type = st.event_type GROUP BY 1
    ), rb AS (
      SELECT r.event_type,
             CAST(greatest(0, least(15,
               floor((r.value - st.mn) / st.width))) AS INTEGER) AS bin,
             count(*) AS cr
      FROM ref r JOIN st ON r.event_type = st.event_type GROUP BY 1, 2
    ), cb AS (
      SELECT c.event_type,
             CAST(greatest(0, least(15,
               floor((c.value - st.mn) / st.width))) AS INTEGER) AS bin,
             count(*) AS cc
      FROM cur c JOIN st ON c.event_type = st.event_type GROUP BY 1, 2
    ), grid AS (
      SELECT st.event_type, st.n_ref, nc.n_cur, sp.bin,
             coalesce(rb.cr, 0) AS cr, coalesce(cb.cc, 0) AS cc
      FROM st JOIN nc ON st.event_type = nc.event_type
      CROSS JOIN (SELECT unnest(range(16)) AS bin) sp
      LEFT JOIN rb ON rb.event_type = st.event_type AND rb.bin = sp.bin
      LEFT JOIN cb ON cb.event_type = st.event_type AND cb.bin = sp.bin
    )
    SELECT event_type, CAST(max(n_ref) AS BIGINT) AS n_ref,
           CAST(max(n_cur) AS BIGINT) AS n_cur,
           CAST(sum(CAST(
             ((CAST(cr AS DOUBLE) + 0.5) / (CAST(n_ref AS DOUBLE) + 8.0)
              - (CAST(cc AS DOUBLE) + 0.5) / (CAST(n_cur AS DOUBLE) + 8.0))
             * ln(((CAST(cr AS DOUBLE) + 0.5)
                   / (CAST(n_ref AS DOUBLE) + 8.0))
                  / ((CAST(cc AS DOUBLE) + 0.5)
                     / (CAST(n_cur AS DOUBLE) + 8.0)))
             AS DECIMAL(38,9))) AS DOUBLE) AS psi
    FROM grid GROUP BY event_type
    """,
)
def q_events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data drift monitor: population stability index of the
    value distribution per event type between the first and second half
    of the month — THE production gate for "did this feature's
    distribution move between the reference window and now". Bins are 16
    equi-width buckets from the REFERENCE period's min/max (current
    values outside the reference range clamp into the edge bins — drift
    mass lands where a monitor wants it), counts are add-half smoothed,
    and each (p−q)·ln(p/q) term is double-computed in pinned operand
    order then truncated to DECIMAL(38,9) before the exact sum (the ln
    family's hash discipline). Both period scans are one groupBy each;
    the (type × 16) grid is broadcast-sized. PSI > 0.25 is the classic
    retrain trigger."""
    events = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ref = events.filter(F.col("ts") < split)
    cur = events.filter(F.col("ts") >= split)
    st = (
        ref.groupBy("event_type")
        .agg(
            F.min("value").alias("mn"),
            ((F.max("value") - F.min("value")) / 16).alias("width"),
            F.count(F.lit(1)).alias("n_ref"),
        )
        .filter(F.col("width") > 0)
        # per-type grid, three consumers (n_cur gate + both binned passes)
        .localCheckpoint(eager=False)
    )
    nc = cur.join(F.broadcast(st.select("event_type")), "event_type").groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("n_cur"))

    def binned(df, cname):
        return (
            df.join(F.broadcast(st), "event_type")
            .select(
                "event_type",
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(15),
                        F.floor(
                            (F.col("value") - F.col("mn")) / F.col("width")
                        ),
                    ),
                )
                .cast("int")
                .alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    spine = st.select("event_type", "n_ref").join(
        F.broadcast(nc), "event_type"
    ).select(
        "event_type",
        "n_ref",
        "n_cur",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bin"),
    )
    grid = (
        spine.join(binned(ref, "cr"), ["event_type", "bin"], "left")
        .join(binned(cur, "cc"), ["event_type", "bin"], "left")
        .fillna(0, subset=["cr", "cc"])
    )
    p = (F.col("cr").cast("double") + 0.5) / (
        F.col("n_ref").cast("double") + 8.0
    )
    q = (F.col("cc").cast("double") + 0.5) / (
        F.col("n_cur").cast("double") + 8.0
    )
    term = ((p - q) * F.log(p / q)).cast("decimal(38,9)")
    return grid.groupBy("event_type").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.sum(term).cast("double").alias("psi"),
    )


@query(
    "source_token_entropy",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    ), sv AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
    ), st AS (
      SELECT source, sum(c) AS ts, count(*) AS vocab FROM sv GROUP BY 1
    )
    SELECT sv.source, CAST(max(st.ts) AS BIGINT) AS n_tokens,
           CAST(max(st.vocab) AS BIGINT) AS vocab,
           CAST(sum(CAST(
             -(CAST(sv.c AS DOUBLE) / CAST(st.ts AS DOUBLE))
              * ln(CAST(sv.c AS DOUBLE) / CAST(st.ts AS DOUBLE))
             AS DECIMAL(38,9))) AS DOUBLE) AS entropy,
           CASE WHEN max(st.vocab) > 1 THEN
             CAST(sum(CAST(
               -(CAST(sv.c AS DOUBLE) / CAST(st.ts AS DOUBLE))
                * ln(CAST(sv.c AS DOUBLE) / CAST(st.ts AS DOUBLE))
               AS DECIMAL(38,9))) AS DOUBLE)
             / ln(CAST(max(st.vocab) AS DOUBLE))
           END AS norm_entropy
    FROM sv JOIN st ON sv.source = st.source
    GROUP BY sv.source
    """,
)
def q_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the unigram distribution (plus the
    vocab-normalized form in [0,1]) — the no-reference complement of
    ``source_token_kl``: KL needs a corpus baseline, entropy flags
    template/boilerplate sources absolutely (low entropy = few tokens
    dominate). Vocab-grain rollup feeds both the distribution terms and
    the totals in one shuffle; each −p·ln p term is truncated to
    DECIMAL(38,9) pre-sum (ln hash discipline). norm_entropy is NULL for
    single-token vocabularies (ln 1 = 0)."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    sv = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    st = sv.groupBy("source").agg(
        F.sum("c").alias("ts"), F.count(F.lit(1)).alias("vocab")
    )
    p = F.col("c").cast("double") / F.col("ts").cast("double")
    term = (-p * F.log(p)).cast("decimal(38,9)")
    ent = (
        sv.join(F.broadcast(st), "source")
        .groupBy("source")
        .agg(
            F.max("ts").alias("n_tokens"),
            F.max("vocab").alias("vocab"),
            F.sum(term).cast("double").alias("entropy"),
        )
    )
    return ent.select(
        "source",
        "n_tokens",
        "vocab",
        "entropy",
        F.when(
            F.col("vocab") > 1,
            F.col("entropy") / F.log(F.col("vocab").cast("double")),
        ).alias("norm_entropy"),
    )


@query(
    "embedding_pca2",
    oracle="""
    WITH xy AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(38,9))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,9))) AS DOUBLE) AS syy,
             CAST(sum(CAST(x * y AS DECIMAL(38,9))) AS DOUBLE) AS sxy
      FROM xy
    ), c AS (
      SELECT n_vecs,
             sxx / nd - (sx / nd) * (sx / nd) AS a,
             sxy / nd - (sx / nd) * (sy / nd) AS b,
             syy / nd - (sy / nd) * (sy / nd) AS cc
      FROM s
    ), e AS (
      SELECT n_vecs, a, b, cc,
             (a + cc) / 2.0
               + sqrt(((a - cc) / 2.0) * ((a - cc) / 2.0) + b * b)
               AS lambda1,
             (a + cc) / 2.0
               - sqrt(((a - cc) / 2.0) * ((a - cc) / 2.0) + b * b)
               AS lambda2
      FROM c
    )
    SELECT n_vecs, a AS var_x, cc AS var_y, b AS cov_xy, lambda1, lambda2,
           lambda1 / (lambda1 + lambda2) AS explained,
           CASE WHEN b * b + (lambda1 - a) * (lambda1 - a) > 0.0 THEN
             b / sqrt(b * b + (lambda1 - a) * (lambda1 - a))
           ELSE 1.0 END AS v1x,
           CASE WHEN b * b + (lambda1 - a) * (lambda1 - a) > 0.0 THEN
             (lambda1 - a) / sqrt(b * b + (lambda1 - a) * (lambda1 - a))
           ELSE 0.0 END AS v1y
    FROM e
    """,
)
def q_embedding_pca2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-D PCA over the first two embedding dimensions:
    covariance from one moments pass (decimal-exact sums — float→double
    widening is exact, products are IEEE-deterministic), then the 2×2
    eigendecomposition in closed form (trace/discriminant — no
    iteration, no atan2, every step plain double on exact moments, so
    the whole spectrum is cross-engine hashable). The scalable seed of a
    PCA surface: d×d moment matrices for any small d are the same single
    map-side-combined aggregation; only the driver-side eigensolve
    grows, and it is O(d³) on ONE row. Degenerate axis-aligned case
    (b = 0, λ1 = a) pins the eigenvector to (1, 0) by declaration."""
    e = load_table(spark, sf_dir, "embeddings")
    xy = e.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    dec = "decimal(38,9)"
    s = xy.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
    )
    nd = F.col("nd")
    a = F.col("sxx") / nd - (F.col("sx") / nd) * (F.col("sx") / nd)
    b = F.col("sxy") / nd - (F.col("sx") / nd) * (F.col("sy") / nd)
    cc = F.col("syy") / nd - (F.col("sy") / nd) * (F.col("sy") / nd)
    c = s.select("n_vecs", a.alias("a"), b.alias("b"), cc.alias("cc"))
    disc = F.sqrt(
        ((F.col("a") - F.col("cc")) / 2.0)
        * ((F.col("a") - F.col("cc")) / 2.0)
        + F.col("b") * F.col("b")
    )
    e2 = c.select(
        "n_vecs",
        "a",
        "b",
        "cc",
        ((F.col("a") + F.col("cc")) / 2.0 + disc).alias("lambda1"),
        ((F.col("a") + F.col("cc")) / 2.0 - disc).alias("lambda2"),
    )
    vn2 = (
        F.col("b") * F.col("b")
        + (F.col("lambda1") - F.col("a")) * (F.col("lambda1") - F.col("a"))
    )
    return e2.select(
        "n_vecs",
        F.col("a").alias("var_x"),
        F.col("cc").alias("var_y"),
        F.col("b").alias("cov_xy"),
        "lambda1",
        "lambda2",
        (F.col("lambda1") / (F.col("lambda1") + F.col("lambda2"))).alias(
            "explained"
        ),
        F.when(vn2 > 0.0, F.col("b") / F.sqrt(vn2))
        .otherwise(F.lit(1.0))
        .alias("v1x"),
        F.when(
            vn2 > 0.0, (F.col("lambda1") - F.col("a")) / F.sqrt(vn2)
        )
        .otherwise(F.lit(0.0))
        .alias("v1y"),
    )


@query(
    "part_revenue_abc",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,4))) * 10000 AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ),
    st AS (SELECT sum(w) AS tw FROM pr),
    dv AS (SELECT w AS v, sum(w) AS wv FROM pr GROUP BY 1),
    cw AS (SELECT v, sum(wv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS cum FROM dv),
    b AS (
      SELECT t.i, min(c.v) AS bv
      FROM (SELECT i, (tw * i + 19) // 20 AS k
            FROM st, (SELECT unnest(range(1, 20)) AS i)) t
      JOIN cw c ON c.cum >= t.k
      GROUP BY t.i
    ),
    binned AS (
      SELECT p.w,
             CAST(20 - (SELECT count(*) FROM b WHERE b.bv < p.w)
                  AS INTEGER) AS bkt
      FROM pr p
    )
    SELECT CASE WHEN bkt <= 16 THEN 'A' WHEN bkt <= 19 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
           CAST(CAST(sum(w) AS BIGINT) AS DOUBLE)
             / CAST((SELECT tw FROM st) AS DOUBLE) AS rev_share
    FROM binned GROUP BY 1
    """,
)
def q_part_revenue_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue — the inventory
    80/95 cut — in its SCALE form: instead of ranking every part under
    one global cumulative-share window (the RFM trap, VERDICT r6), parts
    bin through ``ops/quantile.quantile_bins_weighted`` with weight =
    value = exact revenue cents, descending, n=20: bucket k holds the
    k-th 5% slab of revenue MASS, so A = buckets 1-16 (top 80% of
    revenue), B = 17-19 (next 15%), C = 20. Tie placement at slab
    boundaries follows the weighted-bin declaration (whole distinct
    revenue values move together) — slightly different from the
    rank-form ABC at exact ties, and declared so. Revenue is scaled to
    integer cents (decimal ×10000, exact) because the weighted binner
    requires integer weights — and integer cum-weight ranks are what
    keep the boundaries cross-engine exact."""
    from fxspark.ops.quantile import quantile_bins_weighted

    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        (
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(38,4)")
            )
            * F.lit(10000)
        )
        .cast("long")
        .alias("w")
    )
    binned = quantile_bins_weighted(pr, "w", "w", 20, "bkt", descending=True)
    tot = pr.agg(F.sum("w").alias("tw"))
    cls = (
        F.when(F.col("bkt") <= 16, F.lit("A"))
        .when(F.col("bkt") <= 19, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        binned.select(cls.alias("abc_class"), "w")
        .groupBy("abc_class")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.sum("w").alias("_sw"))
        .crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "n_parts",
            (F.col("_sw").cast("double") / 10000.0).alias("revenue"),
            (F.col("_sw").cast("double") / F.col("tw").cast("double")).alias(
                "rev_share"
            ),
        )
    )


@query(
    "supplier_return_wilson",
    oracle="""
    WITH s AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returns
      FROM lineitem GROUP BY 1
    ), d AS (
      SELECT l_suppkey, n_lines, n_returns,
             CAST(n_lines AS DOUBLE) AS nd,
             CAST(n_returns AS DOUBLE) / CAST(n_lines AS DOUBLE) AS p
      FROM s
    )
    SELECT l_suppkey, s_name, n_lines, n_returns, p AS return_rate,
           (p + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * nd)
            - CAST(1.96 AS DOUBLE) * sqrt(p * (1.0 - p) / nd
                          + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * nd * nd)))
             / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / nd) AS wilson_lo,
           (p + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * nd)
            + CAST(1.96 AS DOUBLE) * sqrt(p * (1.0 - p) / nd
                          + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * nd * nd)))
             / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / nd) AS wilson_hi
    FROM d JOIN supplier ON l_suppkey = s_suppkey
    """,
)
def q_supplier_return_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportion estimation done right: per-supplier return rate with a
    Wilson 95% score interval — the ranking-safe replacement for raw
    rates (a 1/2 supplier must not outrank a 40/100 one; Wilson's lower
    bound encodes the sample size). Closed-form double arithmetic on
    exact integer counts (z = 1.96 entering as the same literal in both
    engines), one hash-agg over the fact table plus a broadcast name
    join; at any scale this is count-rollup-shaped."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    s = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returns"),
    )
    nd = F.col("n_lines").cast("double")
    p = F.col("n_returns").cast("double") / F.col("n_lines").cast("double")
    z2 = 1.96 * 1.96
    margin = 1.96 * F.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
    denom = 1.0 + z2 / nd
    return (
        s.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "l_suppkey",
            "s_name",
            "n_lines",
            "n_returns",
            p.alias("return_rate"),
            ((p + z2 / (2.0 * nd) - margin) / denom).alias("wilson_lo"),
            ((p + z2 / (2.0 * nd) + margin) / denom).alias("wilson_hi"),
        )
    )


@query(
    "brand_triples_apriori",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), st AS (
      SELECT (count(DISTINCT l_orderkey) * 4000 + 999999) // 1000000
               AS minsup
      FROM ob
    )
    SELECT a.p_brand AS i1, b.p_brand AS i2, c.p_brand AS i3,
           CAST(count(*) AS BIGINT) AS support
    FROM ob a
    JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    JOIN ob c ON a.l_orderkey = c.l_orderkey AND b.p_brand < c.p_brand
    GROUP BY 1, 2, 3
    HAVING count(*) >= (SELECT minsup FROM st)
    """,
)
def q_brand_triples_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets of brands per order basket at 0.4% relative
    support (``ops/itemsets.frequent_triples``) — market-basket mining
    beyond ``basket_brand_lift``'s pairs. The engine side is Apriori:
    items prune at the size-1 cut before any pair forms, basket-grain
    pairs filter against the broadcast frequent-pair set, and candidate
    triples assemble from two frequent pairs sharing their smallest item
    with the third edge checked — per-basket fan-out is C(b,3) over
    FREQUENT items only, never corpus². Monotonicity makes the prune
    lossless, so the brute HAVING oracle is the exact same set. Relative
    support in exact ppm-ceil integer arithmetic keeps the query
    non-degenerate at every scale factor."""
    from fxspark.ops.itemsets import frequent_triples

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_orderkey", "p_brand")
    return frequent_triples(baskets, "l_orderkey", "p_brand", 4000)


@query(
    "region_nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT r_name, n_name,
             sum(CAST(o_totalprice AS DECIMAL(38,4))) AS rv
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    ), tot AS (SELECT sum(rv) AS gt FROM rev),
    reg AS (
      SELECT r_name, n_name, rv,
             sum(rv) OVER (PARTITION BY r_name) AS rt
      FROM rev
    )
    SELECT r_name, n_name, CAST(rv AS DOUBLE) AS revenue,
           CAST(rv AS DOUBLE) / CAST(rt AS DOUBLE) AS nation_share,
           CAST(rt AS DOUBLE) / CAST((SELECT gt FROM tot) AS DOUBLE)
             AS region_share
    FROM reg
    """,
)
def q_region_nation_revenue_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Percent-of-parent hierarchy rollup: revenue by (region, nation)
    with each nation's share of its region and each region's share of
    the total — the BI drill-path in one pass. The parent total is a
    window PARTITIONED by region over the 25-row nation rollup; the
    grand total is a broadcast scalar (no unpartitioned window — the
    lint rule). Shares divide exact decimal sums as doubles. Dimensions
    broadcast; the only fact pass is the orders hash-agg."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("rv"))
        # 25-row rollup whose lineage is the whole orders join — both the
        # grand-total branch and the window branch consume it
        .localCheckpoint(eager=False)
    )
    tot = rev.agg(F.sum("rv").alias("gt"))
    wreg = Window.partitionBy("r_name")
    return (
        rev.withColumn("rt", F.sum("rv").over(wreg))
        .crossJoin(F.broadcast(tot))
        .select(
            "r_name",
            "n_name",
            F.col("rv").cast("double").alias("revenue"),
            (F.col("rv").cast("double") / F.col("rt").cast("double")).alias(
                "nation_share"
            ),
            (F.col("rt").cast("double") / F.col("gt").cast("double")).alias(
                "region_share"
            ),
        )
    )


@query(
    "user_value_changepoint",
    oracle="""
    WITH pre AS (
      SELECT user_id, ts, event_id,
             row_number() OVER w AS i,
             count(*) OVER (PARTITION BY user_id) AS n,
             CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS sl,
             CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id) AS DOUBLE) AS s
      -- changepoint_single's series domain: observed, placeable rows
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), scored AS (
      SELECT user_id, ts, event_id, n,
             CAST(i AS DOUBLE) AS di, CAST(n AS DOUBLE) AS dn, sl, s
      FROM pre WHERE i < n
    ), gains AS (
      SELECT user_id, ts, CAST(n AS BIGINT) AS n_obs,
             sl * sl / di + (s - sl) * (s - sl) / (dn - di)
               - s * s / dn AS gain,
             sl / di AS mean_before,
             (s - sl) / (dn - di) AS mean_after,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY sl * sl / di + (s - sl) * (s - sl) / (dn - di)
                        - s * s / dn DESC, ts, event_id) AS rn
      FROM scored
    )
    SELECT user_id, n_obs, ts AS cp_ts, gain, mean_before, mean_after
    FROM gains WHERE rn = 1
    """,
)
def q_user_value_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrospective level-shift localization per user
    (``ops/stats.changepoint_single``): the split maximizing the
    between-segment sum-of-squares gain — binary segmentation's first
    cut, the offline twin of ``user_value_cusum``'s online detector.
    Gains are double arithmetic on decimal-exact prefix sums (identical
    bits in both engines, so even the DESC argmax ordering is
    cross-engine stable; exact ties break to the earliest split). One
    sorted window pass per user plus a grouped argmax — linear,
    partitioned, nothing global."""
    from fxspark.ops.stats import changepoint_single

    events = load_table(spark, sf_dir, "events")
    return changepoint_single(
        events, "user_id", ["ts", "event_id"], "value"
    )


@query(
    "customer_retention_triangle",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
             CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP)
               AS cohort
      FROM orders GROUP BY 1
    ), sz AS (
      SELECT cohort, count(*) AS cohort_size FROM f GROUP BY 1
    ), act AS (
      SELECT DISTINCT f.cohort, o.o_custkey,
             (year(o.o_orderdate) - year(f.cohort)) * 12
               + (month(o.o_orderdate) - month(f.cohort)) AS month_offset
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey
    ), tri AS (
      SELECT cohort, CAST(month_offset AS INTEGER) AS month_offset,
             CAST(count(*) AS BIGINT) AS n_active
      FROM act GROUP BY 1, 2
    )
    SELECT t.cohort, t.month_offset, t.n_active,
           CAST(sz.cohort_size AS BIGINT) AS cohort_size,
           CAST(t.n_active AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)
             AS retention_rate
    FROM tri t JOIN sz ON t.cohort = sz.cohort
    """,
)
def q_customer_retention_triangle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The classic cohort retention TRIANGLE: customers cohorted by
    first-order month, one row per (cohort, month-offset) with the share
    of the cohort that ordered in that offset month — the activity-rate
    complement of ``customer_cohort_ltv``'s revenue matrix. Both facts
    passes shuffle on custkey (first-order agg + the cohort join reuse
    one exchange); the triangle itself is (cohorts × offsets) grain —
    dashboard-sized. Month offsets are exact integer year/month
    arithmetic, never date subtraction."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    sz = f.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (
        orders.join(f, "o_custkey")
        .select(
            "cohort",
            "o_custkey",
            (
                (F.year("o_orderdate") - F.year("cohort")) * 12
                + (F.month("o_orderdate") - F.month("cohort"))
            )
            .cast("int")
            .alias("month_offset"),
        )
        .distinct()
    )
    tri = act.groupBy("cohort", "month_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return tri.join(F.broadcast(sz), "cohort").select(
        "cohort",
        "month_offset",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention_rate"),
    )


@query(
    "event_l_diversity",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS value_band,
           strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2, 3
    HAVING count(DISTINCT user_id) < 5
    """,
)
def q_event_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the second privacy axis after
    ``event_k_anonymity``: a quasi-identifier group can be large (k-safe)
    yet still re-identifying if one SENSITIVE value dominates it. Flags
    (event_type, value-band, day) groups whose distinct-user diversity
    is < 5. Exact distinct per group is a two-level hash-agg (partial
    distinct map-side); same quasi-identifier banding as the k-anonymity
    audit so the two reports join."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type",
            F.floor(F.col("value") / 50.0).cast("long").alias("value_band"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .filter(F.col("n_users") < 5)
    )


@query(
    "events_debounced",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL 2 HOUR
                  THEN 1 ELSE 0 END AS brk
      -- sessionize drops NULL-ts rows by contract
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM o
    )
    SELECT user_id, event_id, ts, n_collapsed FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id, sess
                                ORDER BY ts, event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY user_id, sess) AS BIGINT)
               AS n_collapsed
      FROM s
    ) WHERE rn = 1
    """,
)
def q_events_debounced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst debouncing — the ingestion-side dedup a pipeline applies
    before rate-sensitive features: within each user, events arriving
    within 2 h of the previous event collapse into one burst
    (``ops/windows.sessionize`` with a 2 h gap) and only the burst's
    FIRST event survives, annotated with how many it absorbed. Burst
    assignment and the keep-first rank share one (user, time) sort —
    sessionize's windows and the rank reuse the same exchange. Equal
    timestamps order by event_id (the session-tie determinism rule)."""
    events = load_table(spark, sf_dir, "events")
    s = sessionize(
        events.select("user_id", "event_id", "ts"),
        "user_id",
        "ts",
        F.expr("INTERVAL 2 HOURS"),
        tiebreak=["event_id"],
    )
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    return (
        s.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_collapsed",
            F.count(F.lit(1)).over(
                Window.partitionBy("user_id", "session_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id", "ts", "n_collapsed")
    )


@query(
    "orders_seasonal_naive_mape",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
             sum(CAST(o_totalprice AS DECIMAL(38,4))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT CAST(year(c.mo) AS BIGINT) AS year,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(CAST(
             abs((CAST(c.rev AS DOUBLE) - CAST(p.rev AS DOUBLE))
                 / CAST(c.rev AS DOUBLE))
             AS DECIMAL(38,9))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mape
    FROM m c JOIN m p ON c.mo = p.mo + INTERVAL 12 MONTH
    GROUP BY 1
    """,
)
def q_orders_seasonal_naive_mape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forecast backtesting baseline: the seasonal-naive forecast
    (this month's revenue = same month last year) scored by MAPE per
    year — the floor every real forecasting model must beat, computed
    in-engine the way a forecast eval pipeline would. The month rollup
    joins to itself displaced by 12 calendar months (a tiny month-grain
    self-join, robust to missing months where a window lag(12) is not);
    each |error|/actual term truncates to DECIMAL(38,9) before the exact
    mean. Revenue sums are decimal; ratios are the only double step."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mo")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("rev"))
    c = m.select(F.col("mo").alias("c_mo"), F.col("rev").alias("c_rev"))
    p = m.select(F.col("mo").alias("p_mo"), F.col("rev").alias("p_rev"))
    j = c.join(
        p, F.col("c_mo") == F.col("p_mo") + F.expr("INTERVAL 12 MONTHS")
    )
    ape = F.abs(
        (F.col("c_rev").cast("double") - F.col("p_rev").cast("double"))
        / F.col("c_rev").cast("double")
    )
    return j.groupBy(F.year("c_mo").cast("long").alias("year")).agg(
        F.count(F.lit(1)).alias("n_months"),
        (
            F.sum(ape.cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mape"),
    )


def _copurchase_pair_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (src < dst) co-purchase pair stream off the order-keyed
    self-join — the exact clustering query's edge build, extracted so the
    wedge-close plan pin (tests/test_plans.py) lints the REGISTERED build
    and can never drift from it (round-18 review finding: since
    ``wide_close=True`` materializes the close at build time, the
    registered query's returned plan no longer contains the wedge
    pipeline, so the pin must rebuild it from this shared helper)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("dst"))
    return a.join(b, "l_orderkey").filter(F.col("src") < F.col("dst"))


@query(
    "part_copurchase_clustering",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT n, count(*) AS deg FROM (
        SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
      ) GROUP BY 1
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pn AS (
      SELECT n, CAST(count(*) AS BIGINT) AS triangles
      FROM (SELECT unnest([a, b, c]) AS n FROM tri) GROUP BY 1
    )
    SELECT deg.n AS node, CAST(deg.deg AS BIGINT) AS deg,
           CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles,
           2.0 * CAST(coalesce(pn.triangles, 0) AS DOUBLE)
             / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0))
             AS clustering
    FROM deg LEFT JOIN pn ON deg.n = pn.n
    WHERE deg.deg >= 2
    """,
)
def q_part_copurchase_clustering(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient per part over the co-purchase graph
    (``ops/graph.triangles_per_node``) — completing the graph tier
    (PageRank → BFS → triangles): how clique-ish is each product's
    neighborhood. Engine side is DEGREE ORIENTATION — wedges enumerate
    only from each edge's (degree,id)-smaller endpoint, bounding every
    node's out-degree at O(√E) so hub nodes can never go quadratic —
    with one semi-join closing wedges against the oriented edge set. The
    brute canonical triple-join oracle finds the identical triangles
    (each exactly once as a<b<c). Uses the part co-purchase graph, NOT
    the nation trade graph (a star — NOTES_r7 degenerate-fixture list).
    Cost note (r11): the SYNTHETIC graph is dense (sf0.1: 20k nodes,
    1.2M edges, mean degree 120 — random part selection, no
    preferential structure), so the oriented wedge count is a genuine
    83M rows — Ω(Σ out-deg²) is the information floor for exact
    triangle counts. ~3.3 s solo at sf0.1 / ~6.4 s in-sweep (the r10
    "~9-15 s" records were sweep-context readings — SCALE.md §25.4);
    the wedge close never sorts the 83M-row frame at runtime (AQE's
    full join ladder — session.py — picks broadcast/shuffled-hash); checkpointing the oriented edges was A/B-measured
    neutral (recompute is not the cost). Real
    co-purchase graphs are power-law sparse; orientation is what keeps
    their hubs from going quadratic."""
    from fxspark.ops.graph import triangles_per_node

    return triangles_per_node(
        _copurchase_pair_edges(spark, sf_dir), wide_close=True
    )


@query(
    "events_weekday_hour_heatmap",
    oracle="""
    WITH g AS (
      SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS INTEGER)
               AS dow,
             CAST((epoch_us(ts) % 86400000000) // 3600000000 AS INTEGER)
               AS hour,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ), t AS (SELECT sum(n_events) AS total FROM g)
    SELECT dow, hour, CAST(n_events AS BIGINT) AS n_events,
           CAST(n_events AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE)
             AS share
    FROM g
    """,
)
def q_events_weekday_hour_heatmap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Activity heatmap: events by (weekday × UTC hour) with share of
    total — the time-of-day profile every ops dashboard starts with.
    Day-of-week and hour derive from INTEGER epoch-microsecond
    arithmetic (``(days+4) % 7``, 0 = Sunday), not from engine calendar
    functions — Spark's ``dayofweek`` and DuckDB's ``dow`` disagree on
    numbering conventions, integer division doesn't. One hash-agg to a
    ≤168-row grid; the share denominator is a broadcast scalar."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        F.expr("(unix_micros(ts) div 86400000000 + 4) % 7")
        .cast("int")
        .alias("dow"),
        F.expr("(unix_micros(ts) % 86400000000) div 3600000000")
        .cast("int")
        .alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    t = g.agg(F.sum("n_events").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "dow",
        "hour",
        "n_events",
        (
            F.col("n_events").cast("double") / F.col("total").cast("double")
        ).alias("share"),
    )


@query(
    "order_ship_delay_histogram",
    oracle="""
    WITH d AS (
      SELECT (epoch_us(l_shipdate) - epoch_us(o_orderdate))
               // 86400000000 AS delay_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), g AS (
      SELECT CAST(delay_days // 7 AS INTEGER) AS delay_week,
             count(*) AS n_lines,
             min(delay_days) AS min_days, max(delay_days) AS max_days
      FROM d GROUP BY 1
    ), t AS (SELECT sum(n_lines) AS total FROM g)
    SELECT delay_week, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(min_days AS BIGINT) AS min_days,
           CAST(max_days AS BIGINT) AS max_days,
           CAST(n_lines AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE)
             AS share
    FROM g
    """,
)
def q_order_ship_delay_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship lead-time distribution in week buckets — the
    logistics SLA histogram (late_shipment_orders flags the tail; this
    shows the whole distribution a capacity planner reads). Delay is
    exact integer epoch-microsecond floor-division to days then weeks;
    the fact⋈fact join is orderkey-equi (lineitem co-partitions with
    orders on the key at scale — the bucketed-layout case); output is a
    ≤dozens-row grid with a broadcast scalar share."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.expr(
            "(unix_micros(l_shipdate) - unix_micros(o_orderdate))"
            " div 86400000000"
        ).alias("delay_days")
    )
    g = d.groupBy(
        F.expr("delay_days div 7").cast("int").alias("delay_week")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("delay_days").alias("min_days"),
        F.max("delay_days").alias("max_days"),
    )
    t = g.agg(F.sum("n_lines").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "delay_week",
        "n_lines",
        "min_days",
        "max_days",
        (
            F.col("n_lines").cast("double") / F.col("total").cast("double")
        ).alias("share"),
    )


_PPR_ITER = """
    r{i} AS (
      SELECT n.node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.tele
               + 0.85 * COALESCE(
               CAST(sum(CAST(r.rank * e.share AS DECIMAL(38,18))) AS DOUBLE),
               0.0) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN r{prev} r ON r.node = e.src
      GROUP BY n.node, n.tele
    )"""


def _copurchase_weighted_edges(
    spark: SparkSession, sf_dir: str, sample_pct: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Shared weighted co-purchase ``(edges, nodes)`` build for the PPR
    family: canonical pairs (src < dst) from the order-keyed self-join,
    optional DOULION md5 sampling, co-occurrence-count weights, ONE
    materialization, a mirror union to the symmetric directed edge list,
    plus the node set derived once off the canonical checkpoint.

    Three measured design points (sf0.1, interleaved 3-rep medians,
    round 11):

    - CANONICAL-THEN-MIRROR, not directed enumeration: the self-join
      emits 1.20M canonical rows instead of 2.4M directed ones, halving
      the join output and the rollup shuffle; the mirror union reads the
      CHECKPOINTED 1.196M-edge aggregate twice, which is cheap. (Round 10
      measured canonical+mirror as WORSE — but that A/B predated the
      checkpoint, so each union branch re-ran the whole build; with the
      materialization the verdict flips: exact PPR 15.5 s → 9.1 s.
      Round-13 correction: the r11 docstring said "12M/24M" — the
      measured counts are Σ_orders C(k,2) = 1,199,575 canonical pairs at
      sf0.1; the 10× figure was wrong, the halving ratio and both A/B
      verdicts stand.)

    Enumeration-cost scaling (round-13 measurement, DuckDB row counts):

      sf     orders   avg k  max k  canonical pairs  distinct edges  pairs/edge
      0.001   1,473   4.03    11         11,722          8,899        1.32
      0.01   14,743   4.07    13        119,239        115,729        1.03
      0.1   147,236   4.07    17      1,199,575      1,196,000        1.00

    The basket size k is CONSTANT in sf (avg 4.07, max growing ~log sf),
    so the Ω(Σ C(k,2)) enumeration both PPR forms share is LINEAR in
    orders — the irreducible floor scales 1:1 with data, not
    quadratically, and per-order skew is bounded (worst order costs
    C(17,2) = 136 pairs). Two consequences at 100 TB: (a) linearity
    holds as long as the basket-size distribution stays bounded — a
    power-law basket regime would shift cost toward Σ k² and only then
    would a degree-capped enumeration matter; (b) pairs/edge → 1.0, so
    the co-occurrence rollup performs almost NO reduction at scale —
    map-side combine buys nothing, and the checkpoint earns its keep by
    deduplicating the four consumers above it, not by shrinking rows.
    - SAMPLE BEFORE THE ROLLUP: the keep/drop hash depends only on the
      group keys, so the filter commutes with the groupBy; hashing the
      ~1.2M canonical raw pairs map-side (sf0.1 measured count — see the
      scaling table above) is cheaper than shuffling 4× the rows into the
      rollup and hashing the aggregate after (topk 9.5 s → 8.4 s).
    - CHECKPOINT THE UNDIRECTED AGGREGATE (the narrowest frame): the
      consumers above personalized_pagerank's internal checkpoint —
      nodes_in_graph's two union branches, the seed semi-join, and the
      out-weight join — would otherwise each re-run the ~1.2M-row build
      (measured sf0.1 count; the apriori ``_min_support`` pattern,
      round-10 audit class).

    Weights are bit-identical to the directed enumeration: the
    co-occurrence count of (u,v) equals that of (v,u), and share
    normalization divides integer-valued doubles (< 2^53, exact sums in
    any order), so both PPR oracles are unchanged.
    """
    from fxspark.ops.graph import sample_edges_md5

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = a.join(b, "l_orderkey").filter(F.col("src") < F.col("dst"))
    if sample_pct is not None:
        pairs = sample_edges_md5(pairs, sample_pct)
    und = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    edges = und.select("src", "dst", "w").union(
        und.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    # Node set off the CANONICAL checkpoint (half the rows of the mirrored
    # edge list, same endpoint set by symmetry): shared by the seed
    # semi-join AND passed into personalized_pagerank's ``nodes`` so the
    # op skips its own full-edge-list distinct (round 17 — the two PPR
    # queries were paying the node distinct twice; phase profile ~1 s per
    # pass at sf0.1, bench regime).
    nodes = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    return edges, nodes



@query(
    "part_copurchase_ppr",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges0 AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(count(*) AS DOUBLE) AS w
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ), outw AS (
      SELECT src, sum(w) AS out_w FROM edges0 GROUP BY src
    ), edges AS (
      SELECT e.src, e.dst, e.w / o.out_w AS share
      FROM edges0 e JOIN outw o ON e.src = o.src
    ), nodes0 AS (
      SELECT src AS node FROM edges0 UNION SELECT dst FROM edges0
    ), srcs AS (
      SELECT node FROM nodes0
      WHERE node IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
    ), nodes AS (
      SELECT node,
             CASE WHEN node IN (SELECT node FROM srcs)
                  THEN 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM srcs)
                  ELSE CAST(0.0 AS DOUBLE) END AS tele
      FROM nodes0
    ), r0 AS (
      SELECT node, tele AS rank FROM nodes
    ),"""
    + ",".join(_PPR_ITER.format(i=i, prev=i - 1) for i in range(1, 6))
    + """
    -- PPR with an EMPTY seed set is undefined (no teleport
    -- distribution): personalized_pagerank returns an empty frame, so
    -- the oracle guards out its would-be all-zero ranks.
    SELECT node AS part, round(rank, 9) AS ppr FROM r5
    WHERE (SELECT count(*) FROM srcs) > 0
    """,
)
def q_part_copurchase_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded on Brand#1's parts over the symmetric
    part co-purchase graph (``ops/graph.personalized_pagerank``) — the
    "customers who bought this brand also orbit these parts" recsys
    primitive: teleport mass returns to the brand's parts, so rank is
    graph PROXIMITY TO THE BRAND, not global popularity (the pagerank
    twin measures the latter). 5 synchronous iterations, damping 0.85,
    decimal-exact contribution sums — the unrolled SQL oracle replays
    every iteration bit-for-bit (teleport constants written
    CAST-AS-DOUBLE on both sides: the decimal-literal-folding trap).
    Personalization set = brand parts PRESENT in the graph, so the
    teleport norm is well-defined on both sides. Unreachable parts keep
    rank exactly 0.

    Cost note (sf0.1, interleaved 3-rep medians, round 11): 15.5 s with
    the round-10 directed un-materialized build → 9.1 s on the shared
    ``_copurchase_weighted_edges`` helper (canonical pairs + checkpoint
    + mirror — the full A/B table is in the helper's docstring). What
    remains is the irreducible pair enumeration: op-distinct + the
    order-keyed self-join emitting ~1.2M canonical co-occurrence rows
    (1,199,575 measured at sf0.1 — the r11 "12M" figure was the 10×
    counting error corrected in round 13) — the edge build IS the
    workload on this dense fixture."""
    from fxspark.ops.graph import personalized_pagerank

    part = load_table(spark, sf_dir, "part")
    edges, nodes_in_graph = _copurchase_weighted_edges(spark, sf_dir)
    sources = (
        part.filter(F.col("p_brand") == "Brand#1")
        .select(F.col("p_partkey").alias("node"))
        .join(nodes_in_graph, "node", "left_semi")
    )
    ranks = personalized_pagerank(
        edges, sources, weight="w", n_iter=5, damping=0.85,
        nodes=nodes_in_graph, spread_iterations=True,
    )
    return ranks.select(
        F.col("node").alias("part"), F.round("rank", 9).alias("ppr")
    )


@query(
    "events_p90_pinball_eval",
    oracle="""
    WITH stats AS (
      SELECT min(value) AS mn, max(value) AS mx,
             (max(value) - min(value)) / 64 AS width
      FROM events
    ), binned AS (
      SELECT e.event_type,
             CAST(least(63, floor((e.value - s.mn) / s.width)) AS INTEGER)
               AS bin
      FROM events e CROSS JOIN stats s
    ), bc AS (
      SELECT event_type, bin, count(*) AS cnt
      FROM binned GROUP BY event_type, bin
    ), cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM bc
    ), qb AS (
      SELECT event_type,
             min(CASE WHEN cum * 100 >= 90 * n THEN bin END) AS b90
      FROM cum GROUP BY event_type
    ), est AS (
      SELECT q.event_type,
             s.mn + CAST(q.b90 + 1 AS DOUBLE) * s.width AS p90_est
      FROM qb q CROSS JOIN stats s
    ), exact AS (
      SELECT event_type, quantile_cont(value, 0.9) AS p90_exact
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           max(est.p90_est) AS p90_est,
           max(exact.p90_exact) AS p90_exact,
           CAST(sum(CAST(greatest(0.9 * (e.value - est.p90_est),
                                  0.1 * (est.p90_est - e.value))
                         AS DECIMAL(38,9))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS loss_est,
           CAST(sum(CAST(greatest(0.9 * (e.value - exact.p90_exact),
                                  0.1 * (exact.p90_exact - e.value))
                         AS DECIMAL(38,9))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS loss_exact
    FROM events e
    JOIN est ON e.event_type = est.event_type
    JOIN exact ON e.event_type = exact.event_type
    GROUP BY e.event_type
    """,
)
def q_events_p90_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch quality in LOSS units: mean pinball loss (q=0.9)
    of the mergeable histogram's p90 estimate vs the loss of the exact
    interpolated p90 — the exact quantile minimizes expected pinball
    loss, so ``loss_est − loss_exact`` is the sketch's regret, the
    number that tells a user whether 64 bins are enough for THEIR
    distribution (complements ``minhash_estimate_agreement`` /
    ``embedding_quantized_recall``: every approximate tier ships with
    an in-engine error meter). One extra pass over events with both
    per-type scalars broadcast; each loss term is double-computed then
    DECIMAL(38,9)-truncated before the exact mean."""
    events = load_table(spark, sf_dir, "events")
    est = q_events_histogram_quantiles(spark, sf_dir).select(
        "event_type", "p90_est"
    )
    exact = events.groupBy("event_type").agg(
        F.percentile("value", 0.9).alias("p90_exact")
    )
    j = events.join(F.broadcast(est), "event_type").join(
        F.broadcast(exact), "event_type"
    )
    def pin(y):
        return F.greatest(
            0.9 * (F.col("value") - y), 0.1 * (y - F.col("value"))
        ).cast("decimal(38,9)")

    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("p90_est").alias("p90_est"),
        F.max("p90_exact").alias("p90_exact"),
        (
            F.sum(pin(F.col("p90_est"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("loss_est"),
        (
            F.sum(pin(F.col("p90_exact"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("loss_exact"),
    )


@query(
    "user_burstiness",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
               AS gap_us
      FROM events
    ), m AS (
      SELECT user_id, CAST(count(gap_us) AS BIGINT) AS n_gaps,
             CAST(sum(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(sum(CAST(CAST(gap_us AS DOUBLE) * CAST(gap_us AS DOUBLE)
                           AS DECIMAL(38,0))) AS DOUBLE) AS q
      FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
      HAVING count(gap_us) >= 2
    ), d AS (
      SELECT user_id, n_gaps, CAST(n_gaps AS DOUBLE) AS nd, s, q FROM m
    ), v AS (
      SELECT user_id, n_gaps, s / nd AS mu,
             sqrt((q - s * s / nd) / (nd - 1.0)) AS sigma
      FROM d
    )
    SELECT user_id, n_gaps,
           -- mean gap RAW: s/(n*1e6) is a small-denominator rational, so
           -- ROUND(…, 6) lands on 1e-6 halves (rule D22) — the raw IEEE
           -- quotient of identical operands is bit-identical. cv and
           -- burstiness keep the round: sqrt outputs are tie-free and the
           -- round masks any last-ulp drift.
           mu / 1000000.0 AS mean_gap_s,
           round(sigma / mu, 6) AS cv,
           round((sigma - mu) / (sigma + mu), 6) AS burstiness
    FROM v
    """,
)
def q_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user temporal regularity: the burstiness index
    ``B = (σ−μ)/(σ+μ)`` of inter-event gaps (−1 = periodic clock, 0 =
    Poisson, →1 = heavy bursts) plus the coefficient of variation — the
    per-ENTITY complement of ``user_interarrival_stats``'s per-type gap
    quantiles, and the feature that separates bot-like from human-like
    accounts. Gaps are exact integer micros from one lag window; Σgap
    and Σgap² accumulate in DECIMAL(38,0) (the square is an IEEE-exact
    double product of <2^26 values cast to integer decimal). cv and
    burstiness round to 6 (sqrt outputs are decimal-tie-free and the
    round masks Σgap²'s 17-significant-digit DECIMAL→DOUBLE edge, the
    NOTES_r8 trap); mean_gap_s is emitted RAW — its s/(n·10⁶)
    small-denominator rational DOES land on 1e-6 halves where native
    ROUND splits across engines (rule D22, round-15 sf0.1 probe).
    Users with <2 gaps drop (σ undefined)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = events.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    m = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum(F.col("gap_us").cast("decimal(38,0)"))
            .cast("double")
            .alias("s"),
            F.sum(
                (
                    F.col("gap_us").cast("double")
                    * F.col("gap_us").cast("double")
                ).cast("decimal(38,0)")
            )
            .cast("double")
            .alias("q"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    nd = F.col("n_gaps").cast("double")
    mu = F.col("s") / nd
    sigma = F.sqrt(
        (F.col("q") - F.col("s") * F.col("s") / nd) / (nd - 1.0)
    )
    v = m.select("user_id", "n_gaps", mu.alias("mu"), sigma.alias("sigma"))
    return v.select(
        "user_id",
        "n_gaps",
        # raw quotient — see the oracle's D22 note
        (F.col("mu") / 1000000.0).alias("mean_gap_s"),
        F.round(F.col("sigma") / F.col("mu"), 6).alias("cv"),
        F.round(
            (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")), 6
        ).alias("burstiness"),
    )


def _simhash_hamming_oracle() -> str:
    # identical code construction to _simhash_oracle (md5_60, bigrams)
    votes = ", ".join(
        f"sum(CASE WHEN (x >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(60)
    )
    code = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(60)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct([array_to_string(t[i:i+1], ' ')
                                    for i in range(1, len(t))]) AS s
      FROM toks WHERE len(t) >= 2
    ), h AS (
      SELECT doc_id, {_MD5_60.format(c='sh0')} AS x
      FROM (SELECT doc_id, unnest(s) AS sh0 FROM sh)
    ), votes AS (
      SELECT doc_id, {votes} FROM h GROUP BY doc_id
    ), code AS (
      SELECT doc_id, CAST({code} AS BIGINT) AS c FROM votes
    ), bkt AS (
      SELECT doc_id, c, CAST(doc_id % 16 AS INTEGER) AS g FROM code
    ), pairs AS (
      SELECT CAST(bit_count(xor(a.c, b.c)) AS INTEGER) AS hamming
      FROM bkt a JOIN bkt b ON a.g = b.g AND a.doc_id < b.doc_id
    ), grid AS (
      SELECT hamming, count(*) AS n_pairs FROM pairs GROUP BY 1
    ), tot AS (SELECT sum(n_pairs) AS t FROM grid)
    SELECT hamming, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_pairs AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE)
             AS share
    FROM grid
    """


@query("doc_simhash_hamming_histogram", oracle=_simhash_hamming_oracle())
def q_doc_simhash_hamming_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SimHash distance calibration: the distribution of pairwise hamming
    distances over a declared 1/16 systematic pair sample (doc_id % 16
    buckets, all within-bucket pairs) — the curve that tells a user WHERE
    to put ``simhash_near_dup``'s max_hamming threshold for THEIR corpus:
    near-dup mass sits far left of the background bell around
    n_bits/2, and the valley between them is the defensible cut. Codes
    are the identical md5_60 bigram simhash the dedup tier uses (so the
    histogram describes exactly that tier); the pair join is
    bucket-bounded (≤ (n/16)² per bucket), never all-pairs."""
    from fxspark.ops.dedup import simhash_codes

    docs = spread(load_table(spark, sf_dir, "documents"))
    codes = simhash_codes(docs, "doc_id", "text", n=2, hash_fn="md5_60")
    # Checkpoint the 3-column code frame: the self-join's a/b branches
    # would otherwise EACH recompute the tokenize+bigram+60-bit-vote
    # pipeline (×2 again for the share denominator below — 4 documents
    # scans in the executed plan, A/B-measured 4.8 s → 2.3 s).
    bkt = codes.select(
        F.col("_id").alias("doc_id"),
        F.col("_code").alias("c"),
        (F.col("_id") % 16).cast("int").alias("g"),
    ).localCheckpoint(eager=False)
    a = bkt.select("g", F.col("doc_id").alias("ida"), F.col("c").alias("ca"))
    b = bkt.select("g", F.col("doc_id").alias("idb"), F.col("c").alias("cb"))
    grid = (
        a.join(b, "g")
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.bit_count(F.col("ca").bitwiseXOR(F.col("cb")))
            .cast("int")
            .alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        # ≤ 61 rows; checkpointed so the share denominator and the output
        # don't re-run the bucket pair join
        .localCheckpoint(eager=False)
    )
    tot = grid.agg(F.sum("n_pairs").alias("t"))
    return grid.crossJoin(F.broadcast(tot)).select(
        "hamming",
        "n_pairs",
        (F.col("n_pairs").cast("double") / F.col("t").cast("double")).alias(
            "share"
        ),
    )




@query(
    "promo_price_mannwhitney",
    oracle="""
    WITH j AS (
      -- mann_whitney_u excludes NULL values / NULL treatment flags
      -- (pairwise-complete contract).
      SELECT l_returnflag, l_extendedprice AS v,
             CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS t
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_extendedprice IS NOT NULL AND p_type IS NOT NULL
    ), g AS (
      SELECT l_returnflag, v, count(*) AS cnt, sum(t) AS cnt_t
      FROM j GROUP BY 1, 2
    ), r AS (
      SELECT l_returnflag, cnt, cnt_t,
             2 * sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v
                                ROWS UNBOUNDED PRECEDING) - cnt + 1 AS avg2
      FROM g
    ), a AS (
      SELECT l_returnflag,
             CAST(sum(cnt_t) AS BIGINT) AS n_treat,
             CAST(sum(cnt - cnt_t) AS BIGINT) AS n_ctrl,
             sum(CAST(cnt_t AS DECIMAL(38,0)) * avg2) AS two_r1,
             sum(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS ties
      FROM r GROUP BY 1
    ), d AS (
      SELECT l_returnflag, n_treat, n_ctrl,
             CAST(n_treat AS DOUBLE) AS n1, CAST(n_ctrl AS DOUBLE) AS n2,
             CAST(n_treat AS DOUBLE) + CAST(n_ctrl AS DOUBLE) AS n,
             (CAST(two_r1 AS DOUBLE)
              - CAST(n_treat AS DOUBLE) * (CAST(n_treat AS DOUBLE) + 1.0))
             / 2.0 AS u1,
             CAST(ties AS DOUBLE) AS ties_d
      FROM a
    )
    SELECT l_returnflag, n_treat, n_ctrl,
           round(u1, 6) AS u_stat,
           round((u1 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0
                        * ((n + 1.0) - ties_d / (n * (n - 1.0)))), 6)
             AS z_stat,
           round(u1 / (n1 * n2), 6) AS auc
    FROM d
    """,
)
def q_promo_price_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free A/B: Mann-Whitney U / rank-sum z of extended
    price, PROMO parts vs the rest, per return flag —
    ``ops/stats.mann_whitney_u``, the nonparametric twin of
    ``promo_price_ttest`` (same treatment split, no normality
    assumption; the auc column doubles as "P(random promo line outranks
    a random non-promo line)"). Plan: rows collapse to (flag, price)
    tie groups in one partial-combined groupBy, the rank window runs
    over TIE GROUPS per flag, and all rank moments are DECIMAL-exact —
    z/auc are double math on exact integers, rounded 6 (welch
    convention)."""
    from fxspark.ops.stats import mann_whitney_u

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    u = mann_whitney_u(
        j, "l_returnflag", F.col("l_extendedprice"), F.col("p_type") == "PROMO"
    )
    return u.select(
        "l_returnflag",
        "n_treat",
        "n_ctrl",
        F.round("u_stat", 6).alias("u_stat"),
        F.round("z_stat", 6).alias("z_stat"),
        F.round("auc", 6).alias("auc"),
    )


@query(
    "promo_price_ks",
    oracle="""
    WITH j AS (
      -- ks_two_sample excludes NULL values / NULL treatment flags
      -- (pairwise-complete contract).
      SELECT l_returnflag, l_extendedprice AS v,
             CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS t
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_extendedprice IS NOT NULL AND p_type IS NOT NULL
    ), g AS (
      SELECT l_returnflag, v,
             sum(t) AS ct, sum(1 - t) AS cc
      FROM j GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag,
             sum(ct) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cumt,
             sum(cc) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cumc,
             sum(ct) OVER (PARTITION BY l_returnflag) AS nt,
             sum(cc) OVER (PARTITION BY l_returnflag) AS nc
      FROM g
    ), a AS (
      SELECT l_returnflag,
             CAST(max(nt) AS BIGINT) AS n_treat,
             CAST(max(nc) AS BIGINT) AS n_ctrl,
             max(abs(CAST(cumt AS DECIMAL(38,0)) * nc
                     - CAST(cumc AS DECIMAL(38,0)) * nt)) AS dnum
      FROM c GROUP BY 1
    )
    SELECT l_returnflag, n_treat, n_ctrl,
           round(CAST(dnum AS DOUBLE)
                 / (CAST(n_treat AS DOUBLE) * CAST(n_ctrl AS DOUBLE)), 6)
             AS ks_d
    FROM a
    """,
)
def q_promo_price_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D of extended price, PROMO vs
    non-PROMO per return flag — ``ops/stats.ks_two_sample``, the
    whole-distribution drift test that completes the A/B family
    (t = means, U = ranks, KS = any CDF gap; PSI's binless sibling —
    no declared edges). The gap is maximized as the exact integer
    ``|cum_t·n_c − cum_c·n_t|`` and divided once, so D is bit-stable
    with no float CDF accumulation."""
    from fxspark.ops.stats import ks_two_sample

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    k = ks_two_sample(
        j, "l_returnflag", F.col("l_extendedprice"), F.col("p_type") == "PROMO"
    )
    return k.select(
        "l_returnflag",
        "n_treat",
        "n_ctrl",
        F.round("ks_d", 6).alias("ks_d"),
    )


@query(
    "event_value_time_spearman",
    oracle="""
    WITH r AS (
      SELECT event_type,
             2 * rank() OVER (PARTITION BY event_type ORDER BY value)
               + count(*) OVER (PARTITION BY event_type, value) - 1 AS rx,
             2 * rank() OVER (PARTITION BY event_type ORDER BY epoch_us(ts))
               + count(*) OVER (PARTITION BY event_type, epoch_us(ts)) - 1
               AS ry
      -- spearman_rho is pairwise-complete by contract: rows with a NULL
      -- coordinate are excluded up front (NULLs rank FIRST in Spark but
      -- LAST in DuckDB, so leaving them in corrupts the ranks).
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ), a AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             sum(CAST(rx AS DECIMAL(38,0))) AS sx,
             sum(CAST(ry AS DECIMAL(38,0))) AS sy,
             sum(CAST(rx AS DECIMAL(38,0)) * rx) AS sxx,
             sum(CAST(ry AS DECIMAL(38,0)) * ry) AS syy,
             sum(CAST(rx AS DECIMAL(38,0)) * ry) AS sxy
      FROM r GROUP BY 1
    ), d AS (
      SELECT event_type, n_rows,
             CAST(n_rows AS DOUBLE) AS n,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
             CAST(sxy AS DOUBLE) AS sxyd
      FROM a
    )
    SELECT event_type, n_rows,
           round((n * sxyd - sxd * syd)
                 / sqrt((n * sxxd - sxd * sxd)
                        * (n * syyd - syd * syd)), 6) AS rho
    FROM d
    """,
)
def q_event_value_time_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-trend detector: Spearman rank correlation between event
    value and event time, per event type — ``ops/stats.spearman_rho``.
    Where ``user_value_trend``'s OLS slope measures the LINEAR drift,
    Spearman answers "is value drifting in ANY monotone way over the
    month" with outlier-immune ranks (the Mann-Kendall-style monitor a
    feature pipeline runs per column). Average-rank ties are carried as
    exact 2×rank integers; all five rank moments are DECIMAL-exact, rho
    is one double expression, rounded 6."""
    from fxspark.ops.stats import spearman_rho

    events = load_table(spark, sf_dir, "events")
    rho = spearman_rho(
        events, "event_type", F.col("value"), F.unix_micros(F.col("ts"))
    )
    return rho.select(
        "event_type",
        "n_rows",
        F.round("rho", 6).alias("rho"),
    )


@query(
    "nation_spend_theil",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, c_nationkey,
             sum(CAST(o_totalprice AS DECIMAL(38,4))) AS spend
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), st AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_pos,
             sum(spend) AS sx
      FROM spend WHERE spend > 0 GROUP BY 1
    ), m AS (
      SELECT c_nationkey, n_pos,
             round(CAST(sx AS DOUBLE) / CAST(n_pos AS DOUBLE), 6)
               AS mean_value
      FROM st
    ), t AS (
      SELECT s.c_nationkey,
             sum(CAST((CAST(s.spend AS DOUBLE) / m.mean_value)
                      * ln(CAST(s.spend AS DOUBLE) / m.mean_value)
                      AS DECIMAL(38,9))) AS term
      FROM spend s JOIN m USING (c_nationkey)
      WHERE s.spend > 0 GROUP BY 1
    )
    SELECT n_name, n_pos, mean_value,
           round(CAST(term AS DOUBLE) / CAST(n_pos AS DOUBLE), 6)
             AS theil_t
    FROM t JOIN m USING (c_nationkey)
    JOIN nation ON n_nationkey = t.c_nationkey
    """,
)
def q_nation_spend_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of customer spend concentration per nation —
    ``ops/stats.theil_index``, ``nation_spend_gini``'s
    information-theoretic sibling and the inequality measure that
    decomposes additively across subgroups (within-nation + between-
    nation sums to corpus Theil — the property auditors use). NO rank
    window: two broadcast-joined rollups replace gini's per-key sort,
    so this is the inequality form that survives unbounded groups.
    μ is rounded to 6 before the ln terms (declared semantics that kill
    the decimal→double edge-cast ulp), each (x/μ)·ln(x/μ) term is
    truncated to DECIMAL(38,9) for the exact sum — the PSI ln-family
    discipline."""
    from fxspark.ops.stats import theil_index

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("spend"))
    )
    t = theil_index(spend, "c_nationkey", F.col("spend"))
    return t.join(
        F.broadcast(nation),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).select(
        "n_name",
        "n_pos",
        "mean_value",
        F.round("theil_t", 6).alias("theil_t"),
    )




@query(
    "order_value_auc",
    oracle="""
    WITH ol AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               AS v,
             CASE WHEN count(*) >= 4 THEN 1 ELSE 0 END AS t
      FROM lineitem GROUP BY 1
    ), j AS (
      -- mann_whitney_u drops NULL scores (pairwise-complete contract);
      -- t is a count predicate and never NULL.
      SELECT o_orderpriority, v, t
      FROM orders JOIN ol ON l_orderkey = o_orderkey
      WHERE v IS NOT NULL
    ), g AS (
      SELECT o_orderpriority, v, count(*) AS cnt, sum(t) AS cnt_t
      FROM j GROUP BY 1, 2
    ), r AS (
      SELECT o_orderpriority, cnt, cnt_t,
             2 * sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY v
                                ROWS UNBOUNDED PRECEDING) - cnt + 1 AS avg2
      FROM g
    ), a AS (
      SELECT o_orderpriority,
             CAST(sum(cnt_t) AS BIGINT) AS n_big,
             CAST(sum(cnt - cnt_t) AS BIGINT) AS n_small,
             sum(CAST(cnt_t AS DECIMAL(38,0)) * avg2) AS two_r1,
             sum(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS ties
      FROM r GROUP BY 1
    ), f AS (
      SELECT o_orderpriority, n_big, n_small,
             CAST(n_big AS BIGINT) AS nb,
             CAST(n_big AS DOUBLE) AS n1, CAST(n_small AS DOUBLE) AS n2,
             CAST(n_big AS DOUBLE) + CAST(n_small AS DOUBLE) AS n,
             (CAST(two_r1 AS DOUBLE)
              - CAST(n_big AS DOUBLE) * (CAST(n_big AS DOUBLE) + 1.0))
             / 2.0 AS u1,
             CAST(ties AS DOUBLE) AS ties_d
      FROM a
    )
    SELECT o_orderpriority, n_big, n_small,
           round(u1 / (n1 * n2), 6) AS auc,
           round((u1 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0
                        * ((n + 1.0) - ties_d / (n * (n - 1.0)))), 6)
             AS z_stat
    FROM f
    """,
)
def q_order_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality eval: ROC AUC (``ops/stats.mann_whitney_u`` —
    AUC IS U/(n1·n2)) of an order's summed line revenue as a detector of
    big baskets (≥4 lineitems), per order priority. The shape every
    score-vs-label eval takes before a threshold gates production:
    per-slice AUC plus the rank-sum z saying whether the separation is
    real on the slice's sample size — here the signal is mechanical
    (more lines ⇒ more revenue), so the slices land well above 0.5 and
    the z is unambiguous. One join + tie-group rollup; all rank moments
    DECIMAL-exact."""
    from fxspark.ops.stats import mann_whitney_u

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ol = li.groupBy("l_orderkey").agg(
        exact_sum(F.col("l_extendedprice"), 4).alias("v"),
        (F.count(F.lit(1)) >= 4).alias("t"),
    )
    j = orders.join(ol, F.col("l_orderkey") == F.col("o_orderkey"))
    u = mann_whitney_u(j, "o_orderpriority", F.col("v"), F.col("t"))
    return u.select(
        "o_orderpriority",
        F.col("n_treat").alias("n_big"),
        F.col("n_ctrl").alias("n_small"),
        F.round("auc", 6).alias("auc"),
        F.round("z_stat", 6).alias("z_stat"),
    )


@query(
    "order_value_calibration",
    oracle="""
    WITH ol AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               AS rev,
             CASE WHEN count(*) >= 4 THEN 1 ELSE 0 END AS y
      FROM lineitem GROUP BY 1
    ), s AS (
      SELECT least(1.0, rev / 600000.0) AS s, y FROM ol
    ), b AS (
      SELECT least(9, CAST(floor(s * 10.0) AS INTEGER)) AS bin, s, y
      FROM s
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(s AS DECIMAL(38,9))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_score,
           round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS frac_pos,
           round(CAST(sum(CAST((s - y) * (s - y) AS DECIMAL(38,9))
                      ) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS brier
    FROM b GROUP BY 1
    """,
)
def q_order_value_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the same big-basket score: normalize line
    revenue by a DECLARED cap into [0,1], bucket into ten fixed bins,
    and report mean score vs observed big-basket rate per bin (the
    reliability-diagram numbers that justify using a score as a
    probability), plus each bin's Brier contribution. The fixture's
    monotone frac_pos curve is the mechanical revenue↔lines coupling
    surfacing in the calibration — exactly what the table is for. One
    groupBy to order grain, then a map-side expression + 10-group
    hash-agg; score and squared-error sums truncate to DECIMAL(38,9)
    before the exact sum (ln-family discipline on eval metrics)."""
    li = load_table(spark, sf_dir, "lineitem")
    ol = li.groupBy("l_orderkey").agg(
        exact_sum(F.col("l_extendedprice"), 4).alias("rev"),
        (F.count(F.lit(1)) >= 4).cast("int").alias("y"),
    )
    s = F.least(F.lit(1.0), F.col("rev") / 600000.0)
    b = ol.select(
        F.least(F.lit(9), F.floor(s * 10.0).cast("int")).alias("bin"),
        s.alias("s"),
        F.col("y"),
    )
    n = F.count(F.lit(1))
    return b.groupBy("bin").agg(
        n.alias("n_orders"),
        F.round(
            F.sum(F.col("s").cast("decimal(38,9)")).cast("double")
            / n.cast("double"),
            6,
        ).alias("mean_score"),
        F.round(F.sum("y").cast("double") / n.cast("double"), 6).alias(
            "frac_pos"
        ),
        F.round(
            F.sum(
                ((F.col("s") - F.col("y")) * (F.col("s") - F.col("y"))).cast(
                    "decimal(38,9)"
                )
            ).cast("double")
            / n.cast("double"),
            6,
        ).alias("brier"),
    )



@query(
    "customer_decile_lift",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
               AS spend
      FROM orders WHERE o_orderdate < DATE '1999-01-01' GROUP BY 1
    ), y AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderdate >= DATE '1999-01-01'
                 THEN 1 ELSE 0 END) AS yy
      FROM orders GROUP BY 1
    ),
    nn AS (SELECT spend FROM spend WHERE spend IS NOT NULL),
    st AS (SELECT count(*) AS c FROM nn),
    r AS (SELECT spend, row_number() OVER (ORDER BY spend) AS rn FROM nn),
    b AS (
      SELECT r.spend AS bv
      FROM r JOIN (SELECT i, (c * i + 9) // 10 AS k
                   FROM st, (SELECT unnest(range(1, 10)) AS i)) t
        ON r.rn = t.k
    ), d AS (
      SELECT s.o_custkey,
             CAST(10 - (SELECT count(*) FROM b WHERE b.bv < s.spend)
                  AS INTEGER) AS decile,
             y.yy
      FROM spend s JOIN y USING (o_custkey)
      WHERE s.spend IS NOT NULL
    ), a AS (
      SELECT decile, count(*) AS n_cust, sum(yy) AS n_pos
      FROM d GROUP BY 1
    ), w AS (
      SELECT decile, n_cust, n_pos,
             sum(n_pos) OVER (ORDER BY decile
                              ROWS UNBOUNDED PRECEDING) AS cum_pos,
             sum(n_pos) OVER () AS tot_pos,
             sum(n_cust) OVER () AS tot_n
      FROM a
    )
    SELECT decile,
           CAST(n_cust AS BIGINT) AS n_cust,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(CAST(n_pos AS DOUBLE) / CAST(n_cust AS DOUBLE), 6)
             AS rate,
           round((CAST(n_pos AS DOUBLE) / CAST(n_cust AS DOUBLE))
                 / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE)), 6)
             AS lift,
           round(CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE), 6)
             AS cum_capture
    FROM w
    """,
)
def q_customer_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table — the targeting-model backtest: score
    customers by historic spend (orders before 1999), bucket into spend
    deciles (1 = top, ``ops/quantile.quantile_bins`` — boundary
    localization + map-side binning, no global ntile sort), and report
    each decile's repurchase rate (ordered again in/after 1999), its
    lift over the base rate, and the cumulative share of repurchasers
    captured walking down the deciles — the gains curve that says "the
    top-k deciles reach x% of converters". The only full-data work is
    two order-grain rollups; lift/capture windows run over the TEN
    decile rows (bounded grain)."""
    from pyspark.sql import Window

    from fxspark.ops.quantile import quantile_bins

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("date")
    spend = (
        orders.filter(F.col("o_orderdate") < cut)
        .groupBy("o_custkey")
        .agg(exact_sum(F.col("o_totalprice"), 4).alias("spend"))
        # a customer whose every pre-cutoff order has a NULL totalprice has
        # no score — unrankable, excluded from the gains table by contract
        # (a NULL decile row would also hit D8 NULL placement in the
        # cumulative-capture window); no-op when totalprice is populated
        .filter(F.col("spend").isNotNull())
        .localCheckpoint(eager=False)
    )
    y = orders.groupBy("o_custkey").agg(
        F.max((F.col("o_orderdate") >= cut).cast("int")).alias("yy")
    )
    d = quantile_bins(spend, "spend", 10, "decile", descending=True).join(
        y, "o_custkey"
    )
    a = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("yy").alias("n_pos"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    # bounded-grain global windows: exactly 10 decile rows
    w = (
        a.withColumn("cum_pos", F.sum("n_pos").over(wcum))
        .withColumn("tot_pos", F.sum("n_pos").over(wall))
        .withColumn("tot_n", F.sum("n_cust").over(wall))
    )
    rate = F.col("n_pos").cast("double") / F.col("n_cust").cast("double")
    base = F.col("tot_pos").cast("double") / F.col("tot_n").cast("double")
    # lift/cum_capture via try_divide: with ZERO repurchasers (degenerate
    # inputs) base and tot_pos are 0, where DuckDB's division yields NULL
    # but Spark's ANSI division throws (round-14 sf_unit registry sweep).
    # rate's denominator n_cust is ≥1 by construction and stays `/`.
    return w.select(
        "decile",
        "n_cust",
        "n_pos",
        F.round(rate, 6).alias("rate"),
        F.round(F.try_divide(rate, base), 6).alias("lift"),
        F.round(
            F.try_divide(
                F.col("cum_pos").cast("double"),
                F.col("tot_pos").cast("double"),
            ),
            6,
        ).alias("cum_capture"),
    )



@query(
    "events_hll_distinct",
    oracle="""
    WITH h AS (
      SELECT event_type, md5(CAST(event_id AS VARCHAR)) AS hx
      FROM events
    ), rk AS (
      SELECT event_type,
             CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS reg,
             CASE WHEN length(ltrim(substr(hx, 3, 14), '0')) = 0 THEN 57
                  ELSE (14 - length(ltrim(substr(hx, 3, 14), '0'))) * 4
                       + CASE substr(ltrim(substr(hx, 3, 14), '0'), 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1
                           WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                       + 1 END AS rnk
      FROM h
    ), rmax AS (
      SELECT event_type, reg, max(rnk) AS r
      FROM rk GROUP BY 1, 2
    ), spine AS (
      SELECT t.event_type, g.reg
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(range(256)) AS reg) g
    ), full_regs AS (
      SELECT spine.event_type, spine.reg, coalesce(rmax.r, 0) AS r
      FROM spine LEFT JOIN rmax
        ON rmax.event_type = spine.event_type AND rmax.reg = spine.reg
    ), agg AS (
      SELECT event_type,
             sum(CAST((CAST(1 AS BIGINT) << (57 - r)) AS DECIMAL(38,0)))
               AS s2,
             CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_zero
      FROM full_regs GROUP BY 1
    ), est AS (
      SELECT event_type, v_zero,
             (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
             / (CAST(s2 AS DOUBLE) / 144115188075855872.0) AS eraw
      FROM agg
    ), t AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_seen,
             CAST(count(DISTINCT event_id) AS BIGINT) AS true_distinct
      FROM events GROUP BY 1
    )
    SELECT t.event_type, t.n_seen, est.v_zero,
           CAST(round(CASE WHEN est.eraw <= 640.0 AND est.v_zero > 0
                           THEN 256.0 * ln(256.0 / est.v_zero)
                           ELSE est.eraw END, 0) AS BIGINT)
             AS est_distinct,
           t.true_distinct
    FROM t JOIN est USING (event_type)
    """,
)
def q_events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct count per event type with DECLARED md5
    randomness — the constant-memory (m=256 registers) sibling of
    ``events_kmv_distinct``, emitting the classic alpha-corrected
    harmonic-mean estimate with the standard linear-counting fallback
    for the small range. Register = first 8 hash bits, rank = leading
    zeros of the next 56 — both derived by exact HEX-STRING arithmetic
    (ltrim of the hex substring + a 16-case nibble table), never
    floor(log2(x)) whose float rounding flips at power-of-two
    boundaries for >53-bit inputs. The harmonic sum Σ2^(−rank) is
    carried as the exact integer Σ2^(57−rank) in DECIMAL(38,0) and
    divided once, so the ESTIMATE is bit-reproduced by the oracle.
    Scale: one hash-agg to (type, register) grain — 256 longs per key,
    mergeable across any partitioning, the sketch a 100 TB profiler
    keeps per column."""
    events = load_table(spark, sf_dir, "events")
    # bind the md5 ONCE, then the ltrim'd rank substring once — the rank
    # expression reads the bound columns, so each row pays one md5 (a
    # review pass found the expr form re-deriving it four times)
    h0 = events.select(
        "event_type",
        F.md5(F.col("event_id").cast("string")).alias("hx"),
    ).select(
        "event_type",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("long").alias("reg"),
        F.expr("TRIM(LEADING '0' FROM substr(hx, 3, 14))").alias("st"),
    )
    first = F.substring("st", 1, 1)
    nib_lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    h = h0.select(
        "event_type",
        "reg",
        F.when(F.length("st") == 0, F.lit(57))
        .otherwise((14 - F.length("st")) * 4 + nib_lz + 1)
        .alias("rnk"),
    )
    rmax = h.groupBy("event_type", "reg").agg(F.max("rnk").alias("r"))
    spine = (
        events.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(256).select(F.col("id").cast("long").alias("reg"))
        )
    )
    full_regs = spine.join(rmax, ["event_type", "reg"], "left").select(
        "event_type", "reg", F.coalesce(F.col("r"), F.lit(0)).alias("r")
    )
    agg = full_regs.groupBy("event_type").agg(
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), 57 - CAST(r AS INT))"
                " AS DECIMAL(38,0))"
            )
        ).alias("s2"),
        F.sum((F.col("r") == 0).cast("long")).alias("v_zero"),
    )
    alpha_m2 = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
    eraw = alpha_m2 / (
        F.col("s2").cast("double") / F.lit(float(2**57))
    )
    est = agg.select(
        "event_type",
        "v_zero",
        F.when(
            (eraw <= 640.0) & (F.col("v_zero") > 0),
            256.0 * F.log(256.0 / F.col("v_zero").cast("double")),
        )
        .otherwise(eraw)
        .alias("eraw"),
    )
    t = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.count_distinct(F.col("event_id")).alias("true_distinct"),
    )
    return t.join(est, "event_type").select(
        "event_type",
        "n_seen",
        "v_zero",
        F.round(F.col("eraw"), 0).cast("long").alias("est_distinct"),
        "true_distinct",
    )



@query(
    "token_cms_estimates",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
      FROM documents
    ), pairs AS (
      SELECT w, j,
             CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || w), 1, 15))
                  AS BIGINT) % 1024 AS b
      FROM toks, (SELECT unnest(range(4)) AS j)
    ), sketch AS (
      SELECT j, b, count(*) AS cnt FROM pairs GROUP BY 1, 2
    ), top AS (
      SELECT w, count(*) AS exact_n
      FROM toks GROUP BY w ORDER BY exact_n DESC, w LIMIT 10
    ), qh AS (
      SELECT top.w, top.exact_n, g.j,
             CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || top.w),
                                  1, 15)) AS BIGINT) % 1024 AS b
      FROM top, (SELECT unnest(range(4)) AS j) g
    )
    SELECT qh.w AS token,
           CAST(max(qh.exact_n) AS BIGINT) AS exact_n,
           CAST(min(sketch.cnt) AS BIGINT) AS cms_est,
           CAST(min(sketch.cnt) - max(qh.exact_n) AS BIGINT)
             AS overcount
    FROM qh JOIN sketch ON sketch.j = qh.j AND sketch.b = qh.b
    GROUP BY qh.w
    """,
)
def q_token_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point estimates for the corpus's top tokens,
    with DECLARED md5 row hashes (depth 4 × width 1024): the
    fixed-memory frequency sketch that completes the mergeable-sketch
    family (KMV/HLL = cardinality, Misra-Gries = candidates, CMS =
    point frequency with a one-sided ε·N error bound). The sketch is
    one partial-combined groupBy to (row, bucket) grain — 4,096
    counters total, mergeable across partitions/days by addition; the
    probe side joins the exact top-10 tokens (TakeOrdered, the
    heavy-hitters baseline) against their 4 buckets and takes the min.
    The ``overcount`` column is the CMS guarantee made visible: always
    ≥ 0 (CMS never underestimates), bounded by collisions with the
    other tokens in each bucket."""
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("w"))

    def bucket(j: Column, w: Column) -> Column:
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(j.cast("string"), F.lit(":"), w)), 1, 15
                ),
                16,
                10,
            ).cast("long"),
            F.lit(1024),
        )

    js = F.array([F.lit(j) for j in range(4)])
    pairs = toks.select("w", F.explode(js).alias("j")).select(
        "j", bucket(F.col("j"), F.col("w")).alias("b")
    )
    sketch = pairs.groupBy("j", "b").agg(F.count(F.lit(1)).alias("cnt"))
    top = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "w")
        .limit(10)
    )
    qh = top.crossJoin(
        spark.range(4).select(F.col("id").cast("int").alias("j"))
    ).select("w", "exact_n", "j", bucket(F.col("j"), F.col("w")).alias("b"))
    return (
        qh.join(F.broadcast(sketch), ["j", "b"])
        .groupBy(F.col("w").alias("token"))
        .agg(
            F.max("exact_n").alias("exact_n"),
            F.min("cnt").alias("cms_est"),
            (F.min("cnt") - F.max("exact_n")).alias("overcount"),
        )
    )



def _hilbert_stats_oracle() -> str:
    from fxspark.ops.layout import hilbert_sql_ctes

    base = (
        "(SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS vb,"
        " ((user_id % 65536) + 65536) % 65536 AS ha,"
        " ((CAST(floor(value * 100) AS BIGINT) % 65536) + 65536) % 65536"
        " AS hb FROM events)"
    )
    ctes, fin = hilbert_sql_ctes(base, "ha", "hb", bits=16)
    return f"""
    WITH {ctes}
    SELECT CAST(floor(hd / 67108864.0) AS BIGINT) AS hbin,
           count(*) AS n_events,
           min(user_id) AS min_user, max(user_id) AS max_user,
           min(vb) AS min_vb, max(vb) AS max_vb
    FROM {fin} GROUP BY 1
    """


@query("events_hilbert_stats", oracle=_hilbert_stats_oracle())
def q_events_hilbert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering quality report — ``events_zorder_stats``'s
    twin on the locality-superior space-filling curve
    (``ops/layout.hilbert_layout_index``): index (user_id, value-bucket)
    on the 16-bit Hilbert walk, bin by the top index bits, and report
    each bin's min/max in BOTH dimensions — the parquet-footer ranges an
    OPTIMIZE-by-Hilbert write would produce. Unlike Morton bins, every
    Hilbert bin is a CONNECTED region of the key grid (consecutive
    addresses are always grid neighbors — property-pinned in
    tests/test_round9_ops.py), so per-file dimension ranges are tighter
    at the same file count. The walk is 16 fused projections (one
    codegen stage, no shuffle); the only exchange is the bounded
    64-bin rollup."""
    from fxspark.ops.layout import hilbert_layout_index

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("vb"),
        F.pmod(F.col("user_id"), F.lit(65536)).alias("ha"),
        F.pmod(
            F.floor(F.col("value") * 100).cast("long"), F.lit(65536)
        ).alias("hb"),
    )
    h = hilbert_layout_index(base, F.col("ha"), F.col("hb"), "hd", bits=16)
    return h.groupBy(
        F.floor(F.col("hd") / F.lit(67108864.0)).cast("long").alias("hbin")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("vb").alias("min_vb"),
        F.max("vb").alias("max_vb"),
    )



@query(
    "orders_topk_retraction",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus,
             CASE WHEN o_orderdate < DATE '1996-09-01' THEN 0
                  WHEN o_orderdate < DATE '1998-05-01' THEN 1
                  WHEN o_orderdate < DATE '2000-01-01' THEN 2
                  ELSE 3 END AS tk
      FROM orders
    ), t AS (SELECT unnest(range(4)) AS tick),
    alive AS (
      SELECT t.tick, o.o_orderkey, o.o_totalprice
      -- NULL status is not finalized: never retracted (null-safe spell)
      FROM t JOIN o ON o.tk <= t.tick
        AND NOT (coalesce(o.o_orderstatus, '') = 'F' AND o.tk < t.tick)
    ), r AS (
      SELECT tick, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY tick
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rk
      FROM alive
    )
    SELECT CAST(tick AS INTEGER) AS tick, CAST(rk AS INTEGER) AS rk,
           o_orderkey, o_totalprice
    FROM r WHERE rk <= 10
    """,
)
def q_orders_topk_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained top-10 order book under RETRACTIONS
    (``ops/ivm.topk_retraction``): orders enter at their yearly tick
    and leave one tick later if finalized (status 'F') — a live
    "largest open orders" leaderboard. Top-k is the canonical view that
    breaks monotone IVM (a delete inside the top-k promotes a row the
    state no longer holds), so the op keeps a 4k bounded buffer, folds
    each tick in O(batch + B), counts the deletes that actually hit the
    buffer, and rebuilds from the alive set only when the CUMULATIVE
    hits since the last rebuild exceed the declared B−k soundness
    bound (spares consumed by hits never replenish — a per-tick check
    would go silently wrong; never triggered on this fixture —
    cumulative hits 28 vs bound 30; the bound check is what makes the
    maintained answer EXACT rather than usually-right). The oracle is
    the closed form: per tick, rank the alive set from scratch —
    maintained ≡ from-scratch is the IVM correctness statement."""
    from fxspark.ops.ivm import topk_retraction

    orders = load_table(spark, sf_dir, "orders")
    cuts = ["1996-09-01", "1998-05-01", "2000-01-01"]

    def tick_of(col):
        t = F.when(col < F.lit(cuts[0]).cast("date"), F.lit(0))
        for i, c in enumerate(cuts[1:], start=1):
            t = t.when(col < F.lit(c).cast("date"), F.lit(i))
        return t.otherwise(F.lit(len(cuts)))

    o = orders.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        tick_of(F.col("o_orderdate")).alias("_tk"),
    ).localCheckpoint(eager=False)
    ticks = []
    for i in range(4):
        ins = o.filter(F.col("_tk") == i)
        dels = (
            o.filter((F.col("_tk") == i - 1) & (F.col("o_orderstatus") == "F"))
            if i > 0
            else None
        )
        ticks.append((ins, dels))

    def alive_at(i: int):
        # null-safe: a NULL status is NOT finalized — it must survive the
        # rebuild exactly as it survives the incremental path (whose
        # delete filter status=='F' is null-safe FALSE); the bare ~(=&<)
        # spell silently dropped it (three-valued logic, round-16
        # independent-null sweep)
        return o.filter(
            (F.col("_tk") <= i)
            & ~(
                (F.coalesce(F.col("o_orderstatus"), F.lit("")) == "F")
                & (F.col("_tk") < i)
            )
        )

    return topk_retraction(
        ticks, "o_orderkey", "o_totalprice", k=10, buffer_mult=4,
        alive_at=alive_at,
    )



@query(
    "stream_debounce_replay",
    oracle="""
    WITH l AS (
      -- event-time contract: a NULL-ts event never reaches the stream
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS pts
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, event_id, ts
    FROM l
    WHERE pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000
    """,
)
def q_stream_debounce_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming/stateful.stateful_debounce`` (gap
    30 min): an event is kept iff it opens a burst — no prior event, or
    the PREVIOUS event (kept or dropped) is more than the gap behind.
    The streaming operator's one-long state (last event time) makes
    this a lag comparison in batch: because events process in
    (ts, id) order, the running last-seen clock IS the lag — so the
    closed form is one window per user, and stream-vs-batch kept-set
    parity across real micro-batches is pinned by
    ``tests/test_streaming_multimodal.py``. Distinct from
    ``events_debounced`` (2 h sessionize + burst sizes): this is the
    stream twin's exact emission — kept events only, a burst's size
    being unknowable at keep-time on a stream."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # event-time contract — see oracle note
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = events.withColumn("_pts", F.lag("ts").over(w))
    return l.filter(
        F.col("_pts").isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("_pts"))
            > 1_800_000_000
        )
    ).select("user_id", "event_id", "ts")


@query(
    "user_event_trigrams",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
           CAST(count(*) AS BIGINT) AS support,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY support DESC, trigram LIMIT 15
    """,
)
def q_user_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining at the cheapest useful order: the
    top-15 length-3 event-type sequences by support (with per-user
    reach) — the contiguous-trigram view that extends
    ``event_transition_matrix``'s bigram chain one step (funnel
    discovery without the combinatorial PrefixSpan lattice: contiguous
    n-grams are ONE lead-window pass per extra step, support counting
    is a hash rollup). Scale: the window partitions by user (bounded
    per-user history), the trigram rollup partial-combines map-side,
    and the top-15 is TakeOrdered — no global sort."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    # sequence elements need BOTH coordinates: NULL ts is unplaceable on
    # the per-user timeline (D8 placement split) and a NULL event_type has
    # no label — Spark's concat_ws would silently SKIP it, splicing
    # non-adjacent events into a fake trigram, where the oracle's || chain
    # nullifies (round-16 independent-null sweep). No-op on driver data.
    events = events.filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        s.groupBy(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("support"), "trigram")
        .limit(15)
    )


@query(
    "source_token_jsd",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS token
      FROM documents
    ), cc AS (
      SELECT token, count(*) AS cv FROM tok GROUP BY token
    ), top AS (
      SELECT token, cv FROM cc ORDER BY cv DESC, token LIMIT 200
    ), sv AS (
      SELECT tok.source, tok.token, count(*) AS c
      FROM tok JOIN top ON tok.token = top.token
      GROUP BY tok.source, tok.token
    ), st AS (
      SELECT source, sum(c) AS ts FROM sv GROUP BY source
    ), pairs AS (
      SELECT a.source AS source_a, a.ts AS ta, b.source AS source_b,
             b.ts AS tb
      FROM st a JOIN st b ON a.source < b.source
    ), grid AS (
      SELECT p.source_a, p.source_b, p.ta, p.tb, top.token,
             coalesce(sa.c, 0) AS ca, coalesce(sb.c, 0) AS cb
      FROM pairs p CROSS JOIN top
      LEFT JOIN sv sa ON sa.source = p.source_a AND sa.token = top.token
      LEFT JOIN sv sb ON sb.source = p.source_b AND sb.token = top.token
    ), terms AS (
      SELECT source_a, source_b,
             CAST(ca + 1 AS DOUBLE) / CAST(ta + 200 AS DOUBLE) AS p,
             CAST(cb + 1 AS DOUBLE) / CAST(tb + 200 AS DOUBLE) AS q
      FROM grid
    )
    SELECT source_a, source_b,
           CAST(0.5 * CAST(sum(CAST(p * ln(p / (0.5 * (p + q)))
                                    AS DECIMAL(38,9))) AS DOUBLE)
                + 0.5 * CAST(sum(CAST(q * ln(q / (0.5 * (p + q)))
                                      AS DECIMAL(38,9))) AS DOUBLE)
                AS DOUBLE) AS jsd
    FROM terms GROUP BY 1, 2
    """,
)
def q_source_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions over the shared top-200 vocabulary — the SYMMETRIC,
    bounded (≤ ln 2) companion of ``source_token_kl``, and the standard
    inter-source distance in corpus-mixing work (KL says "how far is
    this source from the corpus"; JSD gives the source×source distance
    matrix that mixture planning and redundancy pruning consume).
    Topology matches the KL query: bounded top-k vocabulary, one
    (source, token) rollup shared by both sides, a |pairs|×200
    broadcast-sized grid, and every p·ln(p/m) term double-computed in
    pinned operand order then truncated to DECIMAL(38,9) before the
    exact sum."""
    from fxspark.ops.latest import k_largest_global
    from fxspark.ops.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    sv0 = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    cc = sv0.groupBy("token").agg(F.sum("c").alias("cv"))
    top = k_largest_global(cc, "cv", 200, tiebreak="token").select(
        "token"
    )
    sv = sv0.join(F.broadcast(top), "token")
    st = sv.groupBy("source").agg(F.sum("c").alias("ts_"))
    pairs = (
        st.select(
            F.col("source").alias("source_a"), F.col("ts_").alias("ta")
        )
        .join(
            F.broadcast(
                st.select(
                    F.col("source").alias("source_b"),
                    F.col("ts_").alias("tb"),
                )
            ),
            F.col("source_a") < F.col("source_b"),
        )
    )
    grid = (
        pairs.crossJoin(F.broadcast(top))
        .join(
            F.broadcast(
                sv.select(
                    F.col("source").alias("source_a"),
                    "token",
                    F.col("c").alias("ca"),
                )
            ),
            ["source_a", "token"],
            "left",
        )
        .join(
            F.broadcast(
                sv.select(
                    F.col("source").alias("source_b"),
                    "token",
                    F.col("c").alias("cb"),
                )
            ),
            ["source_b", "token"],
            "left",
        )
        .select(
            "source_a",
            "source_b",
            (
                (F.coalesce(F.col("ca"), F.lit(0)) + 1).cast("double")
                / (F.col("ta") + 200).cast("double")
            ).alias("p"),
            (
                (F.coalesce(F.col("cb"), F.lit(0)) + 1).cast("double")
                / (F.col("tb") + 200).cast("double")
            ).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    m = 0.5 * (p + q)
    return grid.groupBy("source_a", "source_b").agg(
        (
            0.5 * F.sum((p * F.log(p / m)).cast("decimal(38,9)")).cast("double")
            + 0.5
            * F.sum((q * F.log(q / m)).cast("decimal(38,9)")).cast("double")
        )
        .cast("double")
        .alias("jsd")
    )



@query(
    "part_return_eb_shrinkage",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ret
      FROM lineitem GROUP BY 1
    ), mom AS (
      SELECT CAST(count(*) AS DOUBLE) AS np,
             CAST(sum(CAST(CAST(n_ret AS DOUBLE) / CAST(n_lines AS DOUBLE)
                           AS DECIMAL(38,9))) AS DOUBLE) AS sr,
             CAST(sum(CAST((CAST(n_ret AS DOUBLE) / CAST(n_lines AS DOUBLE))
                           * (CAST(n_ret AS DOUBLE) / CAST(n_lines AS DOUBLE))
                           AS DECIMAL(38,9))) AS DOUBLE) AS srr
      FROM pr
    ), prior AS (
      SELECT np, sr / np AS m,
             (srr - sr * sr / np) / (np - 1.0) AS v
      FROM mom
    ), ab AS (
      SELECT CASE WHEN v > 0.0 AND m * (1.0 - m) / v - 1.0 > 0.0
                  THEN m * (m * (1.0 - m) / v - 1.0) END AS alpha,
             CASE WHEN v > 0.0 AND m * (1.0 - m) / v - 1.0 > 0.0
                  THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0) END AS beta
      FROM prior
    )
    SELECT l_partkey, n_lines, n_ret,
           round(CAST(n_ret AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
             AS raw_rate,
           round(CASE WHEN alpha IS NULL
                      THEN CAST(n_ret AS DOUBLE) / CAST(n_lines AS DOUBLE)
                      ELSE (CAST(n_ret AS DOUBLE) + alpha)
                           / (CAST(n_lines AS DOUBLE) + alpha + beta) END, 6)
             AS shrunk_rate
    FROM pr CROSS JOIN ab
    """,
)
def q_part_return_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-part return
    rates — the small-sample scoring fix every curation/ranking pipeline
    needs: a part with 1 return in 2 lines is NOT a 50%-return part, and
    where ``supplier_return_wilson`` widens the interval, EB moves the
    POINT ESTIMATE toward the corpus prior in proportion to the
    evidence: shrunk = (x+α)/(n+α+β), with (α, β) fit by method of
    moments from the part-level rate distribution itself. Topology is
    the ideal scale shape: one part-grain rollup, one single-row moment
    aggregate broadcast back, every shrunken rate a map-side expression
    (no windows, no sort). Rate moments truncate to DECIMAL(38,9); the
    degenerate prior (v ≥ m(1−m), no overdispersion to fit) falls back
    to the raw rate by declared rule."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        # when/otherwise(0), not a bare boolean cast: a NULL returnflag is
        # "not a return" (0) like the oracle's CASE ELSE 0 — the bare cast
        # would sum to NULL on an all-NULL group (sf_nulls sweep).
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).cast("long")
        ).alias("n_ret"),
    )
    r = F.col("n_ret").cast("double") / F.col("n_lines").cast("double")
    mom = pr.agg(
        F.count(F.lit(1)).cast("double").alias("np"),
        F.sum(r.cast("decimal(38,9)")).cast("double").alias("sr"),
        F.sum((r * r).cast("decimal(38,9)")).cast("double").alias("srr"),
    )
    m = F.col("sr") / F.col("np")
    # try_divide for v (np=1 ⇒ /0) and c (v=0 ⇒ /0): DuckDB's division
    # yields NULL there — the CASE guard then falls back to the raw rate —
    # while Spark's ANSI division throws before the guard can apply
    # (round-14 sf_unit registry sweep). np itself is ≥1, m stays `/`.
    v = F.try_divide(
        F.col("srr") - F.col("sr") * F.col("sr") / F.col("np"),
        F.col("np") - 1.0,
    )
    c = F.try_divide(m * (1.0 - m), v) - 1.0
    ok = (v > 0.0) & (c > 0.0)
    ab = mom.select(
        F.when(ok, m * c).alias("alpha"),
        F.when(ok, (1.0 - m) * c).alias("beta"),
    )
    shrunk = F.when(
        F.col("alpha").isNull(), r
    ).otherwise(
        (F.col("n_ret").cast("double") + F.col("alpha"))
        / (F.col("n_lines").cast("double") + F.col("alpha") + F.col("beta"))
    )
    return pr.crossJoin(F.broadcast(ab)).select(
        "l_partkey",
        "n_lines",
        "n_ret",
        F.round(r, 6).alias("raw_rate"),
        F.round(shrunk, 6).alias("shrunk_rate"),
    )


@query(
    "embedding_negative_pairs",
    oracle=f"""
    WITH h AS (
      SELECT vec_id, label, {_dbl('embedding')} AS emb,
             md5(CAST(vec_id AS VARCHAR)) AS hx
      FROM embeddings
    ), r AS (
      SELECT vec_id, label, emb, hx,
             substr(hx, 1, 1) AS bkt,
             lead(vec_id, 1) OVER w AS n1,
             lead(vec_id, 2) OVER w AS n2
      FROM h
      WINDOW w AS (PARTITION BY substr(hx, 1, 1) ORDER BY hx, vec_id)
    ), pairs AS (
      SELECT vec_id, label, emb, n1 AS neg_id FROM r WHERE n1 IS NOT NULL
      UNION ALL
      SELECT vec_id, label, emb, n2 FROM r WHERE n2 IS NOT NULL
    )
    SELECT p.vec_id, p.neg_id,
           round({_COS_SQL.format(a='p.emb', b='n.emb')}, 6) AS cos,
           CAST(CASE WHEN p.label = n.label THEN 1 ELSE 0 END AS INTEGER)
             AS same_label
    FROM pairs p JOIN h n ON n.vec_id = p.neg_id
    """,
)
def q_embedding_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training NEGATIVE sampling without randomness or a
    cross join: order vectors by a declared md5 hash ring inside 16 hash
    buckets and pair each anchor with its next two ring neighbors — a
    uniform-like pairing that is deterministic (restart- and
    oracle-verifiable), touches each row O(k) times, and never
    materializes the n² pair space (the classic negative-sampling
    scale trap). Emits each pair's cosine (sequential-fold dot — the
    ``ops/similarity`` exactness contract) and a same-label flag: the
    share of same-label negatives ≈ 1/#labels is the sanity number a
    contrastive pipeline monitors (too high ⇒ hard-negative mining is
    mislabeling). Shape: one window per bounded bucket, one keyed join
    to fetch negative vectors — shuffle on vec_id only."""
    from fxspark.ops.similarity import cosine

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    h = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.md5(F.col("vec_id").cast("string")).alias("hx"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.substring(F.col("hx"), 1, 1)).orderBy(
        "hx", "vec_id"
    )
    r = h.select(
        "vec_id",
        "label",
        "embedding",
        F.lead("vec_id", 1).over(w).alias("n1"),
        F.lead("vec_id", 2).over(w).alias("n2"),
    )
    pairs = (
        r.filter(F.col("n1").isNotNull())
        .select("vec_id", "label", "embedding", F.col("n1").alias("neg_id"))
        .unionByName(
            r.filter(F.col("n2").isNotNull()).select(
                "vec_id", "label", "embedding", F.col("n2").alias("neg_id")
            )
        )
    )
    neg = h.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("_nl"),
        F.col("embedding").alias("_ne"),
    )
    return pairs.join(neg, "neg_id").select(
        "vec_id",
        "neg_id",
        F.round(cosine(F.col("embedding"), F.col("_ne")), 6).alias("cos"),
        # when/otherwise(0): a NULL label is "not known same" (0) like the
        # oracle's CASE ELSE 0 — the bare cast would emit NULL (sf_nulls).
        F.when(F.col("label") == F.col("_nl"), 1).otherwise(0)
        .cast("int").alias("same_label"),
    )



@query(
    "promo_price_mannwhitney_binned",
    oracle="""
    WITH j AS (
      -- pairwise-complete, as in promo_price_mannwhitney: NULL values
      -- can't be binned, NULL treatment flags belong to neither sample
      SELECT l_returnflag, l_extendedprice AS v,
             CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS t
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_extendedprice IS NOT NULL AND p_type IS NOT NULL
    ), st AS (
      SELECT l_returnflag, min(v) AS lo,
             (max(v) - min(v)) / 1024 AS width
      FROM j GROUP BY 1 HAVING (max(v) - min(v)) / 1024 > 0
    ), b AS (
      SELECT j.l_returnflag,
             least(1023, CAST(floor((j.v - st.lo) / st.width) AS BIGINT))
               AS vb,
             j.t
      FROM j JOIN st USING (l_returnflag)
    ), g AS (
      SELECT l_returnflag, vb, count(*) AS cnt, sum(t) AS cnt_t
      FROM b GROUP BY 1, 2
    ), r AS (
      SELECT l_returnflag, cnt, cnt_t,
             2 * sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY vb
                                ROWS UNBOUNDED PRECEDING) - cnt + 1 AS avg2
      FROM g
    ), a AS (
      SELECT l_returnflag,
             CAST(sum(cnt_t) AS BIGINT) AS n_treat,
             CAST(sum(cnt - cnt_t) AS BIGINT) AS n_ctrl,
             sum(CAST(cnt_t AS DECIMAL(38,0)) * avg2) AS two_r1,
             sum(CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt) AS ties
      FROM r GROUP BY 1
    ), d AS (
      SELECT l_returnflag, n_treat, n_ctrl,
             CAST(n_treat AS DOUBLE) AS n1, CAST(n_ctrl AS DOUBLE) AS n2,
             CAST(n_treat AS DOUBLE) + CAST(n_ctrl AS DOUBLE) AS n,
             (CAST(two_r1 AS DOUBLE)
              - CAST(n_treat AS DOUBLE) * (CAST(n_treat AS DOUBLE) + 1.0))
             / 2.0 AS u1,
             CAST(ties AS DOUBLE) AS ties_d
      FROM a
    )
    SELECT l_returnflag, n_treat, n_ctrl,
           round(u1, 6) AS u_stat,
           round((u1 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0
                        * ((n + 1.0) - ties_d / (n * (n - 1.0)))), 6)
             AS z_stat,
           round(u1 / (n1 * n2), 6) AS auc
    FROM d
    """,
)
def q_promo_price_mannwhitney_binned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SCALE FORM of ``promo_price_mannwhitney`` (SCALE.md §23,
    executable): quantize the metric into 1024 declared equi-width bins
    from each key's own range (the PSI edge convention) and run the
    SAME tie-group rank machinery on bin indices — mid-rank-on-ties
    then makes the statistic the binned-CDF approximation of exact U.
    The point: the exact form's window grain is the number of DISTINCT
    VALUES (~n for a continuous metric); binning caps the grain at
    1024 per key BY CONSTRUCTION, so the plan carries no data-sized
    sort at any corpus size — the declared-approximation trade every
    100 TB rank statistic makes. On this fixture the binned AUC agrees
    with the exact to ~3 decimals (a property of near-uniform prices,
    not a guarantee)."""
    from fxspark.ops.stats import mann_whitney_u

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).filter(
        # pairwise-complete — see the oracle note (the bin stats would
        # otherwise ride on incidental NULL-skipping in min/max)
        F.col("l_extendedprice").isNotNull() & F.col("p_type").isNotNull()
    ).select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        (F.col("p_type") == "PROMO").alias("t"),
    )
    st = (
        j.groupBy("l_returnflag")
        .agg(
            F.min("v").alias("lo"),
            ((F.max("v") - F.min("v")) / 1024).alias("width"),
        )
        .filter(F.col("width") > 0)
    )
    b = j.join(F.broadcast(st), "l_returnflag").select(
        "l_returnflag",
        F.least(
            F.lit(1023),
            F.floor((F.col("v") - F.col("lo")) / F.col("width")).cast("long"),
        ).alias("vb"),
        "t",
    )
    u = mann_whitney_u(b, "l_returnflag", F.col("vb"), F.col("t"))
    return u.select(
        "l_returnflag",
        "n_treat",
        "n_ctrl",
        F.round("u_stat", 6).alias("u_stat"),
        F.round("z_stat", 6).alias("z_stat"),
        F.round("auc", 6).alias("auc"),
    )



def _layout_pruning_oracle() -> str:
    from fxspark.ops.layout import hilbert_sql_ctes, zvalue_sql

    # a row with ANY uncomputable layout key (NULL value OR NULL user_id)
    # cannot be laid out — excluded from the comparison on both engines
    base = (
        "(SELECT ((user_id % 65536) + 65536) % 65536 AS ha,"
        " ((CAST(floor(value * 100) AS BIGINT) % 65536) + 65536) % 65536"
        " AS hb FROM events"
        " WHERE value IS NOT NULL AND user_id IS NOT NULL)"
    )
    ctes, fin = hilbert_sql_ctes(base, "ha", "hb", bits=16)
    zv = zvalue_sql("ha", "hb")

    def binned(src_cte: str, tag: str, p: str) -> str:
        return f"""
    {p}st AS (SELECT count(*) AS c FROM {src_cte}),
    {p}r AS (SELECT idx, row_number() OVER (ORDER BY idx) AS rn
             FROM {src_cte}),
    {p}bnd AS (
      SELECT {p}r.idx AS bv
      FROM {p}r JOIN (SELECT i, (c * i + 63) // 64 AS k
                      FROM {p}st, (SELECT unnest(range(1, 64)) AS i)) t
        ON {p}r.rn = t.k
    ),
    {p}bin AS (
      SELECT '{tag}' AS layout,
             1 + (SELECT count(*) FROM {p}bnd WHERE bv < x.idx) AS bin,
             ha, hb
      FROM {src_cte} x
    )"""

    return f"""
    WITH {ctes},
    hidx AS (SELECT hd AS idx, ha, hb FROM {fin}),
    zidx AS (SELECT {zv} AS idx, ha, hb FROM {base} z),
    {binned('hidx', 'hilbert', 'h')},
    {binned('zidx', 'morton', 'z')},
    allb AS (SELECT * FROM hbin UNION ALL SELECT * FROM zbin),
    ext AS (
      SELECT layout, bin,
             max(ha) - min(ha) AS ea, max(hb) - min(hb) AS eb
      FROM allb GROUP BY 1, 2
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum((ea + 1) * (eb + 1)) AS BIGINT) AS box_cover,
           CAST(sum(ea) AS BIGINT) AS sum_extent_a,
           CAST(sum(eb) AS BIGINT) AS sum_extent_b
    FROM ext GROUP BY 1
    """


@query("events_layout_pruning_compare", oracle=_layout_pruning_oracle())
def q_events_layout_pruning_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Head-to-head pruning-quality metric for the two space-filling
    layouts on the SAME data and FILE MODEL: write-path files are
    equal-ROW-COUNT chunks of the index order (what
    ``repartitionByRange`` produces), modeled as 64 equal-count bins
    via ``ops/quantile.quantile_bins`` on each index — NOT equal-width
    top-bit slabs, which degenerate to identical partitions for both
    curves when the data occupies a corner of the key grid (this
    fixture: user ids fill ~2k of 65536). Per bin, the (min,max)
    bounding box both dimensions' footers would carry;
    ``box_cover = Σ(extent_a+1)·(extent_b+1)`` is proportional to
    expected files touched by uniform point predicates. MEASURED
    honestly: on this fixture the curves are near-parity (Hilbert
    1.03× Morton at sf0.01) — the data occupies a thin ~2k×65536 strip
    of the key grid, and on a strip both curves cut similar slabs;
    Hilbert's connectivity advantage (every file a connected region,
    no Z-jump boxes) materializes when the data fills both dimensions.
    That is exactly what this query is FOR: run it on your real key
    distribution before picking the OPTIMIZE-BY curve — the decision
    is data-shaped, not doctrine. Declared integer walks both sides;
    heavy work is two quantile binnings and one (layout, bin)
    rollup."""
    from fxspark.ops.layout import hilbert_layout_index, zvalue
    from fxspark.ops.quantile import quantile_bins

    events = load_table(spark, sf_dir, "events").filter(
        # see the oracle-builder note: both layout key inputs must exist
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    base = events.select(
        F.pmod(F.col("user_id"), F.lit(65536)).alias("ha"),
        F.pmod(
            F.floor(F.col("value") * 100).cast("long"), F.lit(65536)
        ).alias("hb"),
    )
    hidx = (
        hilbert_layout_index(base, F.col("ha"), F.col("hb"), "hd", 16)
        .select("ha", "hb", F.col("hd").alias("idx"))
        .localCheckpoint(eager=False)
    )
    zidx = base.select(
        "ha", "hb", zvalue(F.col("ha"), F.col("hb")).alias("idx")
    ).localCheckpoint(eager=False)
    hbin = quantile_bins(hidx, "idx", 64, "bin").select(
        F.lit("hilbert").alias("layout"), "bin", "ha", "hb"
    )
    zbin = quantile_bins(zidx, "idx", 64, "bin").select(
        F.lit("morton").alias("layout"), "bin", "ha", "hb"
    )
    ext = (
        hbin.unionByName(zbin)
        .groupBy("layout", "bin")
        .agg(
            (F.max("ha") - F.min("ha")).alias("ea"),
            (F.max("hb") - F.min("hb")).alias("eb"),
        )
    )
    return ext.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum((F.col("ea") + 1) * (F.col("eb") + 1)).alias("box_cover"),
        F.sum("ea").alias("sum_extent_a"),
        F.sum("eb").alias("sum_extent_b"),
    )



@query(
    "order_value_prf",
    oracle="""
    WITH ol AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               AS rev,
             CASE WHEN count(*) >= 4 THEN 1 ELSE 0 END AS y
      FROM lineitem GROUP BY 1
    ), c AS (
      SELECT CASE WHEN rev >= 300000.0 THEN 1 ELSE 0 END AS p, y FROM ol
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tn
      FROM c
    ), d AS (
      SELECT n, tp, fp, fn, tn,
             CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS prec,
             CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS rec,
             CAST(n AS DOUBLE) AS nd
      FROM m
    )
    SELECT n, tp, fp, fn, tn,
           round(prec, 6) AS precision_,
           round(rec, 6) AS recall_,
           round(2.0 * prec * rec / (prec + rec), 6) AS f1,
           round(CAST(tp + tn AS DOUBLE) / nd, 6) AS accuracy,
           round((CAST(tp + tn AS DOUBLE) / nd
                  - (CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                     + CAST(fn + tn AS DOUBLE) * CAST(fp + tn AS DOUBLE))
                    / (nd * nd))
                 / (1.0
                    - (CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                       + CAST(fn + tn AS DOUBLE) * CAST(fp + tn AS DOUBLE))
                      / (nd * nd)), 6) AS kappa
    FROM d
    """,
)
def q_order_value_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-point eval completing the score-eval family (AUC =
    ranking quality, calibration = probability quality, THIS = the
    deployed-threshold confusion report): threshold the line-revenue
    score at a declared 300k cut, compare against the true big-basket
    label, and emit the full confusion row with precision / recall /
    F1 / accuracy and Cohen's κ (chance-corrected agreement — the
    honest headline when classes are imbalanced; the lang-ID fixture
    was rejected for this family because its labels carry no text
    signal, so its κ is structurally ~0). One order-grain rollup, one
    single-row conditional agg — map-side everything; all ratios are
    doubles of exact integers in pinned operand order."""
    li = load_table(spark, sf_dir, "lineitem")
    ol = li.groupBy("l_orderkey").agg(
        exact_sum(F.col("l_extendedprice"), 4).alias("rev"),
        (F.count(F.lit(1)) >= 4).cast("int").alias("y"),
    )
    # when/otherwise(0), matching the oracle's CASE ELSE 0: an order whose
    # revenue is NULL (all-NULL prices) is unscored and predicts NEGATIVE —
    # the bare boolean cast would propagate NULL through the confusion
    # sums instead (sf_nulls sweep).
    p = F.when(F.col("rev") >= 300000.0, 1).otherwise(0)
    c = ol.select(p.alias("p"), "y")
    m = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("p") == 1) & (F.col("y") == 1)).cast("long")).alias(
            "tp"
        ),
        F.sum(((F.col("p") == 1) & (F.col("y") == 0)).cast("long")).alias(
            "fp"
        ),
        F.sum(((F.col("p") == 0) & (F.col("y") == 1)).cast("long")).alias(
            "fn"
        ),
        F.sum(((F.col("p") == 0) & (F.col("y") == 0)).cast("long")).alias(
            "tn"
        ),
    )
    tp, fp, fn, tn = (F.col(x).cast("double") for x in ("tp", "fp", "fn", "tn"))
    nd = F.col("n").cast("double")
    # try_divide throughout the ratio tree: a degenerate confusion table
    # (tp+fp = 0, prec+rec = 0, or pe = 1 under single-class input) makes
    # DuckDB's division yield NULL where Spark's ANSI division throws
    # (round-14 sf_unit registry sweep). nd ≥ 1, so accuracy stays `/`.
    prec = F.try_divide(tp, tp + fp)
    rec = F.try_divide(tp, tp + fn)
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (nd * nd)
    po = (tp + tn) / nd
    return m.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision_"),
        F.round(rec, 6).alias("recall_"),
        F.round(F.try_divide(2.0 * prec * rec, prec + rec), 6).alias("f1"),
        F.round(po, 6).alias("accuracy"),
        F.round(F.try_divide(po - pe, 1.0 - pe), 6).alias("kappa"),
    )



@query(
    "stream_topk_replay",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rk
      FROM events
    )
    SELECT event_type, CAST(rk AS INTEGER) AS rk, event_id, value
    FROM r WHERE rk <= 5
    """,
)
def q_stream_topk_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``streaming/stateful.stateful_topk``'s final
    emission: per event type the top-5 values with ``(value DESC,
    event_id ASC)`` ranks. The streaming operator's O(k) array state is
    a MONOTONE fold on the insert-only stream (the candidate set only
    grows), so its final emission over any prefix equals this rank
    closed form — parity across real micro-batches pinned by
    ``tests/test_streaming_multimodal.py::
    test_stateful_topk_across_batches_matches_batch_rank``. Retraction
    breaks the monotonicity; that regime is the batch operator
    ``ops/ivm.topk_retraction`` (``orders_topk_retraction``) with its
    bounded-buffer soundness rule — the two queries are the two halves
    of the maintained-leaderboard story."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.col("event_id")
    )
    return (
        events.select(
            "event_type",
            F.row_number().over(w).alias("rk"),
            "event_id",
            "value",
        )
        .filter(F.col("rk") <= 5)
        .select("event_type", "rk", "event_id", "value")
    )



@query(
    "order_value_isotonic_calibration",
    oracle="""
    WITH ol AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               AS rev,
             CASE WHEN count(*) >= 4 THEN 1 ELSE 0 END AS y
      FROM lineitem GROUP BY 1
    ), b AS (
      SELECT least(9, CAST(floor(least(1.0, rev / 600000.0) * 10.0)
                           AS INTEGER)) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS npos
      FROM ol GROUP BY 1
    ), iv AS (
      SELECT j.bin AS j, k.bin AS k,
             CAST(sum(l.npos) AS DOUBLE) / CAST(sum(l.n) AS DOUBLE) AS av
      FROM b j JOIN b k ON j.bin <= k.bin
      JOIN b l ON l.bin BETWEEN j.bin AND k.bin
      GROUP BY 1, 2
    ), mn AS (
      SELECT i.bin AS bin, iv.j, min(iv.av) AS m
      FROM b i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
      GROUP BY 1, 2
    ), iso AS (
      SELECT bin, max(m) AS iso FROM mn GROUP BY bin
    )
    SELECT b.bin, b.n AS n_orders,
           round(CAST(b.npos AS DOUBLE) / CAST(b.n AS DOUBLE), 6)
             AS frac_pos,
           round(iso.iso, 6) AS iso_calibrated
    FROM b JOIN iso USING (bin)
    """,
)
def q_order_value_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (monotone) calibration of the big-basket score — what a
    pipeline FITS after ``order_value_calibration`` diagnoses the raw
    reliability curve: the weighted least-squares monotone fit of
    per-bin positive rates, computed by the MINIMAX CLOSED FORM
    ``iso_i = max_{j≤i} min_{k≥i} avg(y, bins j..k)`` (Barlow's
    identity — the PAVA pool-adjacent-violators result WITHOUT the
    sequential algorithm, so no iteration and no order-dependent state
    anywhere). Everything past the order rollup runs on the 10-bin
    frame: the interval grid is 10×10, the (i, j, k) lattice ≤ 1000
    rows, all joins broadcast — bounded at ANY corpus size because the
    bin count is declared. Interval averages are ratios of exact
    integers; equal rationals round to identical doubles (IEEE division
    is correctly rounded), so the minimax is hash-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    ol = li.groupBy("l_orderkey").agg(
        exact_sum(F.col("l_extendedprice"), 4).alias("rev"),
        (F.count(F.lit(1)) >= 4).cast("int").alias("y"),
    )
    s = F.least(F.lit(1.0), F.col("rev") / 600000.0)
    b = (
        ol.select(
            F.least(F.lit(9), F.floor(s * 10.0).cast("int")).alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("npos"))
        .localCheckpoint(eager=False)
    )
    j = b.select(F.col("bin").alias("j"))
    k = b.select(F.col("bin").alias("k"))
    l = b.select(
        F.col("bin").alias("l"), F.col("n").alias("ln"), F.col("npos").alias("lp")
    )
    iv = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(l),
            (F.col("l") >= F.col("j")) & (F.col("l") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            (
                F.sum("lp").cast("double") / F.sum("ln").cast("double")
            ).alias("av")
        )
    )
    i = b.select(F.col("bin").alias("i"))
    mn = (
        i.join(
            F.broadcast(iv),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("av").alias("m"))
    )
    iso = mn.groupBy("i").agg(F.max("m").alias("iso"))
    return b.join(
        F.broadcast(iso), F.col("bin") == F.col("i")
    ).select(
        "bin",
        F.col("n").alias("n_orders"),
        F.round(
            F.col("npos").cast("double") / F.col("n").cast("double"), 6
        ).alias("frac_pos"),
        F.round(F.col("iso"), 6).alias("iso_calibrated"),
    )


@query(
    "part_copurchase_clustering_sampled",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
    ),
    e AS (
      SELECT u, v FROM e0
      WHERE ('0x' || substr(md5(CAST(u AS VARCHAR) || '|'
                                || CAST(v AS VARCHAR)), 1, 15))::BIGINT
            % 100 < 25
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pn AS (
      SELECT n, CAST(count(*) AS BIGINT) AS tri_sampled
      FROM (SELECT unnest([a, b, c]) AS n FROM tri) GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(tri_sampled) AS DOUBLE) / 3.0 * 64.0 AS est_total
      FROM pn
    )
    SELECT pn.n AS part, pn.tri_sampled,
           CAST(pn.tri_sampled AS DOUBLE) * 64.0 AS est_triangles,
           (SELECT est_total FROM tot) AS est_total_triangles
    FROM pn
    ORDER BY pn.tri_sampled DESC, pn.n ASC
    LIMIT 20
    """,
)
def q_part_copurchase_clustering_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOULION-sampled triangle estimation — the SCALE TWIN of
    ``part_copurchase_clustering``, which is exact but pays the
    Ω(Σ out-deg²) information floor of exact counting (~3.3 s solo /
    ~6.4 s in-sweep at sf0.1 after the r11 wedge-close fix (AQE join
    ladder; the close never sorts the wedge frame at runtime), on
    the dense synthetic graph). Sparsify: keep each canonical edge iff
    ``md5_60(u|v) % 100 < 25`` (p = 0.25, DECLARED randomness — the
    KMV/HLL discipline, so the estimate itself is oracle-hashable),
    count triangles on the sample with the same degree-oriented engine
    (``ops/graph.triangles_per_node`` over ``sample_edges_md5``), scale
    by 1/p³ = 64.

    ERROR BOUND (Tsourakakis et al., KDD'09): each triangle survives
    with probability p³, so ``tri_sampled/p³`` is an UNBIASED estimator
    of the true count, per node and in total; Var[T̂] ≤ T·(1/p³ − 1) +
    2·w·(1/p − 1) where w = pairs of triangles sharing an edge, i.e.
    relative error O(1/√(p³·T)). MEASURED against the exact twin: the
    GLOBAL estimate errs 1.4% at sf0.01 (T = 414k) and 1.2% at sf0.1
    (T = 1.88M) — the √T concentration doing its job — while PER-NODE
    estimates at this fixture's t_v ≈ 700 carry p³·t_v ≈ 11 surviving
    triangles (~30% noise): the top-20 is a HEAVY-HITTER SHORTLIST,
    not an exact ranking (exact top node 817 appears at sampled rank 3
    at sf0.01). That asymmetry is inherent to DOULION — per-node
    precision needs p³·t_v large, which 100 TB graphs (t_v in the
    millions on hubs) satisfy and toy fixtures don't. The wedge-join
    work falls by ~p² = 16× (r11 committed sweep: 3.02 s vs the exact
    form's 6.38 s under identical load — and the exact form itself got
    2.5× faster this round via the AQE-ladder wedge close and the
    sweep-residue cleanup, so the twin's RELATIVE margin narrowed while
    both absolute costs fell; the gap still widens with density). Emits
    the top-20 nodes by sampled count (deterministic (count DESC,
    node ASC) cut) plus the global estimate ``Σ tri_sampled / 3 · 64``
    broadcast onto every row."""
    from fxspark.ops.graph import sample_edges_md5, triangles_per_node

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")  # l_orderkey must not reach the checkpoint
    )
    # Sample BEFORE dedup: the keep/drop hash is deterministic per pair,
    # so filtering commutes with distinct — and the md5 is map-side CPU
    # over the ~1.2M raw co-occurrence rows, while a pre-sampling dedup
    # would SHUFFLE all ~1.2M rows to save that hashing. A/B in the bench
    # regime: 3.0 s this way vs 7.5 s dedup-first — the engine's internal
    # distinct then dedups only the ~300k sampled survivors (25% keep of
    # ~1.2M; the old "12M raw / 3M survivors" pair was the r11 10×
    # counting error, corrected round 13/15). Checkpoint the
    # sampled edges (the triangle engine consumes them from several
    # branches — deg, orientation, wedge close — and would re-run the
    # self-join+md5 lineage per branch) AND pn (both the global-estimate
    # branch and the top-20 branch consume it).
    sampled = sample_edges_md5(edges, 25).localCheckpoint(eager=False)
    pn = (
        triangles_per_node(sampled)
        .filter(F.col("triangles") > 0)
        .localCheckpoint(eager=False)
    )
    tot = pn.agg(
        (F.sum("triangles").cast("double") / F.lit(3.0) * F.lit(64.0))
        .alias("est_total_triangles")
    )
    return (
        pn.crossJoin(F.broadcast(tot))
        .orderBy(F.col("triangles").desc(), F.col("node").asc())
        .limit(20)
        .select(
            F.col("node").alias("part"),
            F.col("triangles").alias("tri_sampled"),
            (F.col("triangles").cast("double") * F.lit(64.0)).alias(
                "est_triangles"
            ),
            "est_total_triangles",
        )
    )


_PPR_ITER_PRUNED = """
    r{i} AS (
      SELECT n.node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.tele
               + 0.85 * COALESCE(
               CAST(sum(CAST(r.rank * e.share AS DECIMAL(38,18))) AS DOUBLE),
               0.0) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN (SELECT node, rank FROM r{prev} WHERE rank >= 1e-15) r
        ON r.node = e.src
      GROUP BY n.node, n.tele
    )"""


@query(
    "part_copurchase_ppr_topk",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges0 AS (
      SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey <> b.l_partkey
        WHERE ('0x' || substr(md5(
                 CAST(least(a.l_partkey, b.l_partkey) AS VARCHAR) || '|'
                 || CAST(greatest(a.l_partkey, b.l_partkey) AS VARCHAR)
               ), 1, 15))::BIGINT % 100 < 25
      ) GROUP BY 1, 2
    ), outw AS (
      SELECT src, sum(w) AS out_w FROM edges0 GROUP BY src
    ), edges AS (
      SELECT e.src, e.dst, e.w / o.out_w AS share
      FROM edges0 e JOIN outw o ON e.src = o.src
    ), nodes0 AS (
      SELECT src AS node FROM edges0 UNION SELECT dst FROM edges0
    ), srcs AS (
      SELECT node FROM nodes0
      WHERE node IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
    ), nodes AS (
      SELECT node,
             CASE WHEN node IN (SELECT node FROM srcs)
                  THEN 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM srcs)
                  ELSE CAST(0.0 AS DOUBLE) END AS tele
      FROM nodes0
    ), r0 AS (
      SELECT node, tele AS rank FROM nodes
    ),"""
    + ",".join(_PPR_ITER_PRUNED.format(i=i, prev=i - 1) for i in range(1, 6))
    + """
    -- empty-seed guard, same contract as part_copurchase_ppr
    SELECT node AS part, round(rank, 9) AS ppr FROM r5
    WHERE (SELECT count(*) FROM srcs) > 0
    ORDER BY round(rank, 9) DESC, node ASC
    LIMIT 50
    """,
)
def q_part_copurchase_ppr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k personalized PageRank over the DOULION-SPARSIFIED
    co-purchase graph — the SCALE TWIN of ``part_copurchase_ppr``,
    whose r11 cost note records ~9 s at sf0.1 on the shared
    canonical-pair edge build. Three declared approximations compose,
    each hash-verifiable because its randomness/threshold is declared:

    1. EDGE SPARSIFICATION (p = 0.25, canonical-pair md5 so both
       directions of an undirected edge share fate): the estimand
       becomes the exact PPR OF the sparsified graph — a standard
       spectral-perturbation approximation of the full-graph PPR (the
       sampled graph's normalized Laplacian concentrates around the
       original's for p·deg = Ω(log n); this fixture's mean degree 120
       · 0.25 = 30 is inside that regime), while the iteration frame
       shrinks 4×.
    2. FRONTIER PRUNING (``prune_eps`` = 1e-15, the synchronous cousin
       of Forward Push): only nodes with rank ≥ ε propagate, so the
       contribution join grows outward from the seed set instead of
       touching all E edges every iteration — the structural win on
       power-law graphs where most nodes never exceed ε. ERROR BOUND:
       pruning removes only non-negative mass, so every emitted rank is
       a LOWER bound short by ≤ ε·n·d/(1−d) ≈ 1.2e-10 at n = 20.6k —
       below the half-ulp of the 9-decimal output rounding, i.e. exact
       at the declared output scale.
    3. TOP-K EMISSION (k = 50, deterministic (rank DESC, node ASC)
       cut): the recsys consumer wants the head, not 20k tail ranks.

    The DuckDB oracle replays all three — sampled edge build, the
    ε-filtered unrolled iterations, the same cut — bit-for-bit.

    Cost note (sf0.1, interleaved 3-rep medians, round 11): 13.6 s with
    the round-10 sample-after-rollup directed build → 8.4 s on the
    shared ``_copurchase_weighted_edges`` helper, which samples BEFORE
    the rollup on canonical pairs (the commuting-filter argument and the
    full A/B table are in the helper's docstring). REGIME NOTE for the
    twin's margin: after the shared-build fix the exact form is 9.1 s,
    so at sf0.1 the sampled twin wins only ~8% — because on THIS fixture
    the irreducible pair enumeration (~1.2M rows, paid identically by
    both forms) dominates, and sampling can only shrink what comes after it
    (rollup shuffle 4×, iteration edge frame 4×). The twin's win scales
    with the part of the cost it actually attacks: more iterations,
    graphs whose edge aggregate is large relative to the raw pair
    stream (power-law real graphs, where co-occurrence multiplicity is
    low and the rollup shuffle dominates), or any deployment where the
    per-iteration edge frame is the memory/shuffle bottleneck — there
    the 4× edge-frame reduction is the whole game, as the DOULION
    clustering twin (wedge work ~p² = 16×) already demonstrates."""
    from fxspark.ops.graph import personalized_pagerank

    part = load_table(spark, sf_dir, "part")
    edges, nodes_in_graph = _copurchase_weighted_edges(
        spark, sf_dir, sample_pct=25
    )
    sources = (
        part.filter(F.col("p_brand") == "Brand#1")
        .select(F.col("p_partkey").alias("node"))
        .join(nodes_in_graph, "node", "left_semi")
    )
    ranks = personalized_pagerank(
        edges, sources, weight="w", n_iter=5, damping=0.85, prune_eps=1e-15,
        nodes=nodes_in_graph, spread_iterations=True,
    )
    return (
        ranks.orderBy(F.round("rank", 9).desc(), F.col("node").asc())
        .limit(50)
        .select(F.col("node").alias("part"), F.round("rank", 9).alias("ppr"))
    )


# ---------------------------------------------------------------------------
# Driver-gate rotation (data-driven).
#
# The correctness driver oracle-checks the FIRST 50 ``queries()`` entries in
# registration order (observed r01-r03: an identical 50-key window three
# rounds running while later registrations were never checked). Rotate the
# registry by the per-query LATEST fully-green round (rows+schema+hash)
# parsed from the committed CORRECTNESS_r*.json records: never-green
# queries first (new registrations must earn their first green row), then
# greens ASCENDING by latest-green round — so every query cycles through
# the driver's window every ~|registry|/50 rounds and its recorded
# evidence stays fresh instead of "was green once". A query whose only
# rows were ``no_oracle`` counts as never-green and re-enters the front
# once it gains an oracle. Must stay the LAST statement so every @query
# above is registered before reordering.
# ---------------------------------------------------------------------------


def _driver_latest_green() -> dict[str, int]:
    """Per-query LATEST round with a fully-green driver row, parsed from
    the round number in each ``CORRECTNESS_r{NN}.json`` filename. A query
    absent from the map has never been driver-green."""
    import glob
    import json as _json
    import re as _re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rec = _json.load(fh)
        except Exception:  # noqa: BLE001 — unreadable record ⇒ no evidence
            continue
        for name, row in rec.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _rotation_order(
    names: list[str], latest_green: dict[str, int]
) -> list[str]:
    """Registry order for the driver's fixed-size sample window:
    never-green queries first (new registrations must earn their first
    green row), then greens by ASCENDING latest-green round — so the
    least-recently-verified queries cycle through the window and every
    query's driver evidence is periodically refreshed rather than
    recorded once and left to go stale. Ties keep registration order
    (Python sort is stable)."""
    return sorted(
        names, key=lambda n: latest_green.get(n, -1)
    )


def _rotate_registry(ordered: list[str]) -> None:
    ordered = [n for n in ordered if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for reg in (QUERIES, ORACLE):
        snap = dict(reg)
        reg.clear()
        reg.update((n, snap[n]) for n in ordered if n in snap)


_rotate_registry(_rotation_order(list(QUERIES), _driver_latest_green()))
