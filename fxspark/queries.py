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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fxspark.ops.asof import asof_join, nth_before_cutoff
from fxspark.ops.change import pct_change_label
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
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key (Q5, ``Fx_1min.py:159-173``) as a max_by aggregate."""
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
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins upsert semantics (S5, ``Fx_1min.py:106-109``) as a
    keyed dedup on (user_id, event_type)."""
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
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
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
    sess = sessionize(events, "user_id", "ts", F.expr("INTERVAL 30 MINUTES"))
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
    """,
)
def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (hypertable-style day×type cube slice)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", time_bucket(F.col("ts"), "day"))
        .rollup("day", "event_type")
        .agg(
            F.grouping("event_type").alias("g_type"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .select("day", "event_type", "g_type", "n_events", "total_value")
    )


@query(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.event_id AS click_event_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
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
           round(least(length(text)/500.0, 1.0)
                 + coalesce(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t)))
                            / CAST(nullif(len(toks), 0) AS DOUBLE), 0.0)
                 - coalesce(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                            / CAST(nullif(length(text), 0) AS DOUBLE), 0.0), 4) AS quality
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
    (ops/dedup.jaccard_pairs) is its small-N twin and test oracle."""
    from fxspark.ops.dedup import jaccard_pairs_prefix

    docs = spread(load_table(spark, sf_dir, "documents"))
    return jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.8)


@query(
    "doc_sample_10pct",
    oracle="""
    SELECT doc_id, lang,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(lower(trim(text))[i]) AS BIGINT)
                for i in range(1, len(lower(trim(text))) + 1)]),
             (acc, c) -> (acc * 131 + c) % 1000000007) % 100 AS bucket
    FROM documents
    WHERE list_reduce(
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
    min-id per cluster, drop the rest."""
    from fxspark.ops.dedup import dup_clusters, jaccard_pairs_prefix

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.8)
    return dup_clusters(pairs)


@query("minhash_lsh_pairs")  # rows-only: xxhash64 has no DuckDB equivalent
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-Jaccard-verified — the
    100 TB-scale path for doc_jaccard_pairs (tests assert both agree)."""
    from fxspark.ops.dedup import minhash_lsh_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    return minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=64, bands=16,
                             threshold=0.8)


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
    queries, window rank per query)."""
    from fxspark.ops.similarity import knn_join

    emb = spread(load_table(spark, sf_dir, "embeddings"))
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
      CASE WHEN greatest(en, de, fr, es) = 0 THEN 'unknown'
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
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(lower(trim(text))[i]) AS BIGINT)
                for i in range(1, len(lower(trim(text))) + 1)]),
             (acc, c) -> (acc * 131 + c) % 1000000007) AS fp
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


@query("simhash_near_dup")  # rows-only: simhash folds xxhash64 (no DuckDB twin)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (bigram shingles, hamming ≤ 6) via pigeonhole
    byte-bands — the cheapest dedup tier: 8 bytes of state per doc, no
    all-pairs join. At sf0.01 this recovers 23 of the 25 exact
    jaccard≥0.8 pairs (92% recall) from a 125k-pair space; tests assert
    hamming tracks token-set similarity."""
    from fxspark.ops.dedup import simhash_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    return simhash_pairs(docs, "doc_id", "text", n=2, max_hamming=6)


@query(
    "order_pct_change",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_totalprice,
           round((o_totalprice - lag(o_totalprice) OVER w)
                 / lag(o_totalprice) OVER w * 100, 4) AS pct_change
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_order_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-order %-change per customer — the reference's pct-change
    semantics (ops/change.pct_change, `Fx_1min.py:208`) generalized onto the
    orders table via lag(), per the FIXTURES.md operator mapping."""
    from pyspark.sql import Window

    from fxspark.ops.change import pct_change

    orders = load_table(spark, sf_dir, "orders")
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
    """,
)
def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (grouping-sets family — SURVEY.md
    §2.5 gap filled natively): per (flag, status), per flag, and grand total
    in ONE pass — partial aggregation handles all levels map-side, vs 3
    separate scans. grp_id disambiguates subtotal rows from data NULLs."""
    li = load_table(spark, sf_dir, "lineitem")
    # grp_id is declared as g(flag) + 2*g(status) explicitly on both sides —
    # engines disagree on grouping_id() bit order, so never rely on it.
    return li.rollup("l_returnflag", "l_linestatus").agg(
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.grouping("l_returnflag") + F.grouping("l_linestatus") * 2)
        .cast("long")
        .alias("grp_id"),
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
    """,
)
def q_segment_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^n grouping sets in one pass — completes the grouping-sets
    family next to ROLLUP/PIVOT): revenue by segment × priority, each margin,
    and the grand total. The segment column rides in on a broadcast dim join
    before the single cube aggregation; grp_id pinned explicitly on both
    sides (engines disagree on grouping_id() bit order)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    return joined.cube("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("revenue"),
        (F.grouping("c_mktsegment") + F.grouping("o_orderpriority") * 2)
        .cast("long")
        .alias("grp_id"),
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
                   WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'),
         late  AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'),
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
        F.col("o_orderdate") < F.lit("1994-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    late = orders.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
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


def _doc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fxspark.multimodal import to_media_frame

    docs = spread(load_table(spark, sf_dir, "documents"))
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
    SELECT doc_id AS media_id, 'image' AS media_type,
           CASE WHEN doc_id % 2 = 0 THEN octet_length(encode(text)) + 24
                ELSE octet_length(encode(text)) END AS n_bytes,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'unknown' END AS format,
           CASE WHEN doc_id % 2 = 0 THEN 64 ELSE -1 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN 48 ELSE -1 END AS height
    FROM documents
    """,
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata decode over mapInPandas (multimodal.py): binary
    payloads (synthetic PNG headers on even docs) → format/dimensions.
    The oracle restates the DECLARED sniffing semantics — the differential
    checks the whole Arrow-batched plumbing end to end."""
    from fxspark.multimodal import decode_image_meta

    return decode_image_meta(_doc_media(spark, sf_dir))


@query("media_features")  # rows-only: stub feature extractor (array output)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction (STUB encoder, real plumbing): Arrow
    batches in, fixed-dim array<float> out — the contract a real image/audio
    model drops into (multimodal.extract_features)."""
    from fxspark.multimodal import extract_features

    return extract_features(_doc_media(spark, sf_dir))


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


@query("embedding_ivf_topk")  # rows-only: k-means codebook has no SQL twin
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for the vec_id=0 query: k-means coarse quantizer,
    probe the 4 nearest of 16 cells (ops/similarity.ivf_topk) — the
    data-adaptive ANN tier next to the hyperplane-LSH one; tests pin it to
    exact brute force when every cell is probed."""
    from fxspark.ops.similarity import ivf_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
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
