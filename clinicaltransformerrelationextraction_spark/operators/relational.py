"""Relational operator coverage (SURVEY.md §2.2-2.7) as DataFrame programs
over the TPC-H-ish testdata tables.

Each function maps to reference operators (IDs from SURVEY.md §2) and has a
matching ANSI-SQL oracle in plans/oracle_relational.py. Cross-engine float
discipline: monetary aggregates are summed as decimal(18,2) (exact,
order-independent); ratios are a single double division of exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/{name}.parquet")


def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape — grouped aggregation with partial (map-side) combine;
    the reference's label-frequency aggregation A1 generalized."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal sums, then ONE deterministic double conversion —
            # avoids engine-specific result-decimal precision in the schema
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias(
                "sum_qty"
            ),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias(
                "sum_base_price"
            ),
            F.sum(
                (F.col("l_extendedprice").cast(DEC)
                 * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)))
                .cast("decimal(30,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty",
            F.round(F.col("sum_qty") / F.col("count_order"), 6),
        )
    )


def q_label_weights(spark: SparkSession, sf: str) -> DataFrame:
    """A1 — label frequency -> sample weight w = 1 - freq/total
    (src/data_utils.py:210-223)."""
    li = _t(spark, sf, "lineitem")
    counts = li.groupBy(F.col("l_returnflag").alias("label")).agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy()
    return counts.select(
        "label",
        "n",
        F.round(1 - F.col("n") / F.sum("n").over(w), 6).alias("weight"),
    )


def q_distinct_labels(spark: SparkSession, sf: str) -> DataFrame:
    """A2 — distinct label vocabulary (src/data_utils.py:225-253)."""
    return (
        _t(spark, sf, "orders")
        .select(F.col("o_orderpriority").alias("label"))
        .distinct()
    )


def q_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    """W3 — global top-k with deterministic tiebreak."""
    return (
        _t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_first_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """W1 — per-partition sequential numbering (post_processing.py:49-63
    R-renumbering pattern): first 3 orders per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_fold_split(spark: SparkSession, sf: str) -> DataFrame:
    """W6 — deterministic 5-fold split (preprocessing.ipynb to_5_cv: seeded
    shuffle + array_split). Fold = md5-of-key mod 5: a seeded pseudo-random
    assignment that is (a) engine-identical (md5 is the only cross-engine
    hash) and (b) embarrassingly parallel — no global single-task ntile
    window, the only shuffle is the final tiny groupBy. At 10^12 rows a
    global Window.orderBy ntile funnels the corpus through ONE task; this
    form has no ordering step at all."""
    fold = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2),
            16, 10,
        ).cast("int") % 5 + 1
    )
    return (
        _t(spark, sf, "orders")
        .withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """F5/E3 — anti join (gold-pair exclusion pattern): customers with no
    URGENT-priority order. The unfiltered variant ("no orders at all") is
    EMPTY on this synthetic data at every sf ≤ 0.01 — a vacuous green the
    r4 nonzero parity guard caught; the priority filter keeps the plan
    shape (filter pushed into the anti-join build side) while selecting
    real rows (18 at sf0.001, 203 at sf0.01)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_customers_with_building_orders(spark: SparkSession, sf: str) -> DataFrame:
    """F3 — semi join (valid-combination predicate pattern)."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


def q_revenue_by_region(spark: SparkSession, sf: str) -> DataFrame:
    """J4 — broadcast dimension chain: orders⋈customer⋈nation⋈region.
    nation/region are broadcast (tiny dims); customer joins shuffle."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias(
                "revenue"
            ),
            F.count("*").alias("n_orders"),
        )
    )


def q_events_by_value_band(spark: SparkSession, sf: str) -> DataFrame:
    """J2 — range/interval join: events against a small bands table
    (entity-to-sentence alignment pattern)."""
    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 200.0),
         (3, 200.0, 1e9)],
        ["band_id", "lo", "hi"],
    )
    e = _t(spark, sf, "events")
    return (
        e.join(
            F.broadcast(bands),
            (e.value >= bands.lo) & (e.value < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias(
                "value_sum"
            ),
        )
    )


def q_custkey_setops(spark: SparkSession, sf: str) -> DataFrame:
    """E1/E2 — intersect + except over two derived key sets
    (gold∩system file pairing, brat_eval.py:448-457)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    with_orders = o.select(F.col("o_custkey").alias("k")).distinct()
    positive_bal = c.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("k")
    )
    both = with_orders.intersect(positive_bal).select(
        F.lit("both").alias("tag"), "k"
    )
    only_orders = with_orders.exceptAll(positive_bal).select(
        F.lit("only_orders").alias("tag"), "k"
    )
    return both.unionByName(only_orders)


def q_union_priorities(spark: SparkSession, sf: str) -> DataFrame:
    """E4/E5 — union of tagged subsets (pos+neg sample merge pattern)."""
    o = _t(spark, sf, "orders")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src"), "o_orderkey"
    )
    lo = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.lit("low").alias("src"), "o_orderkey"
    )
    return hi.unionByName(lo)


def q_event_type_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """A3 — confusion-matrix-style pivot: user bucket × event type counts
    (measure_prf groupBy-pivot restatement). Explicit conditional sums keep
    the SQL oracle identical."""
    e = _t(spark, sf, "events")
    b = e.withColumn("bucket", (F.col("user_id") % 5).cast("int"))
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(
            f"n_{t}"
        )
        for t in ["click", "view", "purchase", "signup", "error"]
    ]
    return b.groupBy("bucket").agg(*aggs)


def q_lineitem_cube(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping-sets coverage: cube over (returnflag, linestatus) with
    ALL placeholders (free extra beyond the reference, SURVEY.md §2.4)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias(
                "sum_qty"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def q_events_by_hour(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time functions: hour-of-day histogram + per-day distinct users."""
    e = _t(spark, sf, "events")
    return (
        e.withColumn("hour", F.hour("ts"))
        .groupBy("hour")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_part_strings(spark: SparkSession, sf: str) -> DataFrame:
    """C1/C5/C7 — string function coverage: case, substring, split,
    concat, length, regexp extraction."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("::", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", "([0-9]+)", 1).alias("name_num"),
        F.size(F.split("p_type", " ")).alias("type_words"),
    )


def q_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured extraction from the events props JSON column."""
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select((k % 10).alias("k_mod"))
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"))
    )


def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + filter + grouped agg + top-k by
    revenue — the classic join-reorder/pushdown plan-quality probe."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01")
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast(DEC)
                 * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)))
                .cast("decimal(30,4)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join through two dimension chains with
    broadcast dims, grouped by region-level key."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        # supplier scales with SF — no broadcast hint; AQE picks the
        # strategy from runtime stats. nation is a fixed 25-row dim.
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("o_orderdate") < F.lit("1998-01-01"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast(DEC)
                 * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)))
                .cast("decimal(30,4)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


def q_big_spenders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: agg subquery as a semi-filter (HAVING over a
    grouped sum), then join back for detail."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    big = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("total"))
        .filter(F.col("total") > 1_500_000)
    )
    return (
        big.join(c, big.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name",
            F.col("total").cast("double").alias("total_spent"),
        )
    )


def q_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe two-phase aggregation (north rule): salt the hot key space,
    partial-aggregate per (key, salt), then merge. Result is identical to a
    plain groupBy — the oracle IS the plain groupBy."""
    li = _t(spark, sf, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.hash("l_partkey", "l_suppkey"), F.lit(8))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("ps"),
        F.count("*").alias("pn"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("ps").cast("double").alias("sum_qty"),
        F.sum("pn").alias("n"),
    )


def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape — the pure scan-filter-aggregate query: every
    predicate pushes down to the parquet scan (no shuffle at all before
    the single-row partial agg), the canonical 'filters reach the reader'
    check. Revenue in exact decimal, ONE double conversion at the end.
    Date window sits inside the synthetic data range (shipdates span
    1995-01..2001-11) so the aggregate covers real rows — the r3 verdict
    flagged the classic 1994 window as a 0-row no-op on this corpus."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast(DEC)
                 * F.col("l_discount").cast(DEC)).cast("decimal(30,4)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: HAVING-filtered
    aggregation over the fact table first (map-side partial combine, one
    shuffle on l_orderkey), THEN joins — the selective agg shrinks the
    probe side to the handful of big orders before any join happens, so
    orders/customer join against a tiny table (AQE picks broadcast at
    runtime from the post-agg stats; never pre-broadcast — the qualifying
    set grows with the corpus). Exact-decimal quantity sum; order date as
    epoch micros (cross-engine integer compare); top-100 with a full
    deterministic tiebreak (totalprice desc, date, orderkey) so the LIMIT
    boundary is engine-independent."""
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty_dec")
        )
        .filter(F.col("sum_qty_dec") > 300)
    )
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            .alias("o_date_us"),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_date_us", "o_orderkey")
        .limit(100)
    )


def q_events_asof(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF JOIN (backward, inclusive): for every click event, the most
    recent view by the same user at or before the click. Spark has no
    native as-of join; the scalable restatement is union-tag + ONE window
    pass with last(ignorenulls) carry-forward — a single shuffle on
    user_id, no range-join pair explosion, no per-row Python (the plan you
    want at 10^12 events; pandas merge_asof would be the non-distributed
    trap). Ties at the same timestamp: the view sorts first (tag 0), so an
    exactly-simultaneous view matches; event_id breaks residual ties
    deterministically. Timestamps surface as epoch micros (bigint) so the
    cross-engine hash compares exact integers."""
    ev = _t(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.col("event_id").alias("v_id"),
        F.lit(None).cast("long").alias("c_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("v_id"),
        F.col("event_id").alias("c_id"),
    )
    u = views.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", F.coalesce("v_id", "c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    carried = u.select(
        "user_id", "c_id", us.alias("ev_us"),
        F.last("v_id", ignorenulls=True).over(w).alias("asof_view_id"),
        F.last(
            F.when(F.col("v_id").isNotNull(), us), ignorenulls=True
        ).over(w).alias("asof_view_us"),
    )
    return carried.filter(F.col("c_id").isNotNull()).select(
        F.col("c_id").alias("click_event_id"),
        "user_id",
        F.col("ev_us").alias("click_us"),
        "asof_view_id",
        (F.col("ev_us") - F.col("asof_view_us")).alias("lag_us"),
    )


def q_events_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style time rollup (the TimescaleDB continuous-aggregate
    shape): ONE pass over events producing the full granularity hierarchy
    event_type -> day -> hour via ROLLUP — Catalyst expands the grouping
    sets and combines map-side, so the three aggregate levels cost one
    shuffle, not three queries. Value sums are quantized to integer micros
    before summing (never sum doubles across rows); time buckets surface
    as epoch micros so every compared column is an exact integer."""
    ev = _t(spark, sf, "events")
    ts = F.col("ts").cast("timestamp")
    base = ev.select(
        "event_type",
        F.unix_micros(F.date_trunc("day", ts)).alias("day_us"),
        F.unix_micros(F.date_trunc("hour", ts)).alias("hour_us"),
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias(
            "value_micro"
        ),
    )
    return (
        base.rollup("event_type", "day_us", "hour_us")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_events"),
            F.sum("value_micro").alias("value_micro_sum"),
        )
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def q_events_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization as a BATCH query — the oracle-checked twin
    of the stateful streaming sessionizer (streaming/sessionize.py): a new
    session starts when a user's inactivity exceeds SESSION_GAP_US. The
    classic two-window formulation (lag -> boundary flag -> running sum)
    needs only ONE shuffle on user_id; both window passes share the same
    (user_id, ts) sort. All compared columns are exact integers."""
    ev = _t(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select(
        "user_id", us.alias("ev_us"), "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ev_us", "event_id")
    flagged = base.withColumn(
        "new_session",
        F.when(
            F.col("ev_us") - F.lag("ev_us").over(w) > SESSION_GAP_US, 1
        ).otherwise(0),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn(
        "session_n", F.sum("new_session").over(wrun)
    )
    return sessions.groupBy("user_id", "session_n").agg(
        F.count("*").alias("n_events"),
        F.min("ev_us").alias("start_us"),
        F.max("ev_us").alias("end_us"),
        (F.max("ev_us") - F.min("ev_us")).alias("duration_us"),
    )


def q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item revenue per customer: selective
    date + returnflag filters pushed to both scans, customer⋈orders⋈
    lineitem with the 25-row nation dim broadcast, exact-decimal revenue,
    top-20 via orderBy+limit (TakeOrderedAndProject: per-partition heads,
    no single-partition sort). Date window sits inside the synthetic data
    range (orders span 1995-01..2001-08) so the joins touch real rows."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf, "nation")
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("decimal(30,4)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


FUNNEL_WINDOW_US = 30 * 60 * 1_000_000  # view->click attribution window


def q_events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """View->click conversion funnel per day: a click CONVERTS when the
    same user viewed at most 30 minutes earlier (inclusive). Composed
    from the as-of join (union-tag + ONE window pass — no range-explosion
    pair join) plus a per-day rollup; the conversion rate is an exact
    integer micro-ratio, never a float division summed across rows."""
    asof = q_events_asof(spark, sf)
    clicks = asof.select(
        F.unix_micros(
            F.date_trunc(
                "day", F.timestamp_micros(F.col("click_us"))
            )
        ).alias("day_us"),
        F.when(
            F.col("asof_view_id").isNotNull()
            & (F.col("lag_us") <= FUNNEL_WINDOW_US),
            1,
        ).otherwise(0).alias("converted"),
    )
    cday = clicks.groupBy("day_us").agg(
        F.count("*").alias("n_clicks"),
        F.sum("converted").alias("n_converted"),
    )
    ev = _t(spark, sf, "events")
    vday = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(
            F.unix_micros(
                F.date_trunc("day", F.col("ts").cast("timestamp"))
            ).alias("day_us")
        )
        .agg(F.count("*").alias("n_views"))
    )
    return cday.join(vday, "day_us", "full").select(
        "day_us",
        F.coalesce("n_views", F.lit(0)).alias("n_views"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_converted", F.lit(0)).alias("n_converted"),
        F.when(
            F.coalesce("n_clicks", F.lit(0)) > 0,
            F.expr("(coalesce(n_converted, 0) * 1000000)"
                   " div coalesce(n_clicks, 1)"),
        ).otherwise(F.lit(0)).cast("long").alias("conv_rate_micro"),
    )


def q_events_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact P50/P90/P99 of event value per type, percentile_disc-style:
    values quantized to integer micros, ranked per type with a
    deterministic tiebreak, and the element at rank ceil(p*n/100)
    selected — pure integer arithmetic, so the result is an actual data
    value and hash-exact cross-engine (double interpolation never is).
    The per-group sort is the exact-percentile cost; at 10^12 rows the
    approximate path is percentile_approx (a mergeable sketch, same
    shape as KMV/HLL here), with THIS query as its accuracy oracle on
    samples."""
    ev = _t(spark, sf, "events")
    vm = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    base = ev.select("event_type", vm.alias("vm"), "event_id")
    w = Window.partitionBy("event_type").orderBy("vm", "event_id")
    wall = Window.partitionBy("event_type")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wall)
    )

    def pick(p: int):
        target = F.expr(f"(n * {p} + 99) div 100")
        return F.max(
            F.when(F.col("rn") == target, F.col("vm"))
        ).alias(f"p{p}_micro")

    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n"), pick(50), pick(90), pick(99)
    )


DAY_US = 86_400_000_000


def q_events_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by their first active day, with
    day-1 and day-7 return counts — the classic training-corpus /
    product-analytics cohort table. Shape: one distinct pass to per-user
    active days, a min-aggregate for the cohort day, ONE join back to
    the day set, then a conditional per-user aggregation that flags the
    day-1/day-7 returns in the same pass — both aggregations reuse the
    join's user_id partitioning, so the whole query costs two shuffles
    (never a range join; every comparison is an exact epoch-micros day).
    Retention ratios surface as exact integer micro-rates."""
    ev = _t(spark, sf, "events")
    days = ev.select(
        "user_id",
        F.unix_micros(
            F.date_trunc("day", F.col("ts").cast("timestamp"))
        ).alias("day_us"),
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day_us").alias("cohort_us"))
    per_user = (
        days.join(first, "user_id")
        .groupBy("user_id", "cohort_us")
        .agg(
            F.max(
                F.when(
                    F.col("day_us") == F.col("cohort_us") + F.lit(DAY_US), 1
                ).otherwise(0)
            ).alias("r1"),
            F.max(
                F.when(
                    F.col("day_us")
                    == F.col("cohort_us") + F.lit(7 * DAY_US),
                    1,
                ).otherwise(0)
            ).alias("r7"),
        )
    )
    return per_user.groupBy("cohort_us").agg(
        F.count("*").alias("n_users"),
        F.sum("r1").alias("retained_d1"),
        F.sum("r7").alias("retained_d7"),
    ).select(
        "cohort_us", "n_users", "retained_d1", "retained_d7",
        F.expr("(retained_d1 * 1000000) div n_users").alias("rate_d1_micro"),
        F.expr("(retained_d7 * 1000000) div n_users").alias("rate_d7_micro"),
    )
