"""Window-function surface (SURVEY §2.3) — YQL windows lowered in
yql/essentials/core/yql_opt_window.cpp (ROW_NUMBER..NTH_VALUE, ROWS/RANGE
frames, SessionWindow). All native ``Window`` specs — single shuffle per
partitionBy, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ytsaurus_spark.catalog import load_tables
from ytsaurus_spark.queries import register


# --- ROW_NUMBER top-k per group (the reference fuses this into group-by via
#     TopCollector_, cg_routines.cpp:1138; Spark: window + filter) ----------

@register(
    "win_topk_per_group",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        cat.read("orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- rank / dense_rank / percent_rank / ntile ------------------------------

@register(
    "win_ranks",
    """
    SELECT s_suppkey,
           CAST(rank()       OVER (ORDER BY s_acctbal DESC) AS INT) AS rnk,
           CAST(dense_rank() OVER (ORDER BY s_acctbal DESC) AS INT) AS drnk,
           round(percent_rank() OVER (ORDER BY s_acctbal DESC), 6)  AS prnk,
           round(cume_dist() OVER (ORDER BY s_acctbal DESC), 6)     AS cdist,
           CAST(ntile(4) OVER (ORDER BY s_acctbal DESC) AS INT)     AS quartile
    FROM supplier
    """,
)
def win_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    w = W.orderBy(F.col("s_acctbal").desc())
    return cat.read("supplier").select(
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --- LAG / LEAD / FIRST_VALUE / LAST_VALUE ---------------------------------

@register(
    "win_lag_lead",
    """
    SELECT user_id, event_id,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           first_value(event_id) OVER w AS first_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return cat.read("events").select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.first_value("event_id").over(w).alias("first_event"),
    )


# --- ROWS frame: running aggregate (yql_opt_window.cpp:428-515) ------------

@register(
    "win_running_sum",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return cat.read("events").select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 4
        ).alias("running_value"),
        F.round(F.avg("value").over(w.rowsBetween(-2, W.currentRow)), 4).alias("avg3"),
    )


# --- RANGE frame on a numeric key ------------------------------------------

@register(
    "win_range_frame",
    """
    SELECT p_partkey, p_size,
           CAST(count(*) OVER (
             ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ) AS BIGINT) AS n_near
    FROM part
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    w = W.orderBy("p_size").rangeBetween(-2, 2)
    return cat.read("part").select(
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_near"),
    )


# --- sessionization via window lag + gap cumsum (batch-side analog of
#     SessionWindow, yql_opt_window.cpp:2344; streaming variant lives in
#     queries/streaming_q.py) ----------------------------------------------

@register(
    "win_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, event_id,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    ev = cat.read("events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_sess)
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# --- NTH_VALUE / FIRST_VALUE with IGNORE NULLS (yql_opt_window.cpp:519) ----

@register(
    "win_nth_ignore_nulls",
    """
    WITH base AS (
      SELECT user_id, event_id,
             CASE WHEN value < 0.2 THEN NULL ELSE round(value, 4) END AS v
      FROM events
    )
    SELECT user_id, event_id,
           first_value(v IGNORE NULLS) OVER w AS first_nn,
           nth_value(v, 2 IGNORE NULLS) OVER w AS second_nn,
           last_value(v IGNORE NULLS) OVER w AS last_nn
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_nth_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_tables(spark, sf_dir)
    base = cat.read("events").select(
        "user_id",
        "event_id",
        F.when(F.col("value") < 0.2, None)
        .otherwise(F.round("value", 4))
        .alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return base.select(
        "user_id",
        "event_id",
        F.first_value("v", ignoreNulls=True).over(w).alias("first_nn"),
        F.nth_value("v", 2, ignoreNulls=True).over(w).alias("second_nn"),
        F.last_value("v", ignoreNulls=True).over(w).alias("last_nn"),
    )


@register(
    "win_time_range_frame",
    """
    SELECT user_id, CAST(event_id AS BIGINT) AS event_id,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 4) AS val_last_hour
    FROM events
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (trailing hour per user) — the
    event-time sliding-window aggregate as a WINDOW rather than a
    GROUP BY HOPPING. Spark's DataFrame rangeBetween takes numeric
    bounds, so the order key is epoch microseconds with a 1-hour span —
    a monotone bijection of the timestamp ordering, so frame membership
    (including tie peers, which RANGE frames always include) is
    identical to the oracle's INTERVAL form. Partitioned on user —
    never global."""
    cat = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return cat.read("events").select(
        "user_id",
        F.col("event_id").cast("long").alias("event_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("val_last_hour"),
    )


# --- time-series densification (gap fill onto a fixed grid) ----------------

@register(
    "ts_gap_fill",
    """
    WITH obs AS (
      SELECT user_id AS k, date_trunc('hour', ts) AS bucket, round(sum(value), 4) AS v
      FROM events WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
      GROUP BY user_id, date_trunc('hour', ts)
    ), spans AS (
      SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY k
    ), grid AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM spans
    )
    SELECT grid.k AS user_id,
           strftime(grid.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           coalesce(v, 0.0) AS value
    FROM grid LEFT JOIN obs ON grid.k = obs.k AND grid.bucket = obs.bucket
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly series densified onto the full hour grid of each
    user's own span, missing buckets as 0 (operators/timeseries.gap_fill).
    Reference analogue: windowed QL over ordered log tables leaves gaps;
    this is the densification pass. Per-key sequence explode — grid size
    bounded by each key's span, co-partitioned left join, no global ops."""
    from ytsaurus_spark.operators.timeseries import gap_fill

    cat = load_tables(spark, sf_dir)
    ev = (
        cat.read("events")
        .filter(F.col("ts") < "2024-01-04 00:00:00")
        .select("user_id", "ts", F.round("value", 10).alias("value"))
    )
    obs_rounded = gap_fill(ev, "user_id", "ts", "value", step="1 hour", fill=0.0)
    return obs_rounded.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.round("value", 4).alias("value"),
    )


@register(
    "ts_resample_ffill",
    """
    WITH obs AS (
      SELECT user_id AS k, date_trunc('hour', ts) AS bucket, round(sum(value), 4) AS v
      FROM events WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
      GROUP BY user_id, date_trunc('hour', ts)
    ), spans AS (
      SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY k
    ), grid AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM spans
    ), dense AS (
      SELECT grid.k, grid.bucket, v, v IS NULL AS was_gap
      FROM grid LEFT JOIN obs ON grid.k = obs.k AND grid.bucket = obs.bucket
    )
    SELECT k AS user_id,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY k ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           was_gap
    FROM dense
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to hourly grain with forward fill from the last observed
    bucket (operators/timeseries.resample): the fill window PARTITIONs on
    the key — each key sorts only its own buckets, never a global sort."""
    from ytsaurus_spark.operators.timeseries import resample

    cat = load_tables(spark, sf_dir)
    ev = (
        cat.read("events")
        .filter(F.col("ts") < "2024-01-04 00:00:00")
        .select("user_id", "ts", "value")
    )
    # round the per-bucket aggregate exactly like the oracle's obs CTE
    from ytsaurus_spark.operators.timeseries import gap_fill as _gf

    dense = _gf(ev, "user_id", "ts", "value", step="1 hour", fill=None)
    dense = dense.withColumn("value", F.round("value", 4))
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return dense.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.last("value", ignorenulls=True).over(w).alias("value"),
        F.col("value").isNull().alias("was_gap"),
    )


@register(
    "ts_ohlc_bars",
    """
    SELECT user_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           round(arg_min(value, ts), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(arg_max(value, ts), 4) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars per (user, hour) — the downsampling shape time-series
    stores run over ordered tables: open/close are argmin/argmax on the
    event time (min_by/max_by, one aggregate pass — never a window), so
    the whole bar computes in one partial-agg'd groupBy. Ties on ts
    cannot occur in the fixture (event times are unique per user)."""
    cat = load_tables(spark, sf_dir)
    ev = cat.read("events")
    return (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("b")
        )
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "ts"), 4).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "user_id",
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


@register(
    "ts_ewma",
    """
    WITH w AS (
      SELECT user_id, ts, value::DOUBLE AS value,
             list(value::DOUBLE) FILTER (WHERE value IS NOT NULL) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN 39 PRECEDING AND CURRENT ROW) AS trail
      FROM events
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value,
           CASE WHEN len(trail) = 0 THEN NULL
                ELSE list_reduce(trail, (acc, x) -> 0.25 * x + 0.75 * acc)
           END AS ewma
    FROM w
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha=0.25, 40-observation truncated lookback) over
    the event value stream (operators/timeseries.ewma). EWMA's sequential
    recurrence is re-expressed as a bounded-frame window collect plus ONE
    in-row sequential fold — one shuffle on user_id, frame size capped at
    the lookback, no driver-side series walk. alpha=0.25 is dyadic so the
    fold literals are exact in both engines; DuckDB's list_reduce seeds
    with the first (oldest) element exactly like the Spark fold's
    element_at(trail, 1) seed, so results are bit-identical."""
    from ytsaurus_spark.operators.timeseries import ewma

    cat = load_tables(spark, sf_dir)
    ev = cat.read("events").select("user_id", "ts", "value")
    out = ewma(ev, alpha=0.25, lookback=40, key_col="user_id",
               ts_col="ts", val_col="value")
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("value").cast("double").alias("value"),
        "ewma",
    )


@register(
    "ts_holt_trend",
    """
    WITH w AS (
      SELECT user_id, ts, value::DOUBLE AS value,
             list(value::DOUBLE) FILTER (WHERE value IS NOT NULL) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN 39 PRECEDING AND CURRENT ROW) AS trail
      FROM events
    ), st AS (
      SELECT user_id, ts, value,
             CASE WHEN len(trail) = 0 THEN NULL
             ELSE list_reduce(list_transform(trail, v -> [v, 0e0]),
               (acc, el) -> [
                 0.25e0 * el[1] + 0.75e0 * (acc[1] + acc[2]),
                 0.125e0 * (0.25e0 * el[1] + 0.75e0 * (acc[1] + acc[2])
                            - acc[1]) + 0.875e0 * acc[2]
               ]) END AS s
      FROM w
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value,
           s[1] AS level, s[2] AS trend, s[1] + s[2] AS forecast
    FROM st
    """,
)
def ts_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing (alpha=0.25, beta=0.125, 40-obs
    truncated lookback) per user over the event value stream
    (operators/timeseries.holt_linear). The coupled level+trend
    recurrence folds over the same bounded window trail as ts_ewma with
    a 2-element array accumulator — dyadic smoothing constants and a
    fixed fold order make level, trend, and the one-step forecast
    bit-identical cross-engine. One shuffle on user_id."""
    from ytsaurus_spark.operators.timeseries import holt_linear

    cat = load_tables(spark, sf_dir)
    ev = cat.read("events").select("user_id", "ts", "value")
    out = holt_linear(ev, alpha=0.25, beta=0.125, lookback=40,
                      key_col="user_id", ts_col="ts", val_col="value")
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("value").cast("double").alias("value"),
        "level", "trend", "forecast",
    )
