"""Event-analytics curation queries (split from catalog/curation.py).

Round-7 mechanical move (file-size hygiene, same registry, names and
oracles unchanged): the single-query e_* sections — sessionization,
resampling, trailing/interval frames, anomaly and drift baselines,
watermark audit, CUPED/SRM experiment hygiene, cohort LTV, Markov
transitions, inter-arrival fits, conversion-path mining.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..tables import load_table
from . import register
from .curation import _TS_SPARK, _TS_SQL

# -------------------------------------------------------- interval join
@register(
    "e_interval_join",
    oracle=f"""
SELECT c.event_id, c.user_id,
       CAST(COUNT(v.event_id) AS BIGINT) AS n_prior_views,
       strftime(MAX(v.ts), '{_TS_SQL}') AS last_view
FROM events c
LEFT JOIN events v
  ON v.user_id = c.user_id
 AND v.event_type = 'view'
 AND v.ts <= c.ts
 AND v.ts >= c.ts - INTERVAL 5 MINUTE
WHERE c.event_type = 'click'
GROUP BY c.event_id, c.user_id
ORDER BY c.event_id
""",
    doc="time-bounded interval join (attribution): each click is joined "
    "to the same user's views in the preceding 5 minutes — the batch "
    "twin of a Structured Streaming stream-stream join with a time-range "
    "condition (streaming/ops.py interval_join_stream carries the same "
    "predicate after withWatermark on both sides).  Scale: equi-join on "
    "user_id carries the shuffle; the range predicate is a post-join "
    "filter, so no all-pairs blowup beyond a user's own events.",
)
def e_ijoin(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = ev.where(F.col("event_type") == "click").alias("c")
    v = ev.where(F.col("event_type") == "view").alias("v")
    joined = c.join(
        v,
        (F.col("v.user_id") == F.col("c.user_id"))
        & (F.col("v.ts") <= F.col("c.ts"))
        & (F.col("v.ts") >= F.col("c.ts") - F.expr("INTERVAL 5 MINUTES")),
        "left",
    )
    return (
        joined.groupBy(F.col("c.event_id").alias("event_id"), F.col("c.user_id").alias("user_id"))
        .agg(
            F.count(F.col("v.event_id")).alias("n_prior_views"),
            F.date_format(F.max(F.col("v.ts")), _TS_SPARK).alias("last_view"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------------------ gap sessionization
@register(
    "e_sessionize_gap",
    oracle=f"""
WITH o AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
s AS (
  SELECT user_id, ts, value,
         SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM o)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       strftime(MIN(ts), '{_TS_SQL}') AS session_start,
       strftime(MAX(ts), '{_TS_SQL}') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
FROM s
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""",
    doc="gap-based sessionization in batch: a session breaks when a user "
    "is idle > 30 minutes; the classic lag-flag-cumsum construction "
    "(two windows over ONE user_id partition sort) assigns session ids, "
    "then a grouped rollup summarizes each session.  Gaps compare exact "
    "integer microseconds so both engines draw identical boundaries.  "
    "This is the batch twin of sessionize_with_state "
    "(streaming/ops.py) and the F.session_window variant "
    "(e_session_window) — three routes to the same semantics.  Scale: "
    "one shuffle on user_id; both windows and the final groupBy reuse "
    "that partitioning.",
)
def e_sess_gap(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # ts is TIMESTAMP_NTZ: subtraction yields an exact day-time interval on
    # both engines, so the 30-minute boundary is bit-identical.
    gap_breaks = F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(prev_ts.isNull() | gap_breaks, 1).otherwise(0).alias("new_s"),
    ).select(
        "user_id", "ts", "value", F.sum("new_s").over(run).alias("session_idx")
    )
    return (
        flagged.groupBy("user_id", F.col("session_idx").cast("bigint").alias("session_idx"))
        .agg(
            F.date_format(F.min("ts"), _TS_SPARK).alias("session_start"),
            F.date_format(F.max("ts"), _TS_SPARK).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total_value"),
        )
        .orderBy("user_id", "session_idx")
    )


# --------------------------------------------------- robust anomaly (MAD)
@register(
    "e_anomaly_mad",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type)
SELECT e.event_id, e.event_type, ROUND(e.value, 2) AS value,
       ROUND(m.med, 4) AS med, ROUND(d.mad, 4) AS mad
FROM events e
JOIN med m ON e.event_type = m.event_type
JOIN mad d ON e.event_type = d.event_type
WHERE abs(e.value - m.med) > 3 * 1.4826 * d.mad
ORDER BY event_id
""",
    doc="robust anomaly detection: median absolute deviation per event "
    "type, flag values beyond 3 robust sigmas (1.4826*MAD ~ sigma for "
    "normal data) — the outlier sweep that survives heavy tails where "
    "mean/stddev z-scores drown.  Exact medians (percentile / "
    "quantile_cont share linear interpolation) keep both engines bit-"
    "comparable.  Scale: two grouped aggregates over a handful of event "
    "types, each broadcast back onto the fact scan — the corpus never "
    "shuffles.",
)
def e_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    j = ev.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    j2 = j.join(F.broadcast(mad), "event_type")
    return (
        j2.where(F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------------------- trending deltas
@register(
    "e_top_k_trending",
    oracle=f"""
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '{_TS_SQL}') AS hour,
         event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2),
d AS (
  SELECT hour, event_type, cnt,
         LAG(cnt) OVER (PARTITION BY event_type ORDER BY hour) AS prev_cnt
  FROM hourly),
r AS (
  SELECT hour, event_type, CAST(cnt AS BIGINT) AS cnt,
         CAST(prev_cnt AS BIGINT) AS prev_cnt,
         CAST(cnt - prev_cnt AS BIGINT) AS delta,
         CAST(ROW_NUMBER() OVER (PARTITION BY hour
              ORDER BY cnt - prev_cnt DESC, event_type) AS INT) AS rk
  FROM d WHERE prev_cnt IS NOT NULL)
SELECT hour, event_type, cnt, prev_cnt, delta, rk
FROM r WHERE rk <= 3
ORDER BY hour, rk
""",
    doc="hour-over-hour trending detector: per-type hourly counts, the "
    "lag delta against the previous hour, and the top-3 risers per hour "
    "— the windowed-delta shape behind every 'what is spiking right "
    "now' dashboard.  Scale: one grouped aggregate to hourly counts "
    "(map-side combined), then two windows over the SMALL (hours x "
    "types) rollup, not the raw events.",
)
def e_trending(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    hourly = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), _TS_SPARK).alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_lag = Window.partitionBy("event_type").orderBy("hour")
    d = hourly.select(
        "hour",
        "event_type",
        "cnt",
        F.lag("cnt").over(w_lag).alias("prev_cnt"),
    ).where(F.col("prev_cnt").isNotNull())
    w_rank = Window.partitionBy("hour").orderBy(
        (F.col("cnt") - F.col("prev_cnt")).desc(), F.col("event_type").asc()
    )
    return (
        d.select(
            "hour",
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("prev_cnt").cast("long").alias("prev_cnt"),
            (F.col("cnt") - F.col("prev_cnt")).cast("long").alias("delta"),
            F.row_number().over(w_rank).cast("int").alias("rk"),
        )
        .where(F.col("rk") <= 3)
        .orderBy("hour", "rk")
    )


# ------------------------------------------------------ time-grid resample
@register(
    "e_resample_1h",
    oracle=f"""
WITH b AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS h,
         (SUM(CAST(ROUND(value * 1000000) AS BIGINT)) // COUNT(value)) / 1000000.0
           AS value
  FROM events GROUP BY user_id, h),
span AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM b GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
         FROM span),
j AS (SELECT g.user_id, g.h, b.value
      FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h)
SELECT user_id, strftime(h, '{_TS_SQL}') AS bucket_ts, value,
       LAST_VALUE(value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       value IS NOT NULL AS is_observed
FROM j
ORDER BY user_id, bucket_ts
""",
    doc="time-series regularization: per-user hourly mean resampled onto a "
    "DENSE epoch-aligned grid spanning each user's [first, last] bucket, "
    "gaps forward-filled (operators/timeseries.resample_time_grid).  The "
    "grid is generated AFTER aggregation (sequence+explode over bucket "
    "spans), so its cost is O(users x span-hours), independent of raw "
    "event volume; the observed mean runs in exact integer micro-units "
    "so both engines agree bit-for-bit (no IEEE rounding ties).  Scale: "
    "one (user,bucket) hash shuffle with map-side partials + "
    "same-key-family join and fill window.",
)
def e_resample(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.timeseries import resample_time_grid

    ev = load_table(spark, sf, "events")
    out = resample_time_grid(ev, "user_id", "ts", "value", interval_seconds=3600)
    return out.select(
        "user_id",
        F.date_format("bucket_ts", _TS_SPARK).alias("bucket_ts"),
        "value",
        "filled_value",
        "is_observed",
    ).orderBy("user_id", "bucket_ts")


# ------------------------------------------------------ watermark audit
@register(
    "e_watermark_audit",
    oracle=f"""
WITH raw AS (
  SELECT event_id,
         CASE WHEN {portable_hash64_sql("CAST(event_id AS VARCHAR)")} % 10 = 0 THEN ts - INTERVAL 45 MINUTES ELSE ts END AS ts
  FROM events),
ev AS (SELECT event_id // 1000 AS batch_id, ts FROM raw),
pb AS (SELECT batch_id, MAX(ts) AS bmax FROM ev GROUP BY batch_id),
mk AS (SELECT batch_id,
              MAX(bmax) OVER (ORDER BY batch_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                - INTERVAL 600 SECONDS AS wm
       FROM pb),
a AS (SELECT e.batch_id, e.ts, m.wm
      FROM ev e JOIN mk m ON e.batch_id = m.batch_id)
SELECT batch_id,
       strftime(MAX(wm), '{_TS_SQL}') AS watermark_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(CASE WHEN ts < wm THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_late,
       CAST(MAX(CASE WHEN ts < wm
                     THEN CAST(floor(epoch(wm)) - floor(epoch(ts)) AS BIGINT) END)
            AS BIGINT) AS max_lateness_sec
FROM a
GROUP BY batch_id
ORDER BY batch_id
""",
    doc="watermark tuning audit (operators/timeseries.watermark_audit): "
    "replays Structured Streaming's per-micro-batch admission in batch — "
    "events in arrival batch b are admitted against max(event time of "
    "prior batches) - 10 min, exactly when the engine advances the "
    "watermark — and reports per batch how many events a "
    "withWatermark(ts, '10 minutes') config would DROP, with worst-case "
    "lateness.  Sweep the delay to pick the smallest acceptable-loss "
    "config before deploying the stream.  Scale: per-batch max via one "
    "partial-agg'd shuffle, running max over the tiny batch table, "
    "broadcast back; the raw stream is never globally sorted.",
)
def e_wm_audit(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.timeseries import watermark_audit

    ev = load_table(spark, sf, "events")
    # the synthetic stream arrives perfectly ordered, so the audit would
    # trivially report zero drops at any delay; shift a deterministic
    # hash-picked 10% of events 45 min back in EVENT time to model the
    # delayed subpopulation a real pipeline sees (both engines replay
    # the identical perturbation)
    delayed = ev.withColumn(
        "ts",
        F.when(
            portable_hash64(F.col("event_id").cast("string")) % 10 == 0,
            F.col("ts") - F.expr("interval 45 minutes"),
        ).otherwise(F.col("ts")),
    )
    out = watermark_audit(delayed, "ts", "event_id", delay_seconds=600, batch_rows=1000)
    return out.select(
        "batch_id",
        F.date_format("watermark_ts", _TS_SPARK).alias("watermark_ts"),
        "n_events",
        "n_late",
        F.col("max_lateness_sec").cast("long").alias("max_lateness_sec"),
    ).orderBy("batch_id")


# ------------------------------------------------------ seasonal baseline
@register(
    "e_seasonal_anomaly",
    oracle="""
WITH e AS (SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
                  CAST(ROUND(value * 100) AS BIGINT) AS v
           FROM events),
s AS (SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v) AS sv, SUM(CAST(v * v AS DECIMAL(38,0))) AS sv2
      FROM e GROUP BY 1, 2),
b AS (SELECT event_type, hr, n,
             CAST(sv AS DOUBLE) / n AS mean_c,
             sqrt(GREATEST((CAST(sv2 AS DOUBLE)
                            - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n)
                           / (n - 1), 0)) AS std_c
      FROM s WHERE n > 1)
SELECT b.event_type, b.hr AS hour, b.n AS n_events,
       FLOOR(b.mean_c / 100 * 10000 + 0.5) / 10000 AS mean_value,
       FLOOR(b.std_c / 100 * 10000 + 0.5) / 10000 AS stddev_value,
       CAST(SUM(CASE WHEN ABS(e.v - b.mean_c) > 3 * b.std_c
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM e JOIN b ON e.event_type = b.event_type AND e.hr = b.hr
GROUP BY b.event_type, b.hr, b.n, b.mean_c, b.std_c
ORDER BY b.event_type, hour
""",
    doc="hour-of-day seasonal baseline + 3-sigma anomaly census per "
    "event type — the seasonal-profile monitoring shape (traffic is "
    "hourly-periodic; a global mean flags every rush hour).  "
    "Determinism trick: values quantize to exact cent integers, so "
    "count/sum/sum-of-squares are EXACT integer/decimal aggregates "
    "(partial-agg order can't wiggle them), and mean/stddev derive from "
    "those three numbers in identical IEEE double arithmetic on both "
    "engines, rounded via floor(x*10^4+0.5) — explicit IEEE rounding, "
    "immune to the engines' divergent ROUND tie-breaks (Spark HALF_UPs "
    "the decimal string, DuckDB rounds the binary value) — where "
    "stddev_samp over raw doubles would be order-dependent and flap "
    "the hash.  Scale: two grouped aggregates over one events "
    "scan each; the 24 x n_types baseline panel broadcasts back.",
)
def e_seasonal(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.timeseries import seasonal_profile

    events = load_table(spark, sf, "events")
    ev = events.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    base = seasonal_profile(events, ts_col="ts", key_col="event_type",
                            value_col="value", scale=100)
    return (
        ev.join(F.broadcast(base), ["event_type", "hr"])
        .groupBy("event_type", "hr", "n", "mean_c", "std_c")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("mean_c")) > 3 * F.col("std_c"), 1
                ).otherwise(0)
            ).alias("n_anomalies")
        )
        .select(
            "event_type",
            F.col("hr").alias("hour"),
            F.col("n").alias("n_events"),
            (F.floor(F.col("mean_c") / 100 * 10000 + 0.5) / 10000).alias("mean_value"),
            (F.floor(F.col("std_c") / 100 * 10000 + 0.5) / 10000).alias("stddev_value"),
            "n_anomalies",
        )
        .orderBy("event_type", "hour")
    )


# ------------------------------------------------------ sequence mining
@register(
    "e_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
pairs AS (SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS tn FROM pairs GROUP BY prev)
SELECT p.prev AS prev_type, p.next AS next_type, p.n,
       ROUND(CAST(p.n AS DOUBLE) / CAST(t.tn AS DOUBLE), 6) AS prob
FROM pairs p JOIN tot t ON p.prev = t.prev
ORDER BY prev_type, next_type
""",
    doc="first-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current) with exact pair counts — "
    "the user-journey / next-action model product analytics starts "
    "from.  Order within a user is (ts, event_id) so ties are "
    "deterministic.  Scale: ONE user-keyed sort shuffle for the lag "
    "window (the same family every sessionization query uses), then "
    "counts aggregate to |types|^2 rows and the row-total join is a "
    "broadcast of |types| rows.",
)
def e_markov(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    pairs = seq.groupBy(
        F.col("prev").alias("prev_type"), F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("tn"))
    return (
        pairs.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("tn").cast("double"), 6).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


# ------------------------------------------------------ time-range frames
@register(
    "e_trailing_1h",
    oracle=f"""
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(ROUND(value * 100) AS BIGINT) AS v
           FROM events)
SELECT event_id, user_id, strftime(ts, '{_TS_SQL}') AS ts_s,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(v) OVER w AS BIGINT) AS sum_1h_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    doc="trailing 1-hour per-user activity at every event via a "
    "time-RANGE window frame (RANGE BETWEEN INTERVAL ... PRECEDING) — "
    "the rate-limit / burst-detection feature shape.  RANGE frames are "
    "VALUE-based, so simultaneous events are all in or all out together "
    "regardless of tie order — semantics row frames can't express, "
    "deterministic on both engines.  Values ride exact cent integers.  "
    "Scale: ONE user-keyed sort shuffle; the frame is evaluated by "
    "sliding accumulation within the partition, never a self-join "
    "(compare: the naive formulation is an interval self-join per "
    "event).",
)
def e_trailing(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    # microsecond epoch, NOT unix_timestamp: the latter truncates to
    # seconds, silently widening the frame by up to 1s vs the oracle's
    # exact INTERVAL arithmetic (one boundary-straddling pair at sf0.1
    # diverged before this; sub-second event times are the common case)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))  # NTZ->TZ: session tz is pinned UTC
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.date_format("ts", _TS_SPARK).alias("ts_s"),
            F.count("*").over(w).alias("n_1h"),
            F.sum("v").over(w).alias("sum_1h_cents"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------------------ CUPED adjustment
@register(
    "e_cuped_adjust",
    oracle="""
WITH u AS (
  SELECT user_id,
         SUM(CASE WHEN ts <  TIMESTAMP '2024-01-16 00:00:00'
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x,
         SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS y
  FROM events GROUP BY user_id),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM u),
m AS (SELECT n,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1) AS var_x,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1) AS var_y,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1) AS cov_xy
      FROM s)
SELECT n AS n_users,
       FLOOR(cov_xy / var_x * 1000000 + 0.5) / 1000000 AS theta,
       FLOOR(var_y * 100 + 0.5) / 100 AS var_y_cents2,
       FLOOR((var_y - cov_xy * cov_xy / var_x) * 100 + 0.5) / 100 AS var_adj_cents2,
       FLOOR((1.0 - (var_y - cov_xy * cov_xy / var_x) / var_y) * 1000000 + 0.5)
         / 1000000 AS var_reduction
FROM m
""",
    doc="CUPED variance reduction (Deng et al. 2013, 'Improving the "
    "Sensitivity of Online Controlled Experiments'): pre-period spend "
    "per user as the covariate, theta = cov(x,y)/var(x), and the "
    "closed-form adjusted variance var(y) - cov^2/var(x) — the "
    "experimentation-platform primitive that shrinks A/B confidence "
    "intervals without more traffic.  Determinism: per-user x/y are "
    "exact cent sums; the five moment sums ride BIGINT/DECIMAL(38) "
    "(partial-agg order can't move them); theta and the variances "
    "derive in identical IEEE trees with explicit floor-rounding.  "
    "Scale: one user-keyed partial-agg'd shuffle, then a 1-row moment "
    "panel — the corpus is scanned once.",
)
def e_cuped(spark: SparkSession, sf: str) -> DataFrame:
    cut = "2024-01-16 00:00:00"
    v = F.round(F.col("value") * 100).cast("long")
    u = (
        load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, v).otherwise(F.lit(0))).alias("x"),
            F.sum(F.when(F.col("ts") >= cut, v).otherwise(F.lit(0))).alias("y"),
        )
    )
    s = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        # cast BEFORE the multiply: a whale user's squared cent sum can
        # pass signed-64 on its own, and long*long wraps pre-cast under
        # non-ANSI Spark (the oracle's HUGEINT multiply is the twin)
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    var_x = (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n) / (n - 1)
    var_y = (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / n) / (n - 1)
    cov = (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / n) / (n - 1)
    m = s.select(n.alias("n"), var_x.alias("var_x"), var_y.alias("var_y"), cov.alias("cov_xy"))
    adj = F.col("var_y") - F.col("cov_xy") * F.col("cov_xy") / F.col("var_x")
    return m.select(
        F.col("n").alias("n_users"),
        (F.floor(F.col("cov_xy") / F.col("var_x") * 1000000 + 0.5) / 1000000).alias("theta"),
        (F.floor(F.col("var_y") * 100 + 0.5) / 100).alias("var_y_cents2"),
        (F.floor(adj * 100 + 0.5) / 100).alias("var_adj_cents2"),
        (F.floor((1.0 - adj / F.col("var_y")) * 1000000 + 0.5) / 1000000).alias("var_reduction"),
    )


# ------------------------------------------------------ cohort LTV
@register(
    "e_cohort_ltv",
    oracle="""
WITH cohort AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id),
sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
          FROM cohort GROUP BY cohort_week),
rev AS (
  SELECT c.cohort_week,
         CAST(date_diff('day', c.cohort_week, date_trunc('week', e.ts)) // 7
              AS BIGINT) AS week_offset,
         CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events e JOIN cohort c ON e.user_id = c.user_id
  GROUP BY 1, 2),
cum AS (
  SELECT cohort_week, week_offset, rev_cents,
         CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week ORDER BY week_offset)
              AS BIGINT) AS cum_cents
  FROM rev)
SELECT strftime(cum.cohort_week, '%Y-%m-%d') AS cohort_week,
       week_offset, s.n_users, rev_cents, cum_cents,
       FLOOR(CAST(cum_cents AS DOUBLE) / CAST(s.n_users AS DOUBLE) / 100
             * 10000 + 0.5) / 10000 AS ltv_per_user
FROM cum JOIN sizes s ON cum.cohort_week = s.cohort_week
ORDER BY cohort_week, week_offset
""",
    doc="cohort lifetime-value curves: users bucketed by first-event "
    "week; per (cohort, week-offset) revenue, its running cumulative, "
    "and LTV-per-user — the growth-analytics complement of "
    "e_retention's headcount matrix.  Determinism: revenue rides exact "
    "cent integers end-to-end (weekly sums AND the cumulative window "
    "are integer arithmetic); only the final per-user division is "
    "float, with explicit floor-rounding.  Scale: one user-keyed "
    "shuffle for cohort labels, one (cohort, offset) rollup, a "
    "cohort-keyed cumulative window over the TINY rollup, and a "
    "broadcast of cohort sizes.",
)
def e_ltv(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id")
    labeled = e.withColumn(
        "cohort_week", F.date_trunc("week", F.min("ts").over(w))
    )
    sizes = (
        labeled.select("user_id", "cohort_week")
        .distinct()
        .groupBy("cohort_week")
        .agg(F.count("*").alias("n_users"))
    )
    rev = (
        labeled.select(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week"))
                .cast("long") / 7
            ).cast("long").alias("week_offset"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("v").alias("rev_cents"))
    )
    cw = Window.partitionBy("cohort_week").orderBy("week_offset")
    cum = rev.withColumn("cum_cents", F.sum("rev_cents").over(cw))
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
            "rev_cents",
            "cum_cents",
            (
                F.floor(
                    F.col("cum_cents").cast("double")
                    / F.col("n_users").cast("double")
                    / 100
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ------------------------------------------------------ SRM check
@register(
    "e_srm_check",
    oracle="""
WITH a AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM events GROUP BY event_type)
SELECT event_type, n_a, n_b,
       FLOOR(((CAST(n_a AS DOUBLE) - (n_a + n_b) / 2.0)
              * (CAST(n_a AS DOUBLE) - (n_a + n_b) / 2.0)
              / ((n_a + n_b) / 2.0)
              + (CAST(n_b AS DOUBLE) - (n_a + n_b) / 2.0)
              * (CAST(n_b AS DOUBLE) - (n_a + n_b) / 2.0)
              / ((n_a + n_b) / 2.0)) * 1000000 + 0.5) / 1000000 AS chi2,
       ABS(CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
         / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) >= 0.05 AS flag_srm
FROM a
ORDER BY event_type
""",
    doc="sample-ratio-mismatch (SRM) check per event type: assignment "
    "arms from deterministic user parity, exact arm counts, the "
    "2-cell chi-square statistic against the expected 50/50 split "
    "(floor-truncated to keep the float deterministic), and a "
    "practical 5% imbalance flag — the guardrail every A/B readout "
    "runs FIRST (a mismatched split invalidates the experiment before "
    "any metric is read; compare chi2 against the 3.84 critical value "
    "for alpha=0.05).  Scale: one partial-agg'd rollup to |types| "
    "rows; everything derived.",
)
def e_srm(spark: SparkSession, sf: str) -> DataFrame:
    a = (
        load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n_b"),
        )
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    exp = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = (na - exp) * (na - exp) / exp + (nb - exp) * (nb - exp) / exp
    return a.select(
        "event_type",
        "n_a",
        "n_b",
        (F.floor(chi2 * 1000000 + 0.5) / 1000000).alias("chi2"),
        (F.abs(na - nb) / (na + nb) >= 0.05).alias("flag_srm"),
    ).orderBy("event_type")


# ------------------------------------------------------ inter-arrival times
@register(
    "e_interarrival",
    oracle="""
WITH seq AS (
  SELECT event_type,
         CAST(date_diff('second',
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
              AS BIGINT) AS gap_s
  FROM events)
SELECT event_type,
       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
       FLOOR(CAST(SUM(gap_s) AS DOUBLE) / COUNT(gap_s) * 100 + 0.5) / 100
         AS mean_gap_s
FROM seq
WHERE gap_s IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
    doc="per-user inter-arrival gaps rolled up by event type — the "
    "traffic-shape statistic behind session-gap and watermark-delay "
    "choices (pick sessionize gap_seconds and withWatermark delay from "
    "THIS table, not folklore).  Gaps are exact integer seconds from a "
    "lag window; min/max/sum stay integers, the mean divides once with "
    "explicit floor-rounding.  Scale: one user-keyed sort shuffle "
    "(shared family with every sessionization query), one partial-"
    "agg'd rollup to |types| rows.",
)
def e_interarrival(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load_table(spark, sf, "events")
        .select(
            "event_type",
            (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
            ).cast("long").alias("gap_s"),
        )
        .where(F.col("gap_s").isNotNull())
    )
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
            F.sum("gap_s").alias("__sum"),
        )
        .select(
            "event_type",
            "n_gaps",
            "min_gap_s",
            "max_gap_s",
            (
                F.floor(F.col("__sum").cast("double") / F.col("n_gaps") * 100 + 0.5)
                / 100
            ).alias("mean_gap_s"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ conversion path mining
_PATH_CAP = 6
_PATH_TOPK = 15


@register(
    "e_path_to_conversion",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
s AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM o),
r AS (
  SELECT user_id, session_idx, event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
                                 ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM s),
paths AS (
  SELECT user_id, session_idx,
         STRING_AGG(event_type, '>' ORDER BY rn)
           FILTER (WHERE rn <= {_PATH_CAP}) AS path,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM r GROUP BY user_id, session_idx)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths WHERE converted = 1
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_PATH_TOPK}
""",
    doc="conversion path mining: sessionize (30-minute gap, the "
    "e_sessionize_gap construction), assemble each CONVERTING session's "
    f"ordered event-type path (first {_PATH_CAP} events, '>'-joined), "
    f"and surface the top {_PATH_TOPK} paths with session and distinct-"
    "user counts — the 'which journeys end in purchase' funnel-explorer "
    "primitive.  Determinism: events order on the unique (ts, event_id) "
    "pair at every step, so both engines assemble byte-identical path "
    "strings; ties in the ranking break on the path text.  Scale: one "
    "shuffle on user_id serves the lag window, the cumsum window, and "
    "the per-session row_number (all same-key); the path aggregate is "
    f"keyed by (user, session) with strings capped at {_PATH_CAP} "
    "events (the cap is the unbounded-collect guard); the final top-k "
    "is a distributed TakeOrdered, never a global single-partition "
    "sort.",
)
def e_path_to_conversion(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_break = F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(prev_ts.isNull() | gap_break, 1).otherwise(0).alias("new_s"),
    ).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_s").over(run).alias("session_idx"),
    )
    wr = Window.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    r = sess.withColumn("rn", F.row_number().over(wr).cast("long"))
    paths = r.groupBy("user_id", "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= _PATH_CAP,
                            F.struct(F.col("rn"), F.col("event_type")),
                        )
                    )
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return (
        paths.where(F.col("converted") == 1)
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOPK)
    )
