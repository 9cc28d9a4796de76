"""Event-analytics / experimentation / timeseries catalog queries (e_*).

Split from the round-3..6 stats_graph suite (round-7 verdict #6) — pure
mechanical move, registry names and oracles unchanged.  Survival (K-M,
Weibull), funnel conformance, DiD, retention, power/CUPED, bootstrap CI,
ACF/seasonality/Holt, stickiness, A/B tests, entropy, attribution,
sequential patterns, EWMA.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..tables import load_table
from . import register
from .stats_tests import _ERFC_SQL

# ------------------------------------------------------ EWMA smoothing
_EWMA_TAPS = 8  # alpha = 1/2 -> weights 2^-j, exactly representable doubles


@register(
    "e_ewma_smooth",
    oracle=f"""
WITH c AS (
  SELECT event_id, user_id, value,
         {", ".join(f"lag(value, {j}) OVER w AS v{j}" for j in range(1, _EWMA_TAPS))}
  FROM events WHERE event_type = 'click'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, value,
       FLOOR((value * 1.0{"".join(f" + COALESCE(v{j}, 0.0) * {0.5 ** j!r}" for j in range(1, _EWMA_TAPS))})
             / (1.0{"".join(f" + CASE WHEN v{j} IS NULL THEN 0.0 ELSE {0.5 ** j!r} END" for j in range(1, _EWMA_TAPS))})
             * 1000000 + 0.5) / 1000000 AS ewma
FROM c
ORDER BY event_id
""",
    doc="per-user exponentially-weighted moving average of click values "
    "as a bounded 8-tap FIR (alpha = 1/2): ewma_t = sum(2^-j * x_(t-j)) "
    "/ sum(2^-j) over the taps that exist — the truncated form of the "
    "recursive EWMA, chosen because the infinite recursion is order-"
    "serial and unbounded state while the FIR is a fixed-width lag "
    "window.  Determinism: every weight 2^-j is an exactly-representable "
    "binary double and both engines fold the taps in the same written "
    "order, so the quotient is bit-identical before floor-rounding.  "
    "Scale: ONE user-partitioned window (never a global sort); state per "
    "row is 7 lags.",
)
def e_ewma_smooth(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    clicks = load_table(spark, sf, "events").where(F.col("event_type") == "click")
    lagged = clicks.select(
        "event_id",
        "user_id",
        "value",
        *[F.lag("value", j).over(w).alias(f"v{j}") for j in range(1, _EWMA_TAPS)],
    )
    num = F.col("value") * F.lit(1.0)
    den = F.lit(1.0)
    for j in range(1, _EWMA_TAPS):
        num = num + F.coalesce(F.col(f"v{j}"), F.lit(0.0)) * F.lit(0.5**j)
        den = den + F.when(F.col(f"v{j}").isNull(), F.lit(0.0)).otherwise(F.lit(0.5**j))
    return lagged.select(
        "event_id",
        "user_id",
        "value",
        (F.floor(num / den * 1000000 + 0.5) / 1000000).alias("ewma"),
    ).orderBy("event_id")
# ------------------------------------------------------ Kaplan-Meier survival
_KM_CUT_US = 86_400_000_000  # censor users still active in the last 24h
_HOUR_US = 3_600_000_000


# shared by e_survival_curve (directly) and e_weibull_fit (as a subquery)
_KM_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // {_HOUR_US} AS dur,
         MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id),
cut AS (SELECT MAX(epoch_us(ts)) - {_KM_CUT_US} AS cutoff FROM events),
subj AS (SELECT u.dur, CASE WHEN u.last_us < cut.cutoff THEN 1 ELSE 0 END AS churned
         FROM u, cut),
steps AS (SELECT dur AS t, CAST(SUM(churned) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS ended
          FROM subj GROUP BY dur),
panel AS (SELECT list({{'t': t, 'd': d, 'ended': ended}} ORDER BY t) AS lst FROM steps),
arrs AS (
  SELECT lst,
         CAST(list_sum(list_transform(lst, x -> x.ended)) AS BIGINT) AS total,
         list_transform(lst, (x, i) ->
           CAST(list_sum(list_transform(lst, (y, j) ->
             CASE WHEN j < i THEN y.ended ELSE 0 END)) AS BIGINT)) AS before_i
  FROM panel),
arrs2 AS (
  SELECT lst, total, before_i,
         list_transform(lst, (x, i) ->
           CASE WHEN x.d > 0
                THEN 1.0 - CAST(x.d AS DOUBLE) / (total - before_i[i])
                ELSE 1.0 END) AS factors
  FROM arrs),
km AS (SELECT lst, total, before_i, factors,
              generate_subscripts(lst, 1) AS i FROM arrs2)
SELECT lst[i].t AS duration_hours,
       total - before_i[i] AS n_risk,
       lst[i].d AS n_churned,
       FLOOR(list_reduce(list_slice(factors, 1, i), (a, b) -> a * b)
             * 1000000 + 0.5) / 1000000 AS survival
FROM km
WHERE lst[i].d > 0
ORDER BY duration_hours
"""


@register(
    "e_survival_curve",
    oracle=_KM_ORACLE,
    doc="Kaplan-Meier survival curve over user lifetimes (hours between "
    "first and last event; users still active in the final 24 h are "
    "right-censored): S(t) = prod over churn times <= t of (1 - d/n) — "
    "the product-limit estimator (Kaplan & Meier 1958) behind every "
    "churn/retention duration model.  Determinism: lifetimes are exact "
    "integer micros div hours; d/ended/n are exact integers; the factor "
    "product folds LEFT-TO-RIGHT over the duration-sorted step list on "
    "both engines (F.aggregate vs list_reduce — same pairwise multiply "
    "sequence), so the double is bit-identical before floor-rounding.  "
    "Scale: one user-keyed partial-agg'd shuffle, then the step panel "
    "(bounded by distinct lifetime hours) folds in a SINGLE row — no "
    "global window, no per-subject state beyond the grouped agg.  The "
    "prefix computation is O(k^2) in the panel size k; at hour grain "
    "k stays in the thousands for year-long spans — coarsen the "
    "duration grain (days/weeks) as observation spans grow so the "
    "panel, not the corpus, stays the bounded object.",
)
def e_survival_curve(spark: SparkSession, sf: str) -> DataFrame:
    # product-limit machinery promoted to operators/survival.py (round 6);
    # this oracle-paired query pins it bit-for-bit
    from ..operators.panels import attach_scalar_panel
    from ..operators.survival import km_survival

    ev = load_table(spark, sf, "events")
    # ts may surface as TIMESTAMP or TIMESTAMP_NTZ depending on the
    # session's parquet nanos handling; the NTZ->TIMESTAMP cast applies a
    # constant session-tz shift that cancels in every expression below
    # (durations and the cutoff comparison are pure differences).
    us = F.expr("unix_micros(cast(ts as timestamp))")
    u = ev.groupBy("user_id").agg(
        F.expr(
            "(max(unix_micros(cast(ts as timestamp)))"
            f" - min(unix_micros(cast(ts as timestamp)))) div {_HOUR_US}"
        ).alias("dur"),
        F.max(us).alias("last_us"),
    )
    cut = ev.agg((F.max(us) - F.lit(_KM_CUT_US)).alias("cutoff"))
    subj = attach_scalar_panel(u, cut).select(
        "dur", F.when(F.col("last_us") < F.col("cutoff"), 1).otherwise(0).alias("churned")
    )
    return km_survival(subj, "dur", "churned").select(
        F.col("duration").alias("duration_hours"),
        "n_risk",
        F.col("n_events").alias("n_churned"),
        "survival",
    )
# ------------------------------------------------ parametric survival fit
@register(
    "e_weibull_fit",
    oracle=f"""
WITH km_out AS ({_KM_ORACLE}),
pts AS (
  SELECT list({{'x': ln(duration_hours), 'y': ln(-ln(survival))}}
              ORDER BY duration_hours) AS l
  FROM km_out
  WHERE duration_hours > 0 AND survival > 0 AND survival < 1),
s AS (
  SELECT CAST(len(l) AS BIGINT) AS n,
         list_reduce(list_transform(l, p -> p.x), (a, b) -> a + b) AS sx,
         list_reduce(list_transform(l, p -> p.y), (a, b) -> a + b) AS sy,
         list_reduce(list_transform(l, p -> p.x * p.x), (a, b) -> a + b) AS sxx,
         list_reduce(list_transform(l, p -> p.x * p.y), (a, b) -> a + b) AS sxy,
         list_reduce(list_transform(l, p -> p.y * p.y), (a, b) -> a + b) AS syy
  FROM pts),
fit AS (
  SELECT n, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS k, sx, sy,
         (n * sxy - sx * sy) * (n * sxy - sx * sy)
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
  FROM s WHERE n >= 3)
SELECT n AS n_points,
       FLOOR(k * 1000000 + 0.5) / 1000000 AS shape_k,
       FLOOR(exp(-((sy - k * sx) / n) / k) * 100 + 0.5) / 100 AS scale_hours,
       FLOOR(r2 * 1000000 + 0.5) / 1000000 AS r2
FROM fit
""",
    doc="parametric Weibull fit of the Kaplan-Meier survival curve (the "
    "e_survival_curve output consumed downstream — same composition a "
    "reliability team runs): the product-limit S(t) linearizes as "
    "ln(-ln S) = k*ln t - k*ln lambda, so shape k and scale lambda come "
    "from a closed-form OLS over the (bounded) churn-step panel, with "
    "r^2 as the Weibull-ness diagnostic (k<1 infant-mortality churn, "
    "k=1 memoryless/exponential, k>1 wear-out).  Determinism: the "
    "regression consumes the ROUNDED survival values (already proven "
    "bit-identical cross-engine), the points list is duration-sorted, "
    "and every moment is a LEFT fold over that list on both engines "
    "(F.aggregate vs list_reduce — same pairwise sequence), so the "
    "doubles match before the final floor-rounding.  Scale: inherits "
    "the K-M shape (one user-keyed shuffle + single-row panel fold); "
    "the regression adds panel-only math.",
)
def e_weibull_fit(spark: SparkSession, sf: str) -> DataFrame:
    # linearized-OLS fit promoted to operators/survival.py (round 6);
    # degenerate panels (fewer than 3 usable churn steps at tiny SFs)
    # yield no fit row on BOTH engines rather than a divide-by-zero
    from ..operators.survival import weibull_from_km

    km = e_survival_curve(spark, sf)
    fit = weibull_from_km(km, "duration_hours", "survival")
    return fit.select(
        "n_points", "shape_k", F.col("scale").alias("scale_hours"), "r2"
    )
# ------------------------------------------------- event-flow conformance
@register(
    "e_flow_conformance",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS prior_browse
  FROM events),
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND COALESCE(prior_browse, 0) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS valid_purchases,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND COALESCE(prior_browse, 0) = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_browse,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_signup,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM ev GROUP BY user_id)
SELECT user_id, n_events,
       CASE WHEN valid_purchases > 0 THEN 'converted'
            WHEN n_browse > 0 THEN 'browsing'
            WHEN n_signup > 0 THEN 'registered'
            ELSE 'inactive' END AS final_state,
       n_violations, n_errors
FROM per_user
ORDER BY user_id
""",
    doc="per-user event-flow conformance: a monotone funnel state machine "
    "(inactive -> registered -> browsing -> converted) folded over each "
    "user's time-ordered event sequence; a purchase with NO prior "
    "view/click is a conformance violation (it does not convert).  The "
    "Spark side runs the REAL operator shape — an ordered higher-order "
    "aggregate fold carrying (state, violations, errors) — while the "
    "oracle derives the identical answer from a declarative cumulative-"
    "window formulation; their agreement is a two-formulation "
    "differential proof, not a translation.  Determinism: the fold order "
    "is the total (ts, event_id) order; all counters are exact integers.  "
    "Scale: ONE user-keyed shuffle; the fold state is 3 counters.  The "
    "collect_list is bounded by per-user history length — for unbounded "
    "histories the streaming twin (sessionize_with_state / "
    "applyInPandasWithState, streaming/ops.py) is the right surface.",
)
def e_flow_conformance(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    # fold: acc = (state-rank 0..3, violations, errors); monotone ranks
    # inactive=0 registered=1 browsing=2 converted=3
    init = F.struct(
        F.lit(0).alias("st"), F.lit(0).cast("long").alias("viol"),
        F.lit(0).cast("long").alias("err"),
    )

    def step(acc, x):
        et = x["event_type"]
        st = acc["st"]
        new_st = (
            F.when((et == "purchase") & (st >= 2), F.lit(3))
            .when((et == "view") | (et == "click"), F.greatest(st, F.lit(2)))
            .when(et == "signup", F.greatest(st, F.lit(1)))
            .otherwise(st)
        )
        viol = acc["viol"] + F.when(
            (et == "purchase") & (st < 2), F.lit(1)
        ).otherwise(F.lit(0)).cast("long")
        err = acc["err"] + F.when(et == "error", F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        )
        return F.struct(new_st.alias("st"), viol.alias("viol"), err.alias("err"))

    folded = per_user.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.aggregate(F.col("seq"), init, step).alias("acc"),
    )
    state_name = (
        F.when(F.col("acc.st") == 3, "converted")
        .when(F.col("acc.st") == 2, "browsing")
        .when(F.col("acc.st") == 1, "registered")
        .otherwise("inactive")
    )
    return folded.select(
        "user_id",
        "n_events",
        state_name.alias("final_state"),
        F.col("acc.viol").alias("n_violations"),
        F.col("acc.err").alias("n_errors"),
    ).orderBy("user_id")
# ------------------------------------------------ difference-in-differences
_DID_CUT = "2024-01-16 00:00:00"


@register(
    "e_did_estimate",
    oracle=f"""
WITH cells AS (
  SELECT {portable_hash64_sql("CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CASE WHEN ts >= TIMESTAMP '{_DID_CUT}' THEN 1 ELSE 0 END AS post,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events),
s AS (SELECT arm, post, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM cells GROUP BY arm, post),
m AS (SELECT
        MAX(CASE WHEN arm = 1 AND post = 1 THEN CAST(total AS DOUBLE) / n END) AS tp,
        MAX(CASE WHEN arm = 1 AND post = 0 THEN CAST(total AS DOUBLE) / n END) AS tr,
        MAX(CASE WHEN arm = 0 AND post = 1 THEN CAST(total AS DOUBLE) / n END) AS cp,
        MAX(CASE WHEN arm = 0 AND post = 0 THEN CAST(total AS DOUBLE) / n END) AS cr,
        CAST(SUM(n) AS BIGINT) AS n_events
      FROM s)
SELECT n_events,
       FLOOR(tp / 100 * 1000000 + 0.5) / 1000000 AS treat_post_mean,
       FLOOR(tr / 100 * 1000000 + 0.5) / 1000000 AS treat_pre_mean,
       FLOOR(cp / 100 * 1000000 + 0.5) / 1000000 AS ctrl_post_mean,
       FLOOR(cr / 100 * 1000000 + 0.5) / 1000000 AS ctrl_pre_mean,
       FLOOR(((tp - tr) - (cp - cr)) / 100 * 1000000 + 0.5) / 1000000 AS did_estimate
FROM m
""",
    doc="difference-in-differences estimate over the events stream: arms "
    "by portable user hash, pre/post split at the CUPED cut, DiD = "
    "(treat_post - treat_pre) - (ctrl_post - ctrl_pre) — the 2x2 causal "
    "panel (Card & Krueger 1994 design) next to the platform's CUPED/"
    "SRM guardrails.  Determinism: the four cell sums are exact cent "
    "integers; every mean and the DiD derive in identical IEEE trees "
    "with explicit floor-rounding.  Scale: one (arm, post)-keyed "
    "partial-agg'd shuffle to a 4-row panel — the stream is scanned "
    "once.",
)
def e_did_estimate(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cells = ev.select(
        (portable_hash64(F.col("user_id").cast("string")) % 2).alias("arm"),
        F.when(F.col("ts") >= _DID_CUT, 1).otherwise(0).alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = cells.groupBy("arm", "post").agg(
        F.count("*").alias("n"),
        # DECIMAL(38) so a corpus-scale cell sum cannot wrap a long
        # silently under non-ANSI Spark (DuckDB's SUM already rides
        # HUGEINT internally)
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("total"),
    )
    mean = F.col("total").cast("double") / F.col("n")
    m = s.agg(
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 1), mean)).alias("tp"),
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 0), mean)).alias("tr"),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 1), mean)).alias("cp"),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 0), mean)).alias("cr"),
        F.sum("n").alias("n_events"),
    )
    r6 = lambda c: F.floor(c / 100 * 1000000 + 0.5) / 1000000  # noqa: E731
    return m.select(
        "n_events",
        r6(F.col("tp")).alias("treat_post_mean"),
        r6(F.col("tr")).alias("treat_pre_mean"),
        r6(F.col("cp")).alias("ctrl_post_mean"),
        r6(F.col("cr")).alias("ctrl_pre_mean"),
        r6((F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr"))).alias(
            "did_estimate"
        ),
    )
# ------------------------------------------------- rolling N-day retention
_RET_DAYS = 7


@register(
    "e_rolling_retention",
    oracle=f"""
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
ret AS (
  SELECT DISTINCT a.user_id, a.day
  FROM days a JOIN days b
    ON a.user_id = b.user_id
   AND b.day > a.day
   AND b.day <= a.day + INTERVAL {_RET_DAYS} DAY)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(COUNT(r.user_id) AS BIGINT) AS retained_users,
       FLOOR(CAST(COUNT(r.user_id) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
         / 1000000 AS retention_rate
FROM days d LEFT JOIN ret r ON d.user_id = r.user_id AND d.day = r.day
GROUP BY d.day
ORDER BY day
""",
    doc="rolling N-day retention: for every calendar day, the fraction of "
    "that day's active users who return within the next 7 days — the "
    "product-metric companion to cohort retention (e_retention tracks "
    "fixed signup cohorts; this tracks a sliding window over ALL active "
    "users).  Semantics via a user-keyed day self-join with a bounded "
    "date-range predicate — never a per-user window over unbounded "
    "history.  Determinism: day grain is exact; counts are integers; "
    "one floor-rounded division per output row.  Scale: distinct "
    "(user, day) is one partial-agg'd shuffle; the range self-join is "
    "user-keyed equi-join with a 7-day bounded band; final rollup is "
    "day-keyed.",
)
def e_rolling_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    a, b = days.alias("a"), days.alias("b")
    ret = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.day") > F.col("a.day"))
            & (F.col("b.day") <= F.date_add(F.col("a.day"), _RET_DAYS)),
        )
        .select(F.col("a.user_id").alias("user_id"), F.col("a.day").alias("day"))
        .distinct()
        .withColumn("retained", F.lit(1))
    )
    return (
        days.join(ret, ["user_id", "day"], "left")
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count("*").alias("active_users"),
            F.count("retained").alias("retained_users"),
        )
        .select(
            "day",
            "active_users",
            "retained_users",
            (
                F.floor(
                    F.col("retained_users").cast("double")
                    / F.col("active_users")
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("retention_rate"),
        )
        .orderBy("day")
    )
# ------------------------------------------------- experiment power panel
_PW_CUT = "2024-01-16 00:00:00"  # the CUPED pre-period cut


@register(
    "e_power_analysis",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PW_CUT}'
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY user_id),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM u),
m AS (SELECT n,
             CAST(sx AS DOUBLE) / n AS mean_c,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
               / (n - 1) AS var_c
      FROM s)
SELECT n AS n_users,
       FLOOR(mean_c / 100 * 10000 + 0.5) / 10000 AS mean_dollars,
       FLOOR(var_c / 10000 * 10000 + 0.5) / 10000 AS var_dollars2,
       FLOOR(mean_c * 0.05 / 100 * 10000 + 0.5) / 10000 AS mde_dollars,
       CAST(CEIL(16.0 * var_c / ((mean_c * 0.05) * (mean_c * 0.05))) AS BIGINT)
         AS n_required_per_arm,
       (CAST(CEIL(16.0 * var_c / ((mean_c * 0.05) * (mean_c * 0.05))) AS BIGINT)
          <= n / 2) AS adequately_powered
FROM m
""",
    doc="experiment power analysis from the pre-period spend panel: "
    "per-user exact cent sums -> sample variance -> required n per arm "
    "for a 5% MDE via the 16*sigma^2/delta^2 rule (two-sided alpha .05, "
    "power .8 — van Belle's rule of thumb), plus whether the current "
    "user base could power the test.  Completes the experimentation "
    "family (e_srm_check guards allocation, e_cuped_adjust shrinks "
    "variance, e_did_estimate reads the effect — this sizes the test "
    "BEFORE it runs).  Determinism: the two moments are exact integers; "
    "the IEEE tail is identical both engines with explicit rounding.  "
    "Scale: one user-keyed partial-agg'd shuffle to a 1-row panel.",
)
def e_power_analysis(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    v = F.round(F.col("value") * 100).cast("long")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < _PW_CUT, v).otherwise(F.lit(0))).alias("x")
    )
    s = u.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        # cast BEFORE the multiply: a whale user's squared cent sum can
        # pass signed-64 on its own, and long*long wraps pre-cast
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    mean_c = F.col("sx").cast("double") / n
    var_c = (
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    ) / (n - 1)
    m = s.select(n.alias("n"), mean_c.alias("mean_c"), var_c.alias("var_c"))
    req = F.ceil(16.0 * F.col("var_c") / ((F.col("mean_c") * 0.05) * (F.col("mean_c") * 0.05))).cast("long")
    return m.select(
        F.col("n").alias("n_users"),
        (F.floor(F.col("mean_c") / 100 * 10000 + 0.5) / 10000).alias("mean_dollars"),
        (F.floor(F.col("var_c") / 10000 * 10000 + 0.5) / 10000).alias("var_dollars2"),
        (F.floor(F.col("mean_c") * 0.05 / 100 * 10000 + 0.5) / 10000).alias(
            "mde_dollars"
        ),
        req.alias("n_required_per_arm"),
        (req <= F.col("n") / 2).alias("adequately_powered"),
    )
# ------------------------------------------------- Poisson bootstrap CI
# Poisson(1) inverse-CDF thresholds on the portable 60-bit hash scale:
# _POIS_T[k] = floor(CDF(k) * 2^60), so `h < _POIS_T[k]` <=> `draw <= k`
# for a hash uniform on [0, 2^60).  Identical integer literals on both
# engines make the per-record bootstrap weights exactly reproducible.
_POIS_T = [
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
]
_BOOT_B = 32  # bootstrap replicates


def _pois_case_sql(h_expr: str) -> str:
    arms = "\n".join(
        f"       WHEN {h_expr} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE\n{arms}\n       ELSE 8 END"


@register(
    "e_bootstrap_ci",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders),
reps AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
drawn AS (
  SELECT o_orderpriority, b, y,
         {_pois_case_sql(portable_hash64_sql(
             "CAST(o_orderkey AS VARCHAR) || '|' || CAST(b AS VARCHAR)"))} AS w
  FROM base CROSS JOIN reps),
rep_means AS (
  SELECT o_orderpriority, b,
         CAST(SUM(CAST(w * y AS DECIMAL(38,0))) AS DOUBLE)
           / CAST(SUM(w) AS BIGINT) AS mean_b
  FROM drawn GROUP BY o_orderpriority, b),
boot AS (
  SELECT o_orderpriority,
         AVG(mean_b) AS boot_mean,
         STDDEV_SAMP(mean_b) AS boot_se
  FROM rep_means GROUP BY o_orderpriority),
point AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS est
  FROM base GROUP BY o_orderpriority)
SELECT p.o_orderpriority,
       p.n_orders,
       FLOOR(p.est / 100 * 10000 + 0.5) / 10000 AS est_mean_dollars,
       FLOOR(b.boot_se / 100 * 10000 + 0.5) / 10000 AS boot_se_dollars,
       FLOOR((p.est - 1.96 * b.boot_se) / 100 * 10000 + 0.5) / 10000 AS ci_lo_dollars,
       FLOOR((p.est + 1.96 * b.boot_se) / 100 * 10000 + 0.5) / 10000 AS ci_hi_dollars
FROM point p JOIN boot b ON p.o_orderpriority = b.o_orderpriority
ORDER BY p.o_orderpriority
""",
    doc="Poisson-bootstrap confidence interval for mean order value per "
    "priority — THE resampling shape that scales: instead of "
    "materializing B resampled copies of the corpus, every record draws "
    "B independent Poisson(1) weights from a deterministic 60-bit hash "
    "of (orderkey, replicate) and contributes w*y to each replicate's "
    "weighted mean (Chamandy et al., 'Estimating Uncertainty for "
    "Massive Data Streams', Google 2012).  Scale: the x32 posexplode is "
    "map-side and immediately partial-aggregated, so the shuffle "
    "carries exactly B rows per (priority, partition) — never the "
    "corpus; replicate means are exact DECIMAL cent-sums over exact "
    "integer weights, so partial-agg order cannot move them; the final "
    "normal-approximation CI derives from 32-value panels.  "
    "Determinism: weights come from integer threshold compares on the "
    "portable hash (Poisson inverse-CDF thresholds pre-scaled to the "
    "hash range as integer literals), identical in DuckDB.",
)
def e_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    base = load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    drawn = base.select(
        "o_orderpriority",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        F.col("o_orderkey"),
    )
    h = portable_hash64(
        F.concat_ws(
            "|", F.col("o_orderkey").cast("string"), F.col("b").cast("string")
        )
    )
    w = F.lit(8)
    for k in range(len(_POIS_T) - 1, -1, -1):
        w = F.when(h < F.lit(_POIS_T[k]), F.lit(k)).otherwise(w)
    rep_means = (
        drawn.withColumn("w", w)
        .groupBy("o_orderpriority", "b")
        .agg(
            F.sum((F.col("w") * F.col("y")).cast("decimal(38,0)")).alias("swy"),
            F.sum("w").alias("sw"),
        )
        .select(
            "o_orderpriority",
            "b",
            (F.col("swy").cast("double") / F.col("sw")).alias("mean_b"),
        )
    )
    boot = rep_means.groupBy("o_orderpriority").agg(
        F.avg("mean_b").alias("boot_mean"),
        F.stddev_samp("mean_b").alias("boot_se"),
    )
    point = base.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.col("y").cast("decimal(38,0)")).cast("double") / F.count("*")).alias(
            "est"
        ),
    )
    dollars = lambda c: F.floor(c / 100 * 10000 + 0.5) / 10000  # noqa: E731
    return (
        point.join(F.broadcast(boot), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            dollars(F.col("est")).alias("est_mean_dollars"),
            dollars(F.col("boot_se")).alias("boot_se_dollars"),
            dollars(F.col("est") - 1.96 * F.col("boot_se")).alias("ci_lo_dollars"),
            dollars(F.col("est") + 1.96 * F.col("boot_se")).alias("ci_hi_dollars"),
        )
        .orderBy("o_orderpriority")
    )
# ------------------------------------------------ daily-revenue ACF
_ACF_MAX_LAG = 7


@register(
    "e_acf_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS x
  FROM orders GROUP BY d),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS q
  FROM daily),
lags AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) l(k)),
pairs AS (
  SELECT l.k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(a.x AS HUGEINT) * b.x) AS p,
         CAST(SUM(a.x) AS BIGINT) AS sa,
         CAST(SUM(b.x) AS BIGINT) AS sb
  FROM daily a JOIN lags l ON TRUE
  JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)
  GROUP BY l.k)
SELECT k AS lag, n_pairs,
       FLOOR(
         (CAST(p AS DOUBLE)
          - (CAST(s AS DOUBLE) / n) * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
          + n_pairs * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
         / (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n) * CAST(s AS DOUBLE))
         * 1000000 + 0.5) / 1000000 AS acf
FROM pairs CROSS JOIN base
ORDER BY lag
""",
    doc="autocorrelation of the daily-revenue series at lags 1..7 — the "
    "seasonality screen behind the resample/forecast family.  The "
    "deviation products expand to EXACT widened-integer moments "
    "(Σxₜxₜ₊ₖ, pairwise-overlap sums, global Σx/Σx²) so no float "
    "crosses rows; the estimator is one mirrored scalar expression "
    "(full-series mean and variance, numerator over overlapping "
    "pairs).  Scale: one day-keyed rollup, a 7-way bounded lag "
    "explode joined day-to-day (calendar-sized, not row-sized), two "
    "1-row reduces.",
)
def e_acf_daily(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("x"))
        .localCheckpoint()  # feeds base + both join sides; pin one eval
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("q"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    pairs = (
        a.join(b, F.col("bd") == F.date_add(F.col("a.d"), F.col("k")))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(dec(F.col("a.x")) * F.col("bx")).alias("p"),
            F.sum("a.x").alias("sa"),
            F.sum("bx").alias("sb"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("s") / F.col("n")
    acf = (
        (d("p") - mean * (d("sa") + d("sb")) + F.col("n_pairs") * (mean * mean))
        / (d("q") - mean * d("s"))
    )
    return (
        pairs.crossJoin(F.broadcast(base))
        .select(
            F.col("k").alias("lag"),
            "n_pairs",
            (F.floor(acf * 1000000 + 0.5) / 1000000).alias("acf"),
        )
        .orderBy("lag")
    )
# ------------------------------------------- day-of-week seasonality
@register(
    "e_dow_seasonality",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS x
  FROM orders GROUP BY d),
dw AS (
  SELECT (CAST(d AS DATE) - DATE '1970-01-05') % 7 AS dow, x FROM daily),
grp AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS q
  FROM dw GROUP BY dow),
tot AS (
  SELECT CAST(SUM(n_days) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS st,
         SUM(q) AS qt,
         SUM(CAST(s AS DOUBLE) * s / n_days) AS fit_ss
  FROM grp)
SELECT dow,
       n_days,
       FLOOR(CAST(s AS DOUBLE) / n_days / 100 * 100 + 0.5) / 100 AS mean_dollars,
       FLOOR((fit_ss - CAST(st AS DOUBLE) * st / n)
             / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
             * 1000000 + 0.5) / 1000000 AS r2_dow
FROM grp CROSS JOIN tot
ORDER BY dow
""",
    doc="day-of-week seasonality of daily revenue: per-dow mean plus the "
    "variance explained by the dow factor (R² of the one-way ANOVA fit, "
    "computed from exact integer group moments — between-group sum of "
    "squares over total, both expanded so no float crosses rows except "
    "the 7-term fit_ss fold).  Day-of-week is epoch-day arithmetic "
    "((d − 1970-01-05) % 7, 0=Monday), NEVER the engines' dayofweek "
    "builtins, whose numbering conventions differ.  Scale: one day "
    "rollup + one 7-group reduce.",
)
def e_dow_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("x")
    )
    dw = daily.select(
        (F.datediff(F.col("d"), F.lit("1970-01-05").cast("date")) % 7).alias("dow"),
        "x",
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    grp = dw.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("q"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    tot = grp.agg(
        F.sum("n_days").alias("n"),
        F.sum("s").alias("st"),
        F.sum("q").alias("qt"),
        F.sum(d("s") * F.col("s") / F.col("n_days")).alias("fit_ss"),
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            (F.floor(d("s") / F.col("n_days") / 100 * 100 + 0.5) / 100).alias(
                "mean_dollars"
            ),
            (
                F.floor(
                    (F.col("fit_ss") - d("st") * F.col("st") / F.col("n"))
                    / (d("qt") - d("st") * F.col("st") / F.col("n"))
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("r2_dow"),
        )
        .orderBy("dow")
    )
# --------------------------------------------- Holt linear-trend smoothing
_HOLT_LEVEL_TAPS = 6  # lags 0..5 of the value
_HOLT_TREND_TAPS = 5  # lags 0..4 of the first difference


def _holt_oracle() -> str:
    lv_num = " + ".join(
        f"COALESCE(v{j}, 0.0) * {0.5 ** j!r}" if j else "v0 * 1.0"
        for j in range(_HOLT_LEVEL_TAPS)
    )
    lv_den = " + ".join(
        f"CASE WHEN v{j} IS NULL THEN 0.0 ELSE {0.5 ** j!r} END" if j else "1.0"
        for j in range(_HOLT_LEVEL_TAPS)
    )
    tr_num = " + ".join(
        f"CASE WHEN v{j + 1} IS NULL THEN 0.0 ELSE (v{j} - v{j + 1}) * {0.5 ** j!r} END"
        for j in range(_HOLT_TREND_TAPS)
    )
    tr_den = " + ".join(
        f"CASE WHEN v{j + 1} IS NULL THEN 0.0 ELSE {0.5 ** j!r} END"
        for j in range(_HOLT_TREND_TAPS)
    )
    lags = ", ".join(
        f"lag(value, {j}) OVER w AS v{j}" for j in range(1, _HOLT_LEVEL_TAPS)
    )
    return f"""
WITH c AS (
  SELECT user_id, value AS v0, {lags},
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rk,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, n_clicks,
         ({lv_num}) / ({lv_den}) AS level_raw,
         CASE WHEN ({tr_den}) = 0.0 THEN 0.0
              ELSE ({tr_num}) / ({tr_den}) END AS trend_raw
  FROM c WHERE rk = 1)
SELECT user_id, n_clicks,
       FLOOR(level_raw * 1000000 + 0.5) / 1000000 AS level,
       FLOOR(trend_raw * 1000000 + 0.5) / 1000000 AS trend,
       FLOOR((level_raw + trend_raw) * 1000000 + 0.5) / 1000000 AS forecast_next
FROM s
ORDER BY user_id
"""


@register(
    "e_holt_trend",
    oracle=_holt_oracle(),
    doc="Holt double-exponential smoothing (level + linear trend) per "
    "user over the click stream, as two bounded FIRs: the level is the "
    "6-tap alpha=1/2 EWMA of the value (same truncation argument as "
    "e_ewma_smooth — the infinite recursion is order-serial unbounded "
    "state, the FIR is a fixed lag window), the trend is the 5-tap "
    "beta=1/2 EWMA of the FIRST DIFFERENCE, and the one-step forecast "
    "is level + trend — the workhorse short-horizon forecaster one "
    "notch above q06_forecast_revenue's naive drift.  Determinism: "
    "every weight 2^-j is an exactly-representable binary double, both "
    "engines fold taps in written order, the quotients and the sum are "
    "single mirrored IEEE expressions, floor-rounded at the end.  "
    "Scale: ONE user-partitioned window pass (lags + count + the "
    "last-row rank share the partition key — never a global sort); "
    "output is one row per active user.",
)
def e_holt_trend(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wp = Window.partitionBy("user_id")
    clicks = load_table(spark, sf, "events").where(F.col("event_type") == "click")
    c = clicks.select(
        "user_id",
        F.col("value").alias("v0"),
        *[F.lag("value", j).over(w).alias(f"v{j}") for j in range(1, _HOLT_LEVEL_TAPS)],
        F.row_number().over(wd).alias("rk"),
        F.count("*").over(wp).alias("n_clicks"),
    ).where(F.col("rk") == 1)
    lv_num = F.col("v0") * 1.0
    lv_den = F.lit(1.0)
    for j in range(1, _HOLT_LEVEL_TAPS):
        lv_num = lv_num + F.coalesce(F.col(f"v{j}"), F.lit(0.0)) * F.lit(0.5 ** j)
        lv_den = lv_den + F.when(F.col(f"v{j}").isNull(), 0.0).otherwise(0.5 ** j)
    tr_num = F.lit(0.0)
    tr_den = F.lit(0.0)
    first = True
    for j in range(_HOLT_TREND_TAPS):
        term = F.when(F.col(f"v{j + 1}").isNull(), 0.0).otherwise(
            (F.col(f"v{j}") - F.col(f"v{j + 1}")) * F.lit(0.5 ** j)
        )
        den = F.when(F.col(f"v{j + 1}").isNull(), 0.0).otherwise(F.lit(0.5 ** j))
        tr_num = term if first else tr_num + term
        tr_den = den if first else tr_den + den
        first = False
    s = c.select(
        "user_id",
        "n_clicks",
        (lv_num / lv_den).alias("level_raw"),
        F.when(tr_den == 0.0, 0.0).otherwise(tr_num / tr_den).alias("trend_raw"),
    )
    r6 = lambda col: F.floor(col * 1000000 + 0.5) / 1000000  # noqa: E731
    return s.select(
        "user_id",
        "n_clicks",
        r6(F.col("level_raw")).alias("level"),
        r6(F.col("trend_raw")).alias("trend"),
        r6(F.col("level_raw") + F.col("trend_raw")).alias("forecast_next"),
    ).orderBy("user_id")
# --------------------------------------------- lead-lag cross-correlation
_XCORR_LAGS = 3


@register(
    "e_cross_correlation",
    oracle=f"""
WITH c AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
           FROM events WHERE event_type = 'click' GROUP BY 1),
p AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
lags AS (SELECT UNNEST(generate_series(-{_XCORR_LAGS}, {_XCORR_LAGS})) AS lag),
j AS (SELECT l.lag, c.x, p.y
      FROM c CROSS JOIN lags l JOIN p ON p.day = c.day + CAST(l.lag AS INT)),
mo AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
              CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
              SUM(CAST(x AS HUGEINT) * y) AS sxy,
              SUM(CAST(x AS HUGEINT) * x) AS sxx,
              SUM(CAST(y AS HUGEINT) * y) AS syy
       FROM j GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, n_days,
       FLOOR((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS xcorr
FROM mo
ORDER BY lag
""",
    doc="lead-lag cross-correlation between the daily click series and "
    "the daily purchase series at lags -3..+3 (does click volume LEAD "
    "purchase volume, and by how many days?) — the attribution-lag "
    "readout marketing teams run before e_attribution_linear assigns "
    "credit.  Pearson r per lag from exact widened-integer moments "
    "(counts, sums, cross products accumulate as integers; the one "
    "float expression is a mirrored IEEE tree, floor-rounded).  Scale: "
    "two map-side-combined daily rollups, a 7-row lag panel crossed "
    "over the calendar-sized click rollup, one date-keyed equi-join, "
    "one partial-agg'd moment reduce per lag.",
)
def e_cross_correlation(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("y"))
    )
    lags = spark.range(1).select(
        F.explode(F.sequence(F.lit(-_XCORR_LAGS), F.lit(_XCORR_LAGS))).alias("lag")
    )
    j = (
        c.crossJoin(F.broadcast(lags))
        .join(
            p.withColumnRenamed("day", "p_day"),
            F.date_add(F.col("day"), F.col("lag")) == F.col("p_day"),
        )
        .select("lag", "x", "y")
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    mo = j.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    nd = F.col("n_days").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        * (nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double"))
    )
    return mo.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        (F.floor(num / den * 1000000 + 0.5) / 1000000).alias("xcorr"),
    ).orderBy("lag")
# --------------------------------------------------- DAU/MAU stickiness
@register(
    "e_stickiness_dau_mau",
    oracle="""
WITH daily AS (
  SELECT CAST(DATE_TRUNC('month', ts) AS DATE) AS month, CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY 1, 2),
per_month AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM daily GROUP BY month),
mau_t AS (
  SELECT CAST(DATE_TRUNC('month', ts) AS DATE) AS month,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM events GROUP BY 1)
SELECT m.month, m.n_days, u.mau,
       FLOOR(CAST(m.sum_dau AS DOUBLE) / m.n_days * 100 + 0.5) / 100 AS dau_avg,
       FLOOR(CAST(m.sum_dau AS DOUBLE) / m.n_days / u.mau * 1000000 + 0.5)
         / 1000000 AS stickiness
FROM per_month m JOIN mau_t u ON u.month = m.month
ORDER BY m.month
""",
    doc="DAU/MAU stickiness per month: average daily active users over "
    "monthly active users — the engagement ratio every consumer product "
    "tracks (1.0 = every monthly user shows up daily).  Exact distinct "
    "counts at both granularities; the two ratios are mirrored IEEE "
    "divisions of exact integers, floor-rounded.  Scale: both rollups "
    "partial-agg on (period, user) before the distinct count — "
    "Catalyst's two-phase distinct — so the shuffle carries one row "
    "per active (day,user) / (month,user), never raw events; the "
    "month-keyed join is calendar-bounded.",
)
def e_stickiness_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    per_month = daily.groupBy("month").agg(
        F.count("*").alias("n_days"), F.sum("dau").alias("sum_dau")
    )
    mau = ev.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    avg_dau = F.col("sum_dau").cast("double") / F.col("n_days")
    return (
        per_month.join(mau, "month")
        .select(
            "month",
            "n_days",
            "mau",
            (F.floor(avg_dau * 100 + 0.5) / 100).alias("dau_avg"),
            (F.floor(avg_dau / F.col("mau") * 1000000 + 0.5) / 1000000).alias(
                "stickiness"
            ),
        )
        .orderBy("month")
    )
# ------------------------------------------------- burst-velocity check
@register(
    "e_burst_velocity",
    oracle="""
WITH ev AS (
  SELECT user_id, CAST(epoch(ts) AS BIGINT) AS sec, event_id FROM events),
burst AS (
  SELECT user_id, event_id,
         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
                             RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_60s
  FROM ev),
peak AS (
  SELECT user_id, MAX(n_60s) AS peak_burst,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM burst GROUP BY user_id)
SELECT user_id, peak_burst, n_events
FROM peak
WHERE peak_burst >= 3
ORDER BY peak_burst DESC, user_id
""",
    doc="burst-velocity screen (the rate-limit / fraud-velocity check): "
    "for every user, the maximum number of events inside ANY trailing "
    "60-second window, flagging users whose peak burst >= 3 — the "
    "primitive behind 'more than N actions per minute' rules, done "
    "exactly rather than by bucketed approximation (a fixed 60 s "
    "tumbling bucket misses bursts straddling the boundary; the RANGE "
    "frame doesn't).  Determinism: the frame is keyed on integer epoch "
    "seconds, COUNT is tie-insensitive, and the per-user MAX collapses "
    "any intra-frame ordering ambiguity.  Scale: ONE user-partitioned "
    "range window + one partial-agg'd rollup; never a global sort.",
)
def e_burst_velocity(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", F.unix_timestamp("ts").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-59, Window.currentRow)
    )
    burst = ev.select("user_id", F.count("*").over(w).alias("n_60s"))
    peak = burst.groupBy("user_id").agg(
        F.max("n_60s").alias("peak_burst"), F.count("*").alias("n_events")
    )
    return (
        peak.where(F.col("peak_burst") >= 3)
        .orderBy(F.col("peak_burst").desc(), "user_id")
    )
# ------------------------------------------------- two-proportion A/B test
@register(
    "e_ab_conversion_test",
    oracle=f"""
WITH pc AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purch
  FROM events GROUP BY user_id),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(n_purch) AS BIGINT) AS total_purch
        FROM pc),
u AS (
  SELECT pc.arm,
         CASE WHEN pc.n_purch * t.n_users > t.total_purch THEN 1 ELSE 0 END
           AS converted
  FROM pc CROSS JOIN tot t),
arms AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c_a,
         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c_b
  FROM u),
z AS (
  SELECT n_a, n_b, c_a, c_b,
         (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
           / SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b)) AS z_raw
  FROM arms)
SELECT n_a, n_b, c_a, c_b,
       FLOOR(CAST(c_a AS DOUBLE) / n_a * 1000000 + 0.5) / 1000000 AS rate_a,
       FLOOR(CAST(c_b AS DOUBLE) / n_b * 1000000 + 0.5) / 1000000 AS rate_b,
       FLOOR(z_raw * 10000 + 0.5) / 10000 AS z_score,
       FLOOR({_ERFC_SQL.format(az="ABS(z_raw)")} * 1000000 + 0.5) / 1000000
         AS p_two_sided,
       {_ERFC_SQL.format(az="ABS(z_raw)")} < 0.05 AS significant
FROM z
""",
    doc="two-proportion test between deterministic user-parity arms on "
    "the above-mean-purchaser flag (converted iff the user's purchase "
    "count exceeds the per-user mean — the comparison n_purch * n_users "
    "> total stays EXACT integer, and unlike raw did-purchase it can't "
    "saturate to all-ones on dense fixtures): pooled-variance z, A&S "
    "erfc two-sided p, 5% verdict — the plain A/B readout between "
    "e_srm_check (validity) and e_cuped_adjust (variance reduction).  "
    "Scale: one user-keyed partial-agg rollup, a 1-row mean panel "
    "crossed back, one 4-cell reduce; statistics on a 1-row panel.",
)
def e_ab_conversion_test(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    pc = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purch"
        )
    ).select("user_id", (F.col("user_id") % 2).alias("arm"), "n_purch")
    tot = pc.agg(
        F.count("*").alias("n_users"), F.sum("n_purch").alias("total_purch")
    )
    u = pc.crossJoin(F.broadcast(tot)).select(
        "arm",
        F.when(
            F.col("n_purch") * F.col("n_users") > F.col("total_purch"), 1
        )
        .otherwise(0)
        .alias("converted"),
    )
    arms = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("c_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z_raw = (
        F.col("c_a").cast("double") / F.col("n_a")
        - F.col("c_b").cast("double") / F.col("n_b")
    ) / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    z = arms.select("n_a", "n_b", "c_a", "c_b", z_raw.alias("z_raw"))
    az = F.abs(F.col("z_raw"))
    s2 = F.sqrt(F.lit(2.0))
    denom = (
        1
        + 0.278393 * az / s2
        + 0.230389 * az * az / 2
        + 0.000972 * F.pow(az / s2, 3)
        + 0.078108 * F.pow(az / s2, 4)
    )
    p = 1 / F.pow(denom, 4)
    return z.select(
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        (F.floor(F.col("c_a").cast("double") / F.col("n_a") * 1000000 + 0.5) / 1000000).alias("rate_a"),
        (F.floor(F.col("c_b").cast("double") / F.col("n_b") * 1000000 + 0.5) / 1000000).alias("rate_b"),
        (F.floor(F.col("z_raw") * 10000 + 0.5) / 10000).alias("z_score"),
        (F.floor(p * 1000000 + 0.5) / 1000000).alias("p_two_sided"),
        (p < 0.05).alias("significant"),
    )
# ------------------------------------------------- behavioral entropy
@register(
    "e_behavior_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY user_id, event_type),
u AS (
  SELECT user_id, CAST(SUM(k) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CAST(FLOOR(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s_klnk_q
  FROM c GROUP BY user_id)
SELECT user_id, n AS n_events, n_types,
       FLOOR((ln(CAST(n AS DOUBLE)) - CAST(s_klnk_q AS DOUBLE) / 1000000 / n)
             * 1000000 + 0.5) / 1000000 AS entropy_nats
FROM u
ORDER BY user_id
""",
    doc="behavioral-diversity score per user: Shannon entropy of the "
    "user's event-type mix via the count identity H = ln(n) - "
    "(sum k*ln k)/n, with each per-type k*ln(k) term QUANTIZED to "
    "integer micro-units before the group sum (the catalog's standard "
    "order-independence convention — float addition is not "
    "associative, so raw double group-sums are not engine-portable "
    "even over 5 terms).  Low entropy = single-purpose "
    "users, high = browsers — the standard engagement-mix feature.  "
    "Scale: two map-side-combined rollups, no joins, no windows.",
)
def e_behavior_entropy(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("k"))
    u = c.groupBy("user_id").agg(
        F.sum("k").alias("n"),
        F.count("*").alias("n_types"),
        F.sum(
            F.floor(
                F.col("k").cast("double") * F.log(F.col("k").cast("double")) * 1000000
                + 0.5
            ).cast("long")
        ).alias("s_klnk_q"),
    )
    return u.select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_types",
        (
            F.floor(
                (
                    F.log(F.col("n").cast("double"))
                    - F.col("s_klnk_q").cast("double") / 1000000 / F.col("n")
                )
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("entropy_nats"),
    ).orderBy("user_id")
# --------------------------------------------------- multi-touch attribution
@register(
    "e_attribution_credit",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS g
  FROM events),
t AS (SELECT * FROM e WHERE event_type IN ('view', 'click', 'signup')),
c AS (SELECT user_id, g FROM e WHERE event_type = 'purchase'),
a AS (SELECT t.user_id, t.g, t.event_type, t.ts, t.event_id
      FROM t JOIN c ON t.user_id = c.user_id AND t.g = c.g),
a2 AS (SELECT event_type,
              COUNT(*) OVER (PARTITION BY user_id, g) AS n_touch,
              ROW_NUMBER() OVER (PARTITION BY user_id, g
                                 ORDER BY ts, event_id) AS rn_asc,
              ROW_NUMBER() OVER (PARTITION BY user_id, g
                                 ORDER BY ts DESC, event_id DESC) AS rn_desc
       FROM a),
by_n AS (SELECT event_type AS channel, n_touch,
                CAST(SUM(CASE WHEN rn_asc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ft,
                CAST(SUM(CASE WHEN rn_desc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS lt,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM a2 GROUP BY 1, 2),
fold AS (SELECT channel,
                CAST(SUM(ft) AS BIGINT) AS first_touch,
                CAST(SUM(lt) AS BIGINT) AS last_touch,
                list({'n': n_touch, 'c': cnt} ORDER BY n_touch) AS l
         FROM by_n GROUP BY channel)
SELECT channel, first_touch, last_touch,
       ROUND(list_reduce(list_transform(l, x -> CAST(x.c AS DOUBLE) / x.n),
                         (p, q) -> p + q), 6) AS linear_credit
FROM fold ORDER BY channel
""",
    doc="multi-touch conversion attribution over user journeys: each "
    "purchase closes a conversion window (touches since the user's "
    "previous purchase), and the view/click/signup touches inside it "
    "earn credit under the three standard models — first-touch, "
    "last-touch (one credit to the window's first/last touch) and "
    "linear (1/n_touch to every touch).  The window key is a cumulative "
    "count of PRIOR purchases per user, so grouping is one window "
    "function, not a per-conversion scan.  Determinism: window order is "
    "the total (ts, event_id) order; first/last are exact integers; "
    "linear credit is folded LEFT-TO-RIGHT over the (n_touch, count) "
    "panel sorted by n_touch — cross-engine identical doubles, never a "
    "float sum in engine-chosen row order.  Scale: one user-keyed "
    "window pass + one channel-keyed aggregate; the fold panel is "
    "bounded by DISTINCT window sizes, not by events.",
)
def e_attribution_credit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w_before = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = F.coalesce(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
            w_before
        ),
        F.lit(0),
    ).cast("long")
    e = ev.select("user_id", "ts", "event_id", "event_type", g.alias("g"))
    touches = e.where(F.col("event_type").isin("view", "click", "signup"))
    convs = e.where(F.col("event_type") == "purchase").select("user_id", "g")
    a = touches.join(convs, ["user_id", "g"])
    wg = Window.partitionBy("user_id", "g")
    a2 = a.select(
        "event_type",
        F.count(F.lit(1)).over(wg).alias("n_touch"),
        F.row_number()
        .over(Window.partitionBy("user_id", "g").orderBy("ts", "event_id"))
        .alias("rn_asc"),
        F.row_number()
        .over(
            Window.partitionBy("user_id", "g").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
        )
        .alias("rn_desc"),
    )
    by_n = a2.groupBy(F.col("event_type").alias("channel"), "n_touch").agg(
        F.sum(F.when(F.col("rn_asc") == 1, 1).otherwise(0)).alias("ft"),
        F.sum(F.when(F.col("rn_desc") == 1, 1).otherwise(0)).alias("lt"),
        F.count(F.lit(1)).alias("cnt"),
    )
    fold = by_n.groupBy("channel").agg(
        F.sum("ft").alias("first_touch"),
        F.sum("lt").alias("last_touch"),
        F.sort_array(F.collect_list(F.struct("n_touch", "cnt"))).alias("l"),
    )
    linear = F.aggregate(
        F.transform(F.col("l"), lambda x: x["cnt"].cast("double") / x["n_touch"]),
        F.lit(0.0),
        lambda p, q: p + q,
    )
    return fold.select(
        "channel",
        "first_touch",
        "last_touch",
        F.round(linear, 6).alias("linear_credit"),
    ).orderBy("channel")
# ------------------------------------------------ sequential pattern mining
@register(
    "e_seq_patterns",
    oracle="""
WITH l AS (
  SELECT user_id, event_type AS a,
         LEAD(event_type, 1) OVER w AS b1,
         LEAD(event_type, 2) OVER w AS b2,
         LEAD(event_type, 3) OVER w AS b3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (
  SELECT user_id, a, b1 AS b FROM l WHERE b1 IS NOT NULL
  UNION ALL SELECT user_id, a, b2 FROM l WHERE b2 IS NOT NULL
  UNION ALL SELECT user_id, a, b3 FROM l WHERE b3 IS NOT NULL)
SELECT a AS antecedent, b AS consequent,
       CAST(COUNT(*) AS BIGINT) AS occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_support
FROM p GROUP BY 1, 2
ORDER BY user_support DESC, occurrences DESC, antecedent, consequent
""",
    doc="gap-constrained sequential pattern mining (the length-2 "
    "GSP/PrefixSpan counting step): ordered event-type pairs 'a then b "
    "within the next 3 events' per user, with occurrence counts and "
    "distinct-user support — the sequence-rule complement of "
    "q_market_basket's unordered co-occurrence and e_markov_transitions' "
    "adjacent-only transitions.  The gap bound is the scale contract: "
    "pairs come from 3 LEAD columns in ONE user-keyed window pass "
    "(work O(gap x events), never the quadratic all-ordered-pairs "
    "blowup), then one pair-keyed aggregate; support is exact "
    "count-distinct.  All integers — no float determinism surface.",
)
def e_seq_patterns(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = ev.select(
        "user_id",
        F.col("event_type").alias("a"),
        *[F.lead("event_type", d).over(w).alias(f"b{d}") for d in (1, 2, 3)],
    )
    p = None
    for d in (1, 2, 3):
        part = l.where(F.col(f"b{d}").isNotNull()).select(
            "user_id", "a", F.col(f"b{d}").alias("b")
        )
        p = part if p is None else p.unionAll(part)
    return (
        p.groupBy(F.col("a").alias("antecedent"), F.col("b").alias("consequent"))
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("user_id").alias("user_support"),
        )
        .orderBy(
            F.col("user_support").desc(),
            F.col("occurrences").desc(),
            "antecedent",
            "consequent",
        )
    )
# ----------------------------------------------- difference-in-differences
@register(
    "e_diff_in_diff",
    oracle=f"""
WITH span AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
              FROM events),
treated AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
p AS (
  SELECT e.user_id,
         CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treated,
         CASE WHEN epoch_us(e.ts) >= span.mid THEN 1 ELSE 0 END AS post,
         CAST(ROUND(e.value * 100) AS BIGINT) AS cents
  FROM events e
  LEFT JOIN treated t ON e.user_id = t.user_id
  CROSS JOIN span
  WHERE e.event_type = 'purchase'),
cells AS (
  SELECT treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM p GROUP BY 1, 2),
wide AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(total_cents AS DOUBLE) / n END) AS t_pre,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(total_cents AS DOUBLE) / n END) AS t_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(total_cents AS DOUBLE) / n END) AS c_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(total_cents AS DOUBLE) / n END) AS c_post,
    CAST(SUM(n) AS BIGINT) AS n_purchases
  FROM cells)
SELECT n_purchases,
       ROUND(t_pre, 6) AS treated_pre,
       ROUND(t_post, 6) AS treated_post,
       ROUND(c_pre, 6) AS control_pre,
       ROUND(c_post, 6) AS control_post,
       ROUND((t_post - t_pre) - (c_post - c_pre), 6) AS did_cents
FROM wide
""",
    doc="difference-in-differences estimator: treated = users who ever "
    "signed up, periods split at the corpus time midpoint, outcome = "
    "mean purchase value (exact integer cents) — DiD = (treated_post - "
    "treated_pre) - (control_post - control_pre), the parallel-trends "
    "causal-effect workhorse (Card & Krueger 1994) that e_event_study "
    "(around-event windows) and e_cuped_adjust (variance reduction) "
    "bracket.  Determinism: every cell is an exact bigint (count, "
    "cent-sum); the four means are single integer/integer IEEE "
    "divisions folded into one closed-form expression.  Scale: one "
    "broadcast semi-join for treatment status (the signup key set is "
    "tiny), one 1-row time-span panel, one 4-cell aggregate — "
    "map-side-combined end to end, output is ONE row.",
)
def e_diff_in_diff(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.panels import attach_scalar_panel

    ev = load_table(spark, sf, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    span = ev.agg(((F.min(us) + F.max(us)) / F.lit(2)).cast("long").alias("mid"))
    treated = ev.where(F.col("event_type") == "signup").select("user_id").distinct()
    purchases = ev.where(F.col("event_type") == "purchase")
    p = (
        attach_scalar_panel(purchases, span)
        .join(
            F.broadcast(treated.withColumn("__t", F.lit(1))), "user_id", "left"
        )
        .select(
            F.coalesce("__t", F.lit(0)).alias("treated"),
            F.when(us >= F.col("mid"), 1).otherwise(0).alias("post"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    cells = p.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total_cents")
    )

    def cell(tr, po):
        return F.max(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po),
                F.col("total_cents").cast("double") / F.col("n"),
            )
        )

    wide = cells.agg(
        cell(1, 0).alias("t_pre"),
        cell(1, 1).alias("t_post"),
        cell(0, 0).alias("c_pre"),
        cell(0, 1).alias("c_post"),
        F.sum("n").alias("n_purchases"),
    )
    return wide.select(
        "n_purchases",
        F.round("t_pre", 6).alias("treated_pre"),
        F.round("t_post", 6).alias("treated_post"),
        F.round("c_pre", 6).alias("control_pre"),
        F.round("c_post", 6).alias("control_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")),
            6,
        ).alias("did_cents"),
    )


# ------------------------------------------ daily-revenue Fourier panel
_FOURIER_HARMONICS = 3


@register(
    "e_fourier_harmonics",
    oracle=f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
p AS (SELECT list({{'day': day, 'cents': cents}} ORDER BY day) AS l,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM d),
h AS (SELECT n, unnest(generate_series(1, {_FOURIER_HARMONICS})) AS k, l, total FROM p),
c AS (SELECT n, k,
             list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, CAST(n AS INT)), i ->
                 (l[i].cents - total * 1.0 / n) * COS(2 * PI() * k * (i - 1) / n))),
               (a, b) -> a + b) AS re,
             list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, CAST(n AS INT)), i ->
                 (l[i].cents - total * 1.0 / n) * SIN(2 * PI() * k * (i - 1) / n))),
               (a, b) -> a + b) AS im
      FROM h)
SELECT CAST(k AS INT) AS harmonic,
       FLOOR(SQRT(re * re + im * im) * 2 / n / 100 * 100 + 0.5) / 100
         AS amplitude_dollars,
       FLOOR((ATAN2(im, re)) * 10000 + 0.5) / 10000 AS phase
FROM c
ORDER BY harmonic
""",
    doc="discrete-Fourier harmonic panel of the mean-centered daily "
    "revenue series: amplitude (in dollars) and phase of the first 3 "
    "harmonics over the observed day span — the frequency-domain "
    "companion to e_acf_daily/e_dow_seasonality (a strong weekly cycle "
    "surfaces as energy at k ≈ n_days/7).  Determinism: daily cents "
    "are exact bigints; each DFT coefficient is a LEFT-TO-RIGHT fold "
    "over the day-sorted cell panel (sort_array + F.aggregate vs "
    "list(ORDER BY) + list_reduce with a prepended 0.0 — identical "
    "fold trees), so the float cos/sin accumulation is bit-identical "
    "on both engines.  Scale: the corpus reduces to <=n_days cells in "
    "one partial-agg'd shuffle; the O(K*n_days) fold runs in a 1-row "
    "panel — K and the day count bound it regardless of order volume.",
)
def e_fourier_harmonics(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.panels import prefix_panel

    o = load_table(spark, sf, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("cents")
    )
    pan = prefix_panel(d, ["day", "cents"], ["cents"])
    base = pan.select(
        "l", F.size("l").cast("long").alias("n"), F.col("tot_cents").alias("total")
    )
    h = base.select(
        "l",
        "n",
        "total",
        F.explode(F.sequence(F.lit(1), F.lit(_FOURIER_HARMONICS))).alias("k"),
    )
    mean = F.col("total") * 1.0 / F.col("n")
    two_pi = 2 * 3.141592653589793

    def fold(trig):
        return F.aggregate(
            F.sequence(F.lit(1), F.size("l")),
            F.lit(0.0),
            lambda acc, i: acc
            + (F.element_at(F.col("l"), i)["cents"] - mean)
            * trig(F.lit(two_pi) * F.col("k") * (i - 1) / F.col("n")),
        )

    c = h.select("n", "k", fold(F.cos).alias("re"), fold(F.sin).alias("im"))
    return c.select(
        F.col("k").cast("int").alias("harmonic"),
        (
            F.floor(
                F.sqrt(F.col("re") * F.col("re") + F.col("im") * F.col("im"))
                * 2 / F.col("n") / 100 * 100
                + 0.5
            )
            / 100
        ).alias("amplitude_dollars"),
        (F.floor(F.atan2(F.col("im"), F.col("re")) * 10000 + 0.5) / 10000).alias(
            "phase"
        ),
    ).orderBy("harmonic")


# ------------------------------------------ retention half-life fit
@register(
    "e_retention_halflife",
    oracle="""
WITH u AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events GROUP BY user_id, CAST(ts AS DATE)),
f AS (SELECT user_id, MIN(d) AS first_d FROM u GROUP BY user_id),
o AS (SELECT u.user_id, CAST((u.d - f.first_d) // 7 AS BIGINT) AS wk
      FROM u JOIN f ON u.user_id = f.user_id),
c AS (SELECT wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM o GROUP BY wk),
base AS (SELECT MAX(CASE WHEN wk = 0 THEN n END) AS n0 FROM c),
pts AS (SELECT wk, n, n * 1.0 / b.n0 AS rate
        FROM c CROSS JOIN base b WHERE wk >= 1 AND n > 0),
p AS (SELECT list({'wk': wk, 'n': n, 'rate': rate} ORDER BY wk) AS l FROM pts),
m AS (SELECT len(l) AS k, l,
             list_reduce(list_prepend(0.0, list_transform(l, c -> CAST(c.wk AS DOUBLE))), (a, b) -> a + b) AS sx,
             list_reduce(list_prepend(0.0, list_transform(l, c -> LN(c.rate))), (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(0.0, list_transform(l, c -> CAST(c.wk AS DOUBLE) * c.wk)), (a, b) -> a + b) AS sxx,
             list_reduce(list_prepend(0.0, list_transform(l, c -> CAST(c.wk AS DOUBLE) * LN(c.rate))), (a, b) -> a + b) AS sxy
      FROM p),
fit AS (SELECT k, (k * sxy - sx * sy) / (k * sxx - sx * sx) AS beta,
               (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k AS alpha
        FROM m WHERE k >= 2 AND k * sxx - sx * sx > 0)
SELECT CAST(k AS BIGINT) AS n_points,
       FLOOR(beta * 1000000 + 0.5) / 1000000 AS decay_per_week,
       FLOOR(EXP(alpha) * 1000000 + 0.5) / 1000000 AS week1_level,
       CASE WHEN beta < 0 THEN FLOOR(-LN(2) / beta * 10000 + 0.5) / 10000 END
         AS half_life_weeks
FROM fit
""",
    doc="retention half-life: collapse the cohort matrix over cohorts "
    "(distinct active users per week-offset from each user's first "
    "week), fit ln(retention rate) ~ offset by closed-form OLS, and "
    "report the exponential decay rate and its half-life in weeks — "
    "the single-number summary product teams quote from e_retention's "
    "full matrix.  Refuses (no row) with fewer than 2 usable offsets "
    "or zero x-variance, and half-life is NULL unless the fitted decay "
    "is actually negative — a growing 'retention' curve has no "
    "half-life and inventing one would be a wrong answer.  "
    "Determinism: user/week counts are exact; the four OLS moments "
    "fold LEFT-TO-RIGHT over the offset-sorted panel (ln once per "
    "cell, bounded cells).  Scale: one (user, day) dedup shuffle, one "
    "user-keyed first-week join, one offset rollup — the log-linear "
    "fit sees <= observed-weeks rows.",
)
def e_retention_halflife(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    u = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    f = u.groupBy("user_id").agg(F.min("d").alias("first_d"))
    o = u.join(f, "user_id").select(
        "user_id", (F.datediff("d", "first_d") / 7).cast("long").alias("wk")
    )
    c = o.groupBy("wk").agg(F.countDistinct("user_id").alias("n"))
    base = c.agg(F.max(F.when(F.col("wk") == 0, F.col("n"))).alias("n0"))
    pts = (
        c.crossJoin(F.broadcast(base))
        .where((F.col("wk") >= 1) & (F.col("n") > 0))
        .select("wk", "n", (F.col("n") * 1.0 / F.col("n0")).alias("rate"))
    )
    pan = pts.agg(F.sort_array(F.collect_list(F.struct("wk", "n", "rate"))).alias("l"))

    def fold(expr):
        return F.aggregate(F.col("l"), F.lit(0.0), lambda a, c: a + expr(c))

    m = pan.select(
        F.size("l").alias("k"),
        fold(lambda c: c["wk"].cast("double")).alias("sx"),
        fold(lambda c: F.log(c["rate"])).alias("sy"),
        fold(lambda c: c["wk"].cast("double") * c["wk"]).alias("sxx"),
        fold(lambda c: c["wk"].cast("double") * F.log(c["rate"])).alias("sxy"),
    )
    k, sx, sy, sxx, sxy = [F.col(col) for col in ("k", "sx", "sy", "sxx", "sxy")]
    beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    alpha = (sy - beta * sx) / k
    fit = m.where((k >= 2) & (k * sxx - sx * sx > 0)).select(
        k.alias("k"), beta.alias("beta"), alpha.alias("alpha")
    )
    b = F.col("beta")
    return fit.select(
        F.col("k").cast("long").alias("n_points"),
        (F.floor(b * 1000000 + 0.5) / 1000000).alias("decay_per_week"),
        (F.floor(F.exp(F.col("alpha")) * 1000000 + 0.5) / 1000000).alias(
            "week1_level"
        ),
        F.when(b < 0, F.floor(-F.log(F.lit(2.0)) / b * 10000 + 0.5) / 10000).alias(
            "half_life_weeks"
        ),
    )


# ------------------------------------------------------ Welch's t-test
@register(
    "e_welch_ttest",
    oracle="""
WITH v AS (
  SELECT CASE WHEN ISODOW(ts) <= 5 THEN 'weekday' ELSE 'weekend' END AS bucket,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
agg AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(cents AS HUGEINT)) AS s1,
         SUM(CAST(cents AS HUGEINT) * cents) AS s2
  FROM v GROUP BY bucket),
w AS (SELECT
        MAX(CASE WHEN bucket = 'weekday' THEN n END) AS n1,
        MAX(CASE WHEN bucket = 'weekday' THEN s1 END) AS a1,
        MAX(CASE WHEN bucket = 'weekday' THEN s2 END) AS a2,
        MAX(CASE WHEN bucket = 'weekend' THEN n END) AS n2,
        MAX(CASE WHEN bucket = 'weekend' THEN s1 END) AS b1,
        MAX(CASE WHEN bucket = 'weekend' THEN s2 END) AS b2
      FROM agg),
d AS (SELECT n1, n2,
             CAST(a1 AS DOUBLE) / n1 AS m1, CAST(b1 AS DOUBLE) / n2 AS m2,
             (CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1) / (n1 - 1) AS v1,
             (CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE) * b1 / n2) / (n2 - 1) AS v2
      FROM w),
t AS (SELECT n1, n2, m1, m2, v1, v2,
             v1 / n1 + v2 / n2 AS se2,
             (m1 - m2) / SQRT(v1 / n1 + v2 / n2) AS t_raw
      FROM d)
SELECT n1 AS n_weekday, n2 AS n_weekend,
       FLOOR(m1 / 100 * 10000 + 0.5) / 10000 AS mean_weekday,
       FLOOR(m2 / 100 * 10000 + 0.5) / 10000 AS mean_weekend,
       FLOOR(t_raw * 10000 + 0.5) / 10000 AS t_stat,
       FLOOR(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                          + (v2 / n2) * (v2 / n2) / (n2 - 1)) * 100 + 0.5) / 100
         AS dof_welch,
       FLOOR({erfc} * 1000000 + 0.5) / 1000000 AS p_normal_approx
FROM t
""".replace("{erfc}", _ERFC_SQL.format(az="ABS(t_raw)")),
    doc="Welch's unequal-variance t-test (Welch 1947) on purchase value, "
    "weekday vs weekend — the 2-group continuous-metric companion to "
    "e_ab_conversion_test (proportions) and q_anova_oneway (k groups, "
    "pooled variance): Welch never assumes equal variances, which is "
    "the safe default for skewed spend metrics.  Means/variances come "
    "from exact HUGEINT/decimal cent moment sums; t, the Welch-"
    "Satterthwaite dof, and the large-dof normal-approximation p (A&S "
    "7.1.25 erfc — the suite's shared, documented approximation) are "
    "mirrored float trees evaluated once per engine.  Scale: one "
    "event-scan partial aggregate to two cells; 1-row arithmetic "
    "after.",
)
def e_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    v = ev.where(F.col("event_type") == "purchase").select(
        F.when(F.dayofweek("ts").isin(2, 3, 4, 5, 6), "weekday")
        .otherwise("weekend")
        .alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = v.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("cents"))).alias("s1"),
        F.sum(dec(F.col("cents")) * F.col("cents")).alias("s2"),
    )
    pick = lambda b, c: F.max(F.when(F.col("bucket") == b, F.col(c)))  # noqa: E731
    w = agg.agg(
        pick("weekday", "n").alias("n1"),
        pick("weekday", "s1").alias("a1"),
        pick("weekday", "s2").alias("a2"),
        pick("weekend", "n").alias("n2"),
        pick("weekend", "s1").alias("b1"),
        pick("weekend", "s2").alias("b2"),
    )
    d = w.select(
        "n1",
        "n2",
        (F.col("a1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("b1").cast("double") / F.col("n2")).alias("m2"),
        (
            (
                F.col("a2").cast("double")
                - F.col("a1").cast("double") * F.col("a1") / F.col("n1")
            )
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (
                F.col("b2").cast("double")
                - F.col("b1").cast("double") * F.col("b1") / F.col("n2")
            )
            / (F.col("n2") - 1)
        ).alias("v2"),
    )
    t = d.select(
        "n1",
        "n2",
        "m1",
        "m2",
        "v1",
        "v2",
        (F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")).alias("se2"),
        (
            (F.col("m1") - F.col("m2"))
            / F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2"))
        ).alias("t_raw"),
    )
    az = F.abs(F.col("t_raw"))
    s2r = F.sqrt(F.lit(2.0))
    denom = (
        1
        + 0.278393 * az / s2r
        + 0.230389 * az * az / 2
        + 0.000972 * F.pow(az / s2r, 3)
        + 0.078108 * F.pow(az / s2r, 4)
    )
    vn1 = F.col("v1") / F.col("n1")
    vn2 = F.col("v2") / F.col("n2")
    return t.select(
        F.col("n1").alias("n_weekday"),
        F.col("n2").alias("n_weekend"),
        (F.floor(F.col("m1") / 100 * 10000 + 0.5) / 10000).alias("mean_weekday"),
        (F.floor(F.col("m2") / 100 * 10000 + 0.5) / 10000).alias("mean_weekend"),
        (F.floor(F.col("t_raw") * 10000 + 0.5) / 10000).alias("t_stat"),
        (
            F.floor(
                F.col("se2")
                * F.col("se2")
                / (vn1 * vn1 / (F.col("n1") - 1) + vn2 * vn2 / (F.col("n2") - 1))
                * 100
                + 0.5
            )
            / 100
        ).alias("dof_welch"),
        (F.floor((1 / F.pow(denom, 4)) * 1000000 + 0.5) / 1000000).alias(
            "p_normal_approx"
        ),
    )
