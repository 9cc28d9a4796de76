"""Round-3 scale-operations suite: data-layout planning and corpus
governance — the table-maintenance and provenance jobs a 100 TB
deployment runs CONTINUOUSLY, not the queries it serves.

* ``x_zorder_layout`` — multi-dimensional Z-order clustering audit: the
  data-skipping layout Delta/Iceberg ``OPTIMIZE ZORDER BY`` provides,
  re-expressed as plain integer arithmetic so the file-span benefit is
  measurable (and oracle-checkable) in any engine.
* ``x_compaction_plan`` — small-file compaction planning as a prefix-sum
  bin-packing over segment sizes (reuses ``operators/packing``'s
  two-phase distributed prefix machinery in a second context).
* ``e_attribution_linear`` — multi-touch revenue attribution (linear
  model) over the events stream, with integer micro-unit accounting so
  the float split stays engine-portable.
* ``d_cross_source_leakage`` — which corpus sources copy from each
  other: the cross-source verbatim-overlap matrix from 8-token span
  fingerprints (the governance rollup of the Lee et al. 2022 span-dedup
  machinery in ``d_duplicate_spans``).

Registered after ``curation`` in ``load_all`` so older never-sampled
queries keep their place at the head of the driver's budgeted walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64_sql
from ..functions.text import tokens
from ..tables import load_table
from . import register

# --------------------------------------------------------------- Z-order
_ZBITS = 8  # 8 bits per dimension -> 16-bit z-value -> 256 z-ranges max


def _interleave_sql(x: str, y: str) -> str:
    """16-bit Morton code from two 8-bit ints — identical arithmetic text
    for DuckDB (operators ``>>``/``&`` shared with Spark's oracle twin
    below via per-engine rendering)."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def _interleave_col(x, y):
    """Spark twin of :func:`_interleave_sql` — same bit plan, same
    fixed-order integer sum (order-independent anyway: ints are exact)."""
    total = F.lit(0).cast("long")
    for i in range(_ZBITS):
        total = total + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        total = total + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
    return total


_ZFILES = 16  # target file count for the audit layout


@register(
    "x_zorder_layout",
    oracle=f"""
WITH p AS (
  SELECT CAST(MIN(CAST(l_shipdate AS DATE)) AS DATE) AS d0,
         date_diff('day', MIN(CAST(l_shipdate AS DATE)), MAX(CAST(l_shipdate AS DATE))) AS dspan,
         MIN(l_partkey) AS pk0,
         MAX(l_partkey) - MIN(l_partkey) AS pkspan
  FROM lineitem),
b AS (
  SELECT CAST(l_shipdate AS DATE) AS ship_d, l_partkey,
         CAST(FLOOR(date_diff('day', p.d0, CAST(l_shipdate AS DATE)) * 256.0
                    / (p.dspan + 1)) AS BIGINT) AS dx,
         CAST(FLOOR((l_partkey - p.pk0) * 256.0 / (p.pkspan + 1)) AS BIGINT) AS dp
  FROM lineitem CROSS JOIN p),
z AS (SELECT ship_d, l_partkey,
             ({_interleave_sql("dx", "dp")}) AS zval
      FROM b)
SELECT CAST(zval // {65536 // _ZFILES} AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       strftime(MIN(ship_d), '%Y-%m-%d') AS min_ship,
       strftime(MAX(ship_d), '%Y-%m-%d') AS max_ship,
       CAST(MIN(l_partkey) AS BIGINT) AS min_pk,
       CAST(MAX(l_partkey) AS BIGINT) AS max_pk,
       CAST(date_diff('day', MIN(ship_d), MAX(ship_d)) AS BIGINT) AS ship_span_days,
       CAST(MAX(l_partkey) - MIN(l_partkey) AS BIGINT) AS pk_span
FROM z
GROUP BY 1
ORDER BY file_id
""",
    doc="Z-order (Morton-curve) clustering audit over lineitem on "
    "(ship date, part key): both dimensions quantize to 8-bit lattice "
    "coordinates (via a 1-row min/max panel), interleave into a 16-bit "
    "z-value, and rows land in 16 equal z-range files.  The per-file "
    "min/max spans of BOTH dimensions are the payoff metric — a "
    "single-column sort bounds one dimension and leaves the other "
    "full-range, while the z-layout bounds both, which is exactly why "
    "lakehouse OPTIMIZE ZORDER exists (file-skipping works for date "
    "predicates AND part predicates from one layout).  The WRITE path "
    "lives in operators/layout.zorder_value / write_zordered (same "
    "Morton construction, N columns, optional known-bounds fast path); "
    "this query is its differential AUDIT twin — panel-broadcast stats "
    "(no driver action) and pure integer arithmetic so DuckDB replays "
    "the layout bit-for-bit.  At 100 TB: repartitionByRange(zval) + "
    "sortWithinPartitions + write.  "
    "Determinism: pure integer bit arithmetic after FLOOR quantization "
    "— hash-checkable bit-for-bit.  Scale: one scan, a 1-row broadcast "
    "panel, one partial-agg'd rollup to <= 16 file rows.",
)
def x_zorder(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        F.to_date("l_shipdate").alias("ship_d"), "l_partkey"
    )
    p = li.agg(
        F.min("ship_d").alias("d0"),
        F.datediff(F.max("ship_d"), F.min("ship_d")).alias("dspan"),
        F.min("l_partkey").alias("pk0"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("pkspan"),
    )
    b = li.crossJoin(F.broadcast(p)).select(
        "ship_d",
        "l_partkey",
        F.floor(
            F.datediff(F.col("ship_d"), F.col("d0")) * 256.0 / (F.col("dspan") + 1)
        ).alias("dx"),
        F.floor(
            (F.col("l_partkey") - F.col("pk0")) * 256.0 / (F.col("pkspan") + 1)
        ).alias("dp"),
    )
    z = b.select(
        "ship_d", "l_partkey", _interleave_col(F.col("dx"), F.col("dp")).alias("zval")
    )
    return (
        z.groupBy((F.col("zval") / (65536 // _ZFILES)).cast("long").alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.date_format(F.min("ship_d"), "yyyy-MM-dd").alias("min_ship"),
            F.date_format(F.max("ship_d"), "yyyy-MM-dd").alias("max_ship"),
            F.min("l_partkey").cast("long").alias("min_pk"),
            F.max("l_partkey").cast("long").alias("max_pk"),
            F.datediff(F.max("ship_d"), F.min("ship_d")).cast("long").alias(
                "ship_span_days"
            ),
            (F.max("l_partkey") - F.min("l_partkey")).cast("long").alias("pk_span"),
        )
        .orderBy("file_id")
    )


# ----------------------------------------------------- compaction planner
_COMPACT_TARGET = 10_000  # rows per output file (proxy for target bytes)


@register(
    "x_compaction_plan",
    oracle=f"""
WITH seg AS (
  SELECT (CAST(strftime(l_shipdate, '%Y') AS BIGINT) * 12
          + CAST(strftime(l_shipdate, '%m') AS BIGINT) - 1) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1),
pre AS (
  SELECT m, n_rows,
         COALESCE(SUM(n_rows) OVER (ORDER BY m
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM seg),
binned AS (SELECT m, n_rows, CAST(prefix // {_COMPACT_TARGET} AS BIGINT) AS bin FROM pre)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(n_rows) AS BIGINT) AS total_rows,
       CAST(MIN(m) // 12 AS BIGINT) AS first_year,
       CAST(MIN(m) % 12 + 1 AS BIGINT) AS first_month,
       CAST(MAX(m) // 12 AS BIGINT) AS last_year,
       CAST(MAX(m) % 12 + 1 AS BIGINT) AS last_month
FROM binned
GROUP BY bin
ORDER BY bin
""",
    doc="small-file compaction planning: month-partition segments are "
    "bin-packed into ~{target}-row output files by NEXT-FIT over the "
    "exclusive prefix sum of segment sizes (bin = prefix DIV target — "
    "each segment lands in the bin where its first row falls, the "
    "deterministic one-pass packing a table-maintenance service "
    "actually ships).  This is the OPTIMIZE/compaction planner every "
    "lakehouse table needs continuously at 100 TB: thousands of tiny "
    "ingest files -> bounded file count with time-adjacent data "
    "co-located (bins are contiguous month ranges, so time-range "
    "pruning survives compaction; the WRITE path is operators/layout."
    "write_compacted).  The prefix sum is the two-phase "
    "distributed machinery (operators/packing.with_prefix_sum: range "
    "partition + local windows + bounded offsets broadcast) — NEVER a "
    "single-partition window, even though the segment table is small "
    "here, because at a million files it isn't.  Scale: one "
    "partial-agg'd rollup to |segments| rows, two bounded shuffles for "
    "the prefix, one rollup to |bins|.".replace("{target}", str(_COMPACT_TARGET)),
)
def x_compaction(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import with_prefix_sum

    seg = (
        load_table(spark, sf, "lineitem")
        .groupBy(
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).cast("long").alias("m")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    pre = with_prefix_sum(seg, order_col="m", value_col="n_rows", out_col="prefix")
    binned = pre.select(
        "m", "n_rows", (F.col("prefix") / _COMPACT_TARGET).cast("long").alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.expr("MIN(m) DIV 12").cast("long").alias("first_year"),
            (F.min("m") % 12 + 1).cast("long").alias("first_month"),
            F.expr("MAX(m) DIV 12").cast("long").alias("last_year"),
            (F.max("m") % 12 + 1).cast("long").alias("last_month"),
        )
        .orderBy("bin")
    )


# ----------------------------------------------- multi-touch attribution
@register(
    "e_attribution_linear",
    oracle="""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts, value
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id, event_id AS touch_id, event_type, ts
  FROM events WHERE event_type IN ('view', 'click')),
hits AS (
  SELECT c.conv_id, c.value, t.event_type
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.ts >= c.conv_ts - INTERVAL 1 HOUR AND t.ts < c.conv_ts),
n AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches FROM hits GROUP BY conv_id),
credit AS (
  SELECT h.event_type,
         CAST(FLOOR(h.value * 1000000 / n.n_touches) AS BIGINT) AS micro
  FROM hits h JOIN n ON h.conv_id = n.conv_id)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_credits,
       ROUND(SUM(micro) / 1000000.0, 6) AS attributed_value
FROM credit
GROUP BY event_type
ORDER BY event_type
""",
    doc="linear multi-touch attribution: every purchase's value is split "
    "EQUALLY across the same user's view/click touchpoints in the "
    "preceding hour — the standard alternative to last-touch that "
    "marketing/ads pipelines reconcile revenue with.  Exactness: each "
    "touch's share is floored to integer MICRO-units before summation "
    "(FLOOR(value*1e6/n) — identical IEEE division then exact bigint "
    "sums), so the rollup is engine-portable bit-for-bit where a raw "
    "float SUM over engine-ordered rows would not be.  Scale: the "
    "conversions relation is a filtered sliver — it broadcasts into the "
    "touch scan as a user-key equi-join with the hour-range residual "
    "(the e_interval_join family); per-conversion touch counts roll up "
    "to |conversions| rows; everything else is a |event_types|-row agg.  "
    "The broadcast hints assume purchase-rate selectivity (the usual "
    "sub-1% case); for conversion-heavy workloads drop them — both "
    "joins carry an equality key (user_id / conv_id), so they degrade "
    "to co-partitioned shuffle joins, never to a cartesian.",
)
def e_attribution(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("conv_ts"),
        "value",
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", "ts"
    )
    hits = touch.join(
        F.broadcast(conv),
        (F.col("user_id") == F.col("c_user"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("ts") < F.col("conv_ts")),
    ).select("conv_id", "value", "event_type")
    n = hits.groupBy("conv_id").agg(F.count(F.lit(1)).cast("long").alias("n_touches"))
    credit = hits.join(F.broadcast(n), "conv_id").select(
        "event_type",
        F.floor(F.col("value") * 1000000 / F.col("n_touches")).cast("long").alias("micro"),
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            F.round(F.sum("micro") / 1000000.0, 6).alias("attributed_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------- cross-source leakage matrix
@register(
    "d_cross_source_leakage",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
           AS t
  FROM documents),
g AS (
  SELECT source,
         unnest(list_transform(generate_series(1, len(t)-7),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                                    t[i+4], t[i+5], t[i+6], t[i+7]))) AS gram
  FROM toks WHERE len(t) >= 8),
d AS (SELECT DISTINCT {portable_hash64_sql("gram")} AS h, source FROM g),
p AS (SELECT a.source AS src_a, b.source AS src_b
      FROM d a JOIN d b ON a.h = b.h AND a.source < b.source)
SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM p
GROUP BY src_a, src_b
HAVING COUNT(*) >= 5
ORDER BY n_shared_grams DESC, src_a, src_b
""",
    doc="cross-source verbatim-leakage matrix: for every pair of corpus "
    "sources, how many distinct 8-token spans they share — the "
    "provenance governance readout that catches mirror sites, syndicated "
    "boilerplate, and license-block propagation BEFORE per-document "
    "dedup decisions are made (a source pair with massive overlap wants "
    "a source-level policy, not a million pairwise verdicts).  Same "
    "span fingerprints as d_duplicate_spans (Lee et al. 2022, n-gram "
    "formulation).  Scale: the exploded gram stream reduces to DISTINCT "
    "(hash, source) — at most |sources| rows per gram — so the "
    "inverted-index self-join output is bounded by collisions x "
    "|sources|^2, never documents^2; one partial-agg'd rollup to the "
    "<= |sources|^2/2 matrix.",
)
def d_cross_source(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf, "documents")
    t = docs.select("source", tokens("text").alias("t")).where(F.size("t") >= 8)
    grams = t.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)-7), i -> concat_ws(' ', slice(t, i, 8)))"
            )
        ).alias("gram"),
    )
    d = grams.select(portable_hash64("gram").alias("h"), "source").distinct()
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source"))
    ).select(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= 5)
        .orderBy(F.col("n_shared_grams").desc(), "src_a", "src_b")
    )


# ------------------------------------------------------- filtered ANN
@register(
    "v_ann_filtered",
    oracle="""
WITH ok AS (SELECT doc_id FROM documents WHERE lang = 'en'),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10),
c AS (SELECT e.vec_id AS neighbor_id, CAST(e.embedding AS DOUBLE[]) AS cv
      FROM embeddings e JOIN ok ON e.vec_id = ok.doc_id),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_cosine_similarity(cv, qv), 6) AS cosine
  FROM c CROSS JOIN q)
SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored)
WHERE rk <= 5
ORDER BY query_id, rank
""",
    doc="FILTERED vector search — cosine top-5 per query restricted to "
    "corpus vectors whose linked document is English (ids aligned "
    "vec_id == doc_id) — the metadata-predicate + ANN combination every "
    "production vector store is asked for (pre-filtering, not "
    "post-filtering: filtering AFTER top-k silently returns < k "
    "results when the predicate is selective).  Scale: the predicate "
    "reduces to a keys-only semi-join BEFORE scoring, so the filter "
    "also CUTS the scoring flops instead of adding a pass; queries "
    "broadcast over the one filtered corpus scan; only (|Q| x k) "
    "ranked rows shuffle.",
)
def v_ann_filtered(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk

    emb = load_table(spark, sf, "embeddings")
    ok = (
        load_table(spark, sf, "documents")
        .where(F.col("lang") == "en")
        .select(F.col("doc_id").alias("__ok_id"))
    )
    corpus = emb.join(ok, emb.vec_id == F.col("__ok_id"), "left_semi")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return brute_force_topk(
        corpus, queries, k=5, corpus_id="vec_id", corpus_vec="embedding"
    ).orderBy("query_id", "rank")


# ------------------------------------------- funnel latency percentiles
@register(
    "e_funnel_latency",
    oracle="""
WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id,
             CAST(date_diff('second', s.signup_ts, MIN(e.ts)) AS BIGINT) AS latency_s
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id, s.signup_ts)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(latency_s) AS BIGINT) AS min_s,
       ROUND(quantile_cont(latency_s, 0.50), 2) AS p50_s,
       ROUND(quantile_cont(latency_s, 0.90), 2) AS p90_s,
       ROUND(quantile_cont(latency_s, 0.99), 2) AS p99_s,
       CAST(MAX(latency_s) AS BIGINT) AS max_s
FROM p
""",
    doc="funnel latency distribution: per user, seconds from FIRST "
    "signup to FIRST subsequent purchase; the converted population's "
    "min/p50/p90/p99/max — the time-to-convert readout that sits next "
    "to the conversion-rate funnel (e_funnel) in every product review, "
    "and the empirical basis for choosing attribution windows (cf. "
    "e_attribution_linear's 1-hour horizon).  Determinism: latencies "
    "are exact integer seconds; Spark percentile and DuckDB "
    "quantile_cont share linear interpolation (t_winsorize's "
    "convention).  Scale: two user-keyed grouped aggregates sharing "
    "one key family + a 1-row rollup; the signup panel joins the "
    "purchase scan key-for-key, no window over the corpus.",
)
def e_funnel_latency(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("first_purchase_ts"))
        .select(
            (
                F.unix_timestamp("first_purchase_ts") - F.unix_timestamp("signup_ts")
            ).cast("long").alias("latency_s")
        )
    )
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.min("latency_s").cast("long").alias("min_s"),
        F.round(F.expr("percentile(latency_s, 0.50)"), 2).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.90)"), 2).alias("p90_s"),
        F.round(F.expr("percentile(latency_s, 0.99)"), 2).alias("p99_s"),
        F.max("latency_s").cast("long").alias("max_s"),
    )


# --------------------------------------------------- LSH band planner
def _pow_chain(expr: str, n: int) -> str:
    """x^n as an explicit left-associated multiplication chain — the SAME
    expression text runs on both engines, so there is no dependence on
    pow()/power() libm agreement."""
    return "(" + " * ".join([expr] * n) + ")"


def _lsh_prob_sql(s: str, r: int, b: int) -> str:
    """P[candidate] = 1 - (1 - s^r)^b, multiplication-chain form."""
    return f"(1.0 - {_pow_chain(f'(1.0 - {_pow_chain(s, r)})', b)})"


_BAND_CONFIGS = [(4, 8), (8, 4), (16, 2)]  # (bands, rows) splits of 32 hashes


def _band_planner_case(col_bands: str, s: str) -> str:
    branches = "\n".join(
        f"  WHEN {col_bands} = {b} THEN {_lsh_prob_sql(s, r, b)}"
        for b, r in _BAND_CONFIGS
    )
    return f"CASE\n{branches}\nEND"


def _band_planner_oracle() -> str:
    # the canonical exact-jaccard CTE (same tokenizer/shingle/ROUND as
    # operators/dedup.ngram_jaccard_pairs — hand-rolling it here would
    # risk a divergent tokenizer) at threshold 0.0 = every pair sharing
    # >= 1 shingle
    from .text_dedup import _jaccard_cte

    return f"""
WITH {_jaccard_cte(3, 0.0)},
hist AS (
  SELECT LEAST(CAST(FLOOR(jaccard * 20) AS BIGINT), 19) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM exact GROUP BY 1),
cfg AS (SELECT * FROM (VALUES (4, 8), (8, 4), (16, 2)) AS c(bands, rows_per_band)),
xp AS (
  SELECT cfg.bands, cfg.rows_per_band, hist.bucket, hist.cnt,
         CAST(FLOOR(hist.cnt * {_band_planner_case("cfg.bands", "((CAST(hist.bucket AS DOUBLE) + 0.5) / 20.0)")} * 1000000) AS BIGINT)
           AS micro
  FROM hist CROSS JOIN cfg)
SELECT bands, rows_per_band,
       CAST(SUM(cnt) AS BIGINT) AS n_pairs_total,
       ROUND(SUM(micro) / 1000000.0, 6) AS expected_candidates,
       ROUND(SUM(CASE WHEN bucket >= 10 THEN micro ELSE 0 END)
             / (1000000.0 * SUM(CASE WHEN bucket >= 10 THEN cnt ELSE 0 END)), 6)
         AS expected_recall_at_05,
       ROUND(SUM(CASE WHEN bucket < 10 THEN micro ELSE 0 END) / 1000000.0, 6)
         AS expected_false_candidates
FROM xp
GROUP BY bands, rows_per_band
ORDER BY bands
"""


@register(
    "d_lsh_band_planner",
    oracle=_band_planner_oracle(),
    doc="LSH band tuning from MEASURED corpus similarity, not folklore: "
    "the exact 3-shingle Jaccard distribution of all >= 1-shared-shingle "
    "pairs (inverted index, 0.05-wide buckets) is pushed through the "
    "banding probability 1-(1-s^r)^b for each (bands, rows) split of 32 "
    "hashes, yielding per-config expected candidates, expected "
    "recall@0.5, and expected sub-threshold false candidates — pick the "
    "config, then run d_lsh_recall_audit to confirm.  Determinism: the "
    "probability is an explicit multiplication CHAIN (no pow(), whose "
    "libm may differ across engines) on exact bucket midpoints, and "
    "per-bucket expectations floor to integer micro-units before "
    "summation.  Scale: one inverted-index pair stage (the d_ngram_"
    "jaccard shape), a <= 20-row histogram, and a 3x20 expectation "
    "table — the planner itself costs one dedup-pipeline pass on a "
    "SAMPLE stratum, which is the point: measure cheap, then commit "
    "the full-corpus run to the right config.",
)
def d_band_planner(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf, "documents")
    jac = ngram_jaccard_pairs(docs, k=3, threshold=0.0).select("jaccard")
    hist = (
        jac.select(
            F.least(F.floor(F.col("jaccard") * 20).cast("long"), F.lit(19)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cfg = spark.createDataFrame(_BAND_CONFIGS, "bands int, rows_per_band int")
    s_mid = "((CAST(bucket AS DOUBLE) + 0.5) / 20.0)"
    xp = hist.crossJoin(F.broadcast(cfg)).selectExpr(
        "bands",
        "rows_per_band",
        "bucket",
        "cnt",
        f"CAST(FLOOR(cnt * {_band_planner_case('bands', s_mid)} * 1000000) AS BIGINT) AS micro",
    )
    return (
        xp.groupBy("bands", "rows_per_band")
        .agg(
            F.sum("cnt").cast("long").alias("n_pairs_total"),
            F.round(F.sum("micro") / 1000000.0, 6).alias("expected_candidates"),
            F.round(
                F.sum(F.when(F.col("bucket") >= 10, F.col("micro")).otherwise(0))
                / (
                    1000000.0
                    * F.sum(F.when(F.col("bucket") >= 10, F.col("cnt")).otherwise(0))
                ),
                6,
            ).alias("expected_recall_at_05"),
            F.round(
                F.sum(F.when(F.col("bucket") < 10, F.col("micro")).otherwise(0))
                / 1000000.0,
                6,
            ).alias("expected_false_candidates"),
        )
        .orderBy("bands")
    )


# ------------------------------------- sampled dedup-rate extrapolation
_AUDIT_RATE = 0.2  # doc-sampling rate for the audit (millionths gate)


@register(
    "d_dedup_sample_extrapolation",
    oracle=f"""
WITH s AS (
  SELECT doc_id, text FROM documents
  WHERE ({portable_hash64_sql("CAST(doc_id AS VARCHAR) || 'dupaudit'")} % 1000000)
        < {int(_AUDIT_RATE * 1000000)}),
toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
           AS t
  FROM s),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t)-7),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                                    t[i+4], t[i+5], t[i+6], t[i+7]))) AS gram
  FROM toks WHERE len(t) >= 8),
d AS (SELECT DISTINCT {portable_hash64_sql("gram")} AS h, doc_id FROM g),
grp AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY h),
agg AS (
  SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_sample_docs,
         CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c * (c - 1) // 2 END), 0) AS BIGINT)
           AS sample_dup_pairs
  FROM grp)
SELECT n_sample_docs, sample_dup_pairs,
       CAST(FLOOR(sample_dup_pairs / (CAST({_AUDIT_RATE} AS DOUBLE) * CAST({_AUDIT_RATE} AS DOUBLE))) AS BIGINT)
         AS est_corpus_dup_pairs,
       CAST(FLOOR(GREATEST(sample_dup_pairs
              - 1.96 * sqrt(CAST(sample_dup_pairs AS DOUBLE)), 0)
            / (CAST({_AUDIT_RATE} AS DOUBLE) * CAST({_AUDIT_RATE} AS DOUBLE))) AS BIGINT) AS ci_low,
       CAST(FLOOR((sample_dup_pairs
              + 1.96 * sqrt(CAST(sample_dup_pairs AS DOUBLE)))
            / (CAST({_AUDIT_RATE} AS DOUBLE) * CAST({_AUDIT_RATE} AS DOUBLE))) AS BIGINT) AS ci_high
FROM agg
""",
    doc="sampled duplication audit: a deterministic {rate}-rate hash-gate "
    "doc sample (portable md5 gate — the same sample on every engine and "
    "every rerun) runs the 8-gram span-dup pipeline, counts cross-doc "
    "duplicated-gram PAIRS in the sample, and extrapolates the corpus "
    "total as pairs/q^2 (a pair survives doc-sampling with probability "
    "q^2) with a Poisson-approx 95% interval — 'measure the dup rate on "
    "1/25th of the cost, decide whether the full dedup run pays for "
    "itself'.  The planner companion to d_lsh_band_planner, and at "
    "100 TB the FIRST thing to run on a new crawl snapshot.  "
    "Determinism: counts exact; the interval derives from sqrt on an "
    "exact integer then FLOORs — identical IEEE trees on both engines.  "
    "Scale: the gate prunes the scan BEFORE the explode, so the whole "
    "audit is q x the dedup pipeline's cost; one gram-hash shuffle, "
    "partial-agg'd.".replace("{rate}", str(_AUDIT_RATE)),
)
def d_dedup_extrapolate(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.hashing import portable_hash64
    from ..operators.sampling import sample_gate

    docs = load_table(spark, sf, "documents").where(
        sample_gate("doc_id", _AUDIT_RATE, "dupaudit")
    )
    t = docs.select("doc_id", tokens("text").alias("t")).where(F.size("t") >= 8)
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)-7), i -> concat_ws(' ', slice(t, i, 8)))"
            )
        ).alias("gram"),
    )
    d = grams.select(portable_hash64("gram").alias("h"), "doc_id").distinct()
    grp = d.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_sample_docs"))
    pairs = grp.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("c") >= 2, (F.col("c") * (F.col("c") - 1)) / 2)
            ).cast("long"),
            F.lit(0),
        ).alias("sample_dup_pairs")
    )
    q2 = _AUDIT_RATE * _AUDIT_RATE
    sd = F.sqrt(F.col("sample_dup_pairs").cast("double"))
    return (
        n_docs.crossJoin(F.broadcast(pairs))
        .select(
            "n_sample_docs",
            "sample_dup_pairs",
            F.floor(F.col("sample_dup_pairs") / q2).cast("long").alias(
                "est_corpus_dup_pairs"
            ),
            F.floor(
                F.greatest(
                    F.col("sample_dup_pairs") - 1.96 * sd, F.lit(0.0)
                ) / q2
            ).cast("long").alias("ci_low"),
            F.floor((F.col("sample_dup_pairs") + 1.96 * sd) / q2).cast("long").alias(
                "ci_high"
            ),
        )
    )


# -------------------------------------------------- tokenizer fertility
@register(
    "t_token_fertility",
    oracle="""
WITH t AS (
  SELECT lang,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(len(regexp_split_to_array(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT)
           AS n_toks
  FROM documents)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_bytes) AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE), 4)
         AS bytes_per_token
FROM t
GROUP BY lang
ORDER BY lang
""",
    doc="tokenizer fertility by language: bytes per (whitespace) token — "
    "the compression-budget statistic behind context-window and "
    "cost-per-language planning (a language whose tokens carry fewer "
    "bytes burns more sequence positions per document; pair with "
    "t_vocab_coverage when sizing a vocabulary).  Exact integer byte "
    "and token sums; ONE division per language at the end.  Scale: one "
    "scan, one partial-agg'd rollup to |languages| rows — no explode "
    "(token counts come from counting separators, not materializing "
    "tokens).",
)
def t_fertility(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.text import token_count

    d = load_table(spark, sf, "documents").select(
        "lang",
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        token_count("text").alias("n_toks"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.round(
                F.sum("n_bytes").cast("double") / F.sum("n_toks").cast("double"), 4
            ).alias("bytes_per_token"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------- peak concurrency
@register(
    "e_peak_concurrency",
    oracle="""
WITH iv AS (
  SELECT event_type, ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts
  FROM events),
pts AS (
  SELECT event_type, start_ts AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT event_type, end_ts AS t, -1 AS delta FROM iv),
swept AS (
  SELECT event_type, t,
         SUM(delta) OVER (PARTITION BY event_type
                          ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS concurrent
  FROM pts),
peak AS (
  SELECT event_type, CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent
  FROM swept GROUP BY event_type)
SELECT s.event_type, p.peak_concurrent,
       strftime(MIN(s.t), '%Y-%m-%d %H:%M:%S') AS first_peak_ts
FROM swept s JOIN peak p
  ON s.event_type = p.event_type AND s.concurrent = p.peak_concurrent
GROUP BY s.event_type, p.peak_concurrent
ORDER BY s.event_type
""",
    doc="peak concurrency via the interval endpoint sweep: every event "
    "opens a 30-minute presence interval; +1/-1 endpoint deltas are "
    "running-summed IN TIME ORDER per event type, and the maximum of "
    "that sweep is the peak number of simultaneously-open intervals — "
    "the capacity-planning statistic (max concurrent sessions/"
    "connections) computed WITHOUT the naive interval self-join "
    "(O(n^2) at 100 TB; the sweep is O(n log n) with one "
    "partition-keyed sort shuffle).  Ends sort before starts at the "
    "same instant (delta -1 < +1), the half-open-interval convention.  "
    "Determinism: integer deltas, exact integer running sums; the "
    "first-peak timestamp is a deterministic MIN.  Scale: one "
    "event-type-keyed window (partitioned — never global) over 2n "
    "endpoint rows, one rollup.",
)
def e_peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").select("event_type", "ts")
    iv = ev.select(
        "event_type",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end_ts"),
    )
    pts = iv.select(
        "event_type", F.col("start_ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("event_type", F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = pts.withColumn("concurrent", F.sum("delta").over(w))
    peak = swept.groupBy("event_type").agg(
        F.max("concurrent").cast("long").alias("peak_concurrent")
    )
    first_peak = (
        swept.join(
            F.broadcast(peak.withColumnRenamed("event_type", "__et")),
            (F.col("event_type") == F.col("__et"))
            & (F.col("concurrent") == F.col("peak_concurrent")),
        )
        .groupBy("event_type")
        .agg(
            F.date_format(F.min("t"), "yyyy-MM-dd HH:mm:ss").alias("first_peak_ts")
        )
    )
    return (
        peak.join(first_peak, "event_type")
        .select("event_type", "peak_concurrent", "first_peak_ts")
        .orderBy("event_type")
    )


# --------------------------------------------------- audience overlap
@register(
    "e_audience_overlap",
    oracle="""
WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
p AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM a x JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2),
sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY 1)
SELECT p.type_a, p.type_b, p.n_shared,
       sa.n AS n_a, sb.n AS n_b,
       ROUND(CAST(p.n_shared AS DOUBLE)
             / CAST(sa.n + sb.n - p.n_shared AS DOUBLE), 6) AS jaccard
FROM p JOIN sz sa ON p.type_a = sa.event_type
       JOIN sz sb ON p.type_b = sb.event_type
ORDER BY type_a, type_b
""",
    doc="pairwise audience overlap: for every pair of event types, how "
    "many distinct users do both, and the Jaccard of the two audiences "
    "— the segment-overlap matrix behind funnel design and campaign "
    "targeting, and structurally the events-side twin of "
    "d_cross_source_leakage (distinct (key, group) inverted index "
    "self-joined group_a < group_b — output bounded by users x "
    "|types|^2, never users^2).  Exact distinct counts; one division "
    "at the end.  Scale: the distinct reduces the stream to <= "
    "users x types rows; the self-join is user-keyed; size panels "
    "broadcast back onto the <= |types|^2/2 matrix.",
)
def e_audience_overlap(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("event_type", "user_id").distinct()
    x, y = ev.alias("x"), ev.alias("y")
    p = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"), F.col("y.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sz = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sa = F.broadcast(sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")))
    sb = F.broadcast(sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")))
    return (
        p.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------- CUSUM change point
@register(
    "e_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(FLOOR(SUM(cnt) * 1000000.0 / COUNT(*)) AS BIGINT) AS mean_micro
  FROM daily GROUP BY event_type),
dev AS (
  SELECT d.event_type, d.day, d.cnt, m.n_days, m.mean_micro,
         d.cnt * 1000000 - m.mean_micro AS dev_micro
  FROM daily d JOIN m ON d.event_type = m.event_type),
cs AS (
  SELECT event_type, day, n_days, mean_micro,
         SUM(dev_micro) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cusum_micro
  FROM dev),
pk AS (
  SELECT event_type, CAST(MAX(ABS(cusum_micro)) AS BIGINT) AS peak_micro
  FROM cs GROUP BY event_type)
SELECT cs.event_type,
       CAST(MAX(cs.n_days) AS BIGINT) AS n_days,
       ROUND(MAX(cs.mean_micro) / 1000000.0, 6) AS mean_per_day,
       strftime(MIN(cs.day), '%Y-%m-%d') AS change_day,
       ROUND(MAX(pk.peak_micro) / 1000000.0, 6) AS cusum_peak
FROM cs JOIN pk
  ON cs.event_type = pk.event_type AND ABS(cs.cusum_micro) = pk.peak_micro
GROUP BY cs.event_type
ORDER BY cs.event_type
""",
    doc="CUSUM change-point detection on daily event volumes: per type, "
    "the running sum of (daily count - overall daily mean) peaks in "
    "magnitude AT the day the level shifts (Page 1954's cumulative-sum "
    "statistic) — the monitoring readout that finds WHEN a pipeline's "
    "traffic changed, not just that it did (pair with e_seasonal_"
    "anomaly, which flags pointwise outliers).  Determinism: the mean "
    "is floored to integer micro-units, deviations and the running sum "
    "stay exact bigints, ties on the peak resolve to the earliest day.  "
    "Scale: one partial-agg'd daily rollup, a |types|-row mean panel "
    "joined back, ONE type-partitioned window over |types| x |days| "
    "rows (partitioned — never global), and a |types|-row result.",
)
def e_cusum(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.floor(F.sum("cnt") * 1000000.0 / F.count(F.lit(1))).cast("long").alias(
            "mean_micro"
        ),
    )
    dev = daily.join(F.broadcast(m), "event_type").withColumn(
        "dev_micro", F.col("cnt") * 1000000 - F.col("mean_micro")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = dev.withColumn("cusum_micro", F.sum("dev_micro").over(w))
    pk = cs.groupBy(F.col("event_type").alias("__et")).agg(
        F.max(F.abs("cusum_micro")).cast("long").alias("peak_micro")
    )
    return (
        cs.join(
            F.broadcast(pk),
            (F.col("event_type") == F.col("__et"))
            & (F.abs("cusum_micro") == F.col("peak_micro")),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_days").cast("long").alias("n_days"),
            F.round(F.max("mean_micro") / 1000000.0, 6).alias("mean_per_day"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("change_day"),
            F.round(F.max("peak_micro") / 1000000.0, 6).alias("cusum_peak"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------ SLO burn rate
@register(
    "e_slo_burn",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT) AS bad
  FROM events GROUP BY 1, 2),
rates AS (
  SELECT event_type, hr, n, bad,
         CAST(SUM(bad) OVER w6 AS BIGINT) AS bad_6h,
         CAST(SUM(n) OVER w6 AS BIGINT) AS n_6h
  FROM hourly
  WINDOW w6 AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
burn AS (
  SELECT event_type, hr, n, bad,
         CAST(FLOOR(bad * 1000000.0 / n) AS BIGINT) AS rate_1h_micro,
         CAST(FLOOR(bad_6h * 1000000.0 / n_6h) AS BIGINT) AS rate_6h_micro
  FROM rates)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(MAX(rate_1h_micro) / 10000.0, 4) AS peak_1h_bad_pct,
       ROUND(MAX(rate_6h_micro) / 10000.0, 4) AS peak_6h_bad_pct,
       CAST(SUM(CASE WHEN rate_1h_micro > 200000 AND rate_6h_micro > 100000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_page_alerts
FROM burn
GROUP BY event_type
ORDER BY event_type
""",
    doc="multi-window SLO burn-rate alerting (the Google SRE workbook "
    "policy): per event type and hour, the bad-event rate (value < 10 "
    "as the 'bad' proxy) over the last 1h and 6h windows; an alert "
    "pages only when BOTH windows burn hot (1h > 20%, 6h > 10%) — the "
    "short window for responsiveness, the long one to suppress blips.  "
    "Determinism: rates floor to integer micro-units from exact "
    "counts before any comparison or max.  Scale: one partial-agg'd "
    "hourly rollup, ONE type-partitioned bounded-frame window "
    "(6 rows deep — never a global or unbounded window), a "
    "|types|-row result.",
)
def e_slo_burn(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    hourly = (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("value") < 10, 1).otherwise(0)).cast("long").alias("bad"),
        )
    )
    w6 = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-5, Window.currentRow)
    )
    rates = hourly.withColumn("bad_6h", F.sum("bad").over(w6)).withColumn(
        "n_6h", F.sum("n").over(w6)
    )
    burn = rates.select(
        "event_type",
        F.floor(F.col("bad") * 1000000.0 / F.col("n")).cast("long").alias(
            "rate_1h_micro"
        ),
        F.floor(F.col("bad_6h") * 1000000.0 / F.col("n_6h")).cast("long").alias(
            "rate_6h_micro"
        ),
    )
    return (
        burn.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.round(F.max("rate_1h_micro") / 10000.0, 4).alias("peak_1h_bad_pct"),
            F.round(F.max("rate_6h_micro") / 10000.0, 4).alias("peak_6h_bad_pct"),
            F.sum(
                F.when(
                    (F.col("rate_1h_micro") > 200000)
                    & (F.col("rate_6h_micro") > 100000),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_page_alerts"),
        )
        .orderBy("event_type")
    )
