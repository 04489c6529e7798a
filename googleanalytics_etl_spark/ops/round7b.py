"""Round-7 batch 2: rank/divergence/drift statistics rounding out the
experimentation and corpus-health families.

- ``x_kruskal_wallis`` — the k-group extension of x_mann_whitney: does
  event value differ across ALL five event types? Same 2×-rank-unit
  discipline (tie-averaged rank sums are exact BIGINTs); the one
  cross-group float reduction (Σ_g R_g²/n_g) is an ORDERED window fold
  (the x_anova_oneway recipe) so the tie-corrected H is bit-stable.
- ``x_pr_auc`` — average precision (step-interpolated PR-AUC), the
  class-imbalance companion to x_auc_roc: AP = (1/n⁺)·Σ_s ΔTP_s·P_s
  over the descending score domain. Each term is a rational of exact
  cumulative integers, DECIMAL(18,8)-quantized before the exact sum
  (the x_source_kl recipe).
- ``x_cramers_v`` — effect size for the event-type × weekday
  contingency: V = √(χ²/(n·min(r−1,c−1))). Weekday is epoch-day mod 7
  (pure integer arithmetic — no engine-specific DOW conventions);
  per-cell χ² terms quantized before summing.
- ``x_js_divergence`` — symmetric, bounded [0, ln 2] divergence of each
  source's smoothed word distribution vs the POOLED REST over the
  corpus top-k vocabulary — the mixture-design twin of x_source_kl
  (KL vs corpus): JS is what you threshold when deciding whether two
  sources are interchangeable in a data mixture.
- ``x_page_hinkley`` — sequential changepoint detection on the daily
  mean event value: PH_t = U_t − min_{i≤t} U_i with
  U_t = Σ_{i≤t}(x̄_i − M_i − δ), M_i the running grand mean. The
  streaming-shaped drift alarm beside x_cusum_changepoint (which scans
  a fixed window); all cumulatives are ordered windows over the
  day-grain frame, so the float folds are order-pinned.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M extensions beside x_welch_ttest / x_auc_roc /
x_source_kl / x_cusum_changepoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_KW_ORACLE = """
WITH d AS (
    SELECT event_type AS grp,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS xc
    FROM events
), vals AS (
    SELECT xc, grp, CAST(COUNT(*) AS BIGINT) AS cg
    FROM d GROUP BY xc, grp
), vtot AS (
    SELECT xc, CAST(SUM(cg) AS BIGINT) AS c,
           CAST(SUM(SUM(cg)) OVER (ORDER BY xc) AS BIGINT) AS cum_c
    FROM vals GROUP BY xc
), ranked AS (
    SELECT v.grp, v.cg, t.c, t.cum_c
    FROM vals v JOIN vtot t USING (xc)
), g AS (
    SELECT grp, CAST(SUM(cg) AS BIGINT) AS n_g,
           CAST(SUM(cg * (2 * cum_c - c + 1)) AS BIGINT) AS r2x
    FROM ranked GROUP BY grp
), ties AS (
    SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS tie3,
           CAST(SUM(c) AS BIGINT) AS n
    FROM vtot
), folded AS (
    SELECT SUM(CAST(CAST(r2x AS DECIMAL(38,0)) * r2x AS DOUBLE)
               / (4.0 * n_g))
               OVER (ORDER BY grp ROWS UNBOUNDED PRECEDING) AS t_cum,
           CAST(COUNT(*) OVER () AS BIGINT) AS k,
           ROW_NUMBER() OVER (ORDER BY grp DESC) AS rn
    FROM g
)
SELECT f.k, t.n, t.tie3,
       ROUND((12.0 * f.t_cum / (CAST(t.n AS DOUBLE) * (t.n + 1))
              - 3.0 * (t.n + 1))
             / (1.0 - CAST(t.tie3 AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)), 6)
           AS h_stat
FROM folded f CROSS JOIN ties t
WHERE f.rn = 1
"""


@register("x_kruskal_wallis", oracle=_KW_ORACLE)
def x_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across all five event types (nonparametric
    ANOVA on ranks). With per-value per-group counts c_g(v) and pooled
    counts c(v), the doubled tie-averaged rank sum per group
    2R_g = Σ_v c_g(v)·(2·cum(v) − c(v) + 1) is an exact BIGINT;
    H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1), divided by the tie
    correction 1 − Σ(t³−t)/(N³−N). The Σ_g fold (k=5 IEEE additions)
    is an ordered window, pinning addition order cross-engine.

    Scale shape: one map-side-combinable (value, group) aggregate, then
    everything lives on the value domain (≤ ~50k rows at any data
    size); the k-row group frame carries the fold.
    """
    d = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100, 0).cast("long").alias("xc"),
    )
    vals = d.groupBy("xc", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    vtot = (
        vals.groupBy("xc")
        .agg(F.sum("cg").cast("long").alias("c"))
        .withColumn(
            "cum_c", F.sum("c").over(Window.orderBy("xc")).cast("long")
        )
    )
    ranked = vals.join(vtot, "xc")
    g = ranked.groupBy("grp").agg(
        F.sum("cg").cast("long").alias("n_g"),
        F.sum(F.col("cg") * (2 * F.col("cum_c") - F.col("c") + 1))
        .cast("long")
        .alias("r2x"),
    )
    ties = vtot.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie3"),
        F.sum("c").cast("long").alias("n"),
    )
    w_fold = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = g.select(
        F.sum(
            (F.col("r2x").cast("decimal(38,0)") * F.col("r2x")).cast(
                "double"
            )
            / (4.0 * F.col("n_g"))
        )
        .over(w_fold)
        .alias("t_cum"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("k"),
        F.row_number().over(Window.orderBy(F.desc("grp"))).alias("rn"),
    )
    nd = F.col("n").cast("double")
    h = (12.0 * F.col("t_cum") / (nd * (F.col("n") + 1)) - 3.0 * (F.col("n") + 1)) / (
        1.0 - F.col("tie3").cast("double") / (nd * F.col("n") * F.col("n") - F.col("n"))
    )
    return (
        folded.where(F.col("rn") == 1)
        .crossJoin(F.broadcast(ties))
        .select("k", "n", "tie3", F.round(h, 6).alias("h_stat"))
    )


_PR_AUC_ORACLE = """
WITH sc AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
), dom AS (
    SELECT cents, CAST(SUM(pos) AS BIGINT) AS np,
           CAST(SUM(1 - pos) AS BIGINT) AS nn
    FROM sc GROUP BY cents
), cum AS (
    SELECT np,
           CAST(SUM(np) OVER (ORDER BY cents DESC) AS BIGINT) AS tp,
           CAST(SUM(nn) OVER (ORDER BY cents DESC) AS BIGINT) AS fp
    FROM dom
), terms AS (
    SELECT np, tp, fp,
           CAST(CAST(np AS DOUBLE) * tp / (tp + fp)
                AS DECIMAL(18,8)) AS term
    FROM cum
)
SELECT CAST(MAX(tp) AS BIGINT) AS n_pos,
       CAST(MAX(fp) AS BIGINT) AS n_neg,
       ROUND(CAST(SUM(term) AS DOUBLE) / MAX(tp), 6) AS avg_precision
FROM terms
"""


@register("x_pr_auc", oracle=_PR_AUC_ORACLE)
def x_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-interpolated area under the
    precision-recall curve) of ``value`` ranking purchases — the metric
    that stays honest under class imbalance where x_auc_roc saturates.
    Processing the score domain high→low with inclusive cumulative
    TP/FP, AP = Σ_s ΔTP_s·P_s / n⁺ with P_s = TP_s/(TP_s+FP_s) (ties
    grouped, sklearn's convention). ΔTP and the cumulative counts are
    exact BIGINTs; each rational term is DECIMAL(18,8)-quantized before
    the exact sum, so the one data-dependent float reduction is
    order-free.

    Scale shape: identical to x_auc_roc — one map-side-combined
    aggregate to the bounded score domain, one domain-grain window.
    """
    dom = (
        load(spark, sf_dir, "events")
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("pos"),
        )
        .groupBy("cents")
        .agg(
            F.sum("pos").cast("long").alias("np"),
            F.sum(1 - F.col("pos")).cast("long").alias("nn"),
        )
    )
    w = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dom.select(
        "np",
        F.sum("np").over(w).cast("long").alias("tp"),
        F.sum("nn").over(w).cast("long").alias("fp"),
    )
    term = (
        F.col("np").cast("double")
        * F.col("tp")
        / (F.col("tp") + F.col("fp"))
    ).cast("decimal(18,8)")
    return cum.agg(
        F.max("tp").cast("long").alias("n_pos"),
        F.max("fp").cast("long").alias("n_neg"),
        F.round(
            F.sum(term).cast("double") / F.max("tp"), 6
        ).alias("avg_precision"),
    )


_CRAMERS_ORACLE = """
WITH d AS (
    SELECT event_type AS r,
           CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000)
                AS BIGINT) % 7 AS c
    FROM events
), cell AS (
    SELECT r, c, CAST(COUNT(*) AS BIGINT) AS o
    FROM d GROUP BY r, c
), rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS nr FROM cell GROUP BY r),
ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS nc FROM cell GROUP BY c),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT r) AS BIGINT) AS nrows,
               CAST(COUNT(DISTINCT c) AS BIGINT) AS ncols
        FROM cell),
terms AS (
    SELECT CAST(
        (CAST(cell.o AS DOUBLE) - CAST(rt.nr AS DOUBLE) * ct.nc / tot.n)
        * (CAST(cell.o AS DOUBLE) - CAST(rt.nr AS DOUBLE) * ct.nc / tot.n)
        / (CAST(rt.nr AS DOUBLE) * ct.nc / tot.n)
        AS DECIMAL(18,8)) AS term
    FROM cell JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot
)
SELECT t.n, t.nrows, t.ncols,
       ROUND(CAST(s.chi2 AS DOUBLE), 6) AS chi2,
       ROUND(SQRT(CAST(s.chi2 AS DOUBLE)
                  / (CAST(t.n AS DOUBLE)
                     * LEAST(t.nrows - 1, t.ncols - 1))), 6) AS cramers_v
FROM (SELECT SUM(term) AS chi2 FROM terms) s CROSS JOIN tot t
"""


@register("x_cramers_v", oracle=_CRAMERS_ORACLE)
def x_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the event-type × weekday association
    — the "is this dependence big enough to matter" companion to
    x_chi2_independence's significance test. Weekday is epoch-day mod 7
    (integer arithmetic; engine DOW conventions never enter). Each χ²
    cell term is one fixed IEEE expression over exact integers,
    DECIMAL(18,8)-quantized before the exact 35-cell sum;
    V = √(χ²/(n·min(r−1,c−1))).

    Scale shape: one map-side-combinable aggregate to the r×c
    contingency (≤ 35 cells), marginals roll up from the cells — the
    only data-scale work is the first scan.
    """
    d = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("r"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86400000000
            )
            % 7
        )
        .cast("long")
        .alias("c"),
    )
    cell = d.groupBy("r", "c").agg(F.count(F.lit(1)).cast("long").alias("o"))
    rt = cell.groupBy("r").agg(F.sum("o").cast("long").alias("nr"))
    ct = cell.groupBy("c").agg(F.sum("o").cast("long").alias("nc"))
    tot = cell.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("r").cast("long").alias("nrows"),
        F.countDistinct("c").cast("long").alias("ncols"),
    )
    e = F.col("nr").cast("double") * F.col("nc") / F.col("n")
    term = (
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    ).cast("decimal(18,8)")
    chi2 = (
        cell.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(term).alias("chi2"))
    )
    return chi2.crossJoin(F.broadcast(tot)).select(
        "n",
        "nrows",
        "ncols",
        F.round(F.col("chi2").cast("double"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2").cast("double")
                / (
                    F.col("n").cast("double")
                    * F.least(F.col("nrows") - 1, F.col("ncols") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


_JS_VOCAB_K = 100

_JS_ORACLE = f"""
WITH words AS (
    SELECT source, unnest(str_split(text, ' ')) AS word FROM documents
), sw AS (
    SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cs
    FROM words GROUP BY source, word
), corpus_cnt AS (
    SELECT word, CAST(SUM(cs) AS BIGINT) AS cw FROM sw GROUP BY word
), vocab AS (
    SELECT word, cw FROM corpus_cnt
    ORDER BY cw DESC, word LIMIT {_JS_VOCAB_K}
), src_tot AS (
    SELECT s.source, CAST(SUM(s.cs) AS BIGINT) AS ts
    FROM sw s JOIN vocab v USING (word) GROUP BY s.source
), corpus_tot AS (
    SELECT CAST(SUM(cw) AS BIGINT) AS tc,
           CAST(COUNT(*) AS BIGINT) AS nv
    FROM vocab
), grid AS (
    SELECT st.source, st.ts, v.word, v.cw,
           CAST(COALESCE(s.cs, 0) AS BIGINT) AS cs
    FROM src_tot st CROSS JOIN vocab v
    LEFT JOIN sw s ON s.source = st.source AND s.word = v.word
)
SELECT g.source,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       ROUND(CAST(SUM(CAST(
           0.5 * (((cs + 0.5) / (ts + nv * 0.5))
                  * LN(((cs + 0.5) / (ts + nv * 0.5))
                       / (0.5 * (((cs + 0.5) / (ts + nv * 0.5))
                                 + ((cw - cs + 0.5)
                                    / (tc - ts + nv * 0.5)))))
                  + ((cw - cs + 0.5) / (tc - ts + nv * 0.5))
                  * LN(((cw - cs + 0.5) / (tc - ts + nv * 0.5))
                       / (0.5 * (((cs + 0.5) / (ts + nv * 0.5))
                                 + ((cw - cs + 0.5)
                                    / (tc - ts + nv * 0.5))))))
           AS DECIMAL(18,8))) AS DOUBLE), 6) AS js
FROM grid g, corpus_tot
GROUP BY g.source
"""


@register("x_js_divergence", oracle=_JS_ORACLE)
def x_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's smoothed word
    distribution vs the POOLED REST over the corpus top-{k} vocabulary
    — symmetric and bounded [0, ln 2], so thresholds transfer across
    corpora (x_source_kl's KL does not): the dial for "are these two
    mixture components interchangeable". Same scale shape as
    x_source_kl: one explode → one (source, word) aggregate, corpus
    counts ROLL UP (no second tokenize), k-row vocab broadcast into a
    |sources|×k grid, per-term DECIMAL(18,8) quantization before the
    exact sum.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    sw = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    corpus_cnt = sw.groupBy("word").agg(
        F.sum("cs").cast("long").alias("cw")
    )
    vocab = corpus_cnt.orderBy(F.col("cw").desc(), "word").limit(
        _JS_VOCAB_K
    )
    src_word = sw.join(F.broadcast(vocab.select("word")), "word")
    src_tot = src_word.groupBy("source").agg(
        F.sum("cs").cast("long").alias("ts")
    )
    corpus_tot = vocab.agg(
        F.sum("cw").cast("long").alias("tc"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    grid = (
        src_tot.crossJoin(F.broadcast(vocab))
        .join(src_word, ["source", "word"], "left")
        .select(
            "source",
            "ts",
            "word",
            "cw",
            F.coalesce(F.col("cs"), F.lit(0)).cast("long").alias("cs"),
        )
        .crossJoin(F.broadcast(corpus_tot))
    )
    half = F.col("nv") * 0.5
    p = (F.col("cs") + 0.5) / (F.col("ts") + half)
    q = (F.col("cw") - F.col("cs") + 0.5) / (
        F.col("tc") - F.col("ts") + half
    )
    m = 0.5 * (p + q)
    term = (0.5 * (p * F.log(p / m) + q * F.log(q / m))).cast(
        "decimal(18,8)"
    )
    return grid.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.round(F.sum(term).cast("double"), 6).alias("js"),
    )


x_js_divergence.__doc__ = x_js_divergence.__doc__.format(k=_JS_VOCAB_K)


_PH_DELTA = 0.5   # insensitivity band (dollars)
_PH_LAMBDA = 5.0  # alarm threshold (dollars)

_PH_ORACLE = f"""
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
), run AS (
    SELECT day, sum_cents, n,
           CAST(SUM(sum_cents) OVER (ORDER BY day) AS BIGINT) AS cum_cents,
           CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS cum_n
    FROM daily
), dev AS (
    SELECT day,
           CAST(sum_cents AS DOUBLE) / (100.0 * n) AS xbar,
           CAST(sum_cents AS DOUBLE) / (100.0 * n)
               - CAST(cum_cents AS DOUBLE) / (100.0 * cum_n)
               - {_PH_DELTA} AS inc
    FROM run
), u AS (
    SELECT day, xbar,
           SUM(inc) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS ut
    FROM dev
)
SELECT day, ROUND(xbar, 6) AS day_mean,
       ROUND(ut - MIN(ut) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
             6) AS ph,
       CAST(CASE WHEN ut - MIN(ut) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING) > {_PH_LAMBDA}
             THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM u
"""


@register("x_page_hinkley", oracle=_PH_ORACLE)
def x_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential changepoint detection on the daily mean
    event value: U_t = Σ_{{i≤t}}(x̄_i − M_i − δ) with M_i the running
    grand mean (exact integer cents ratio), PH_t = U_t − min_{{i≤t}} U_i,
    alarm when PH_t > λ (δ={d}, λ={l} dollars). The one-pass,
    bounded-state drift monitor beside x_cusum_changepoint's
    fixed-window scan — this shape ports directly to a stateful
    streaming operator (state = running sums + running min).

    Scale shape: one map-side-combinable day aggregate; every window
    runs over the |days| frame (month-grain metadata). The float
    cumulatives (U_t, running min) are ordered folds over that frame —
    addition order pinned in both engines.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("sum_cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = daily.select(
        "day",
        "sum_cents",
        "n",
        F.sum("sum_cents").over(w).cast("long").alias("cum_cents"),
        F.sum("n").over(w).cast("long").alias("cum_n"),
    )
    xbar = F.col("sum_cents").cast("double") / (100.0 * F.col("n"))
    inc = (
        xbar
        - F.col("cum_cents").cast("double") / (100.0 * F.col("cum_n"))
        - _PH_DELTA
    )
    u = run.select(
        "day", xbar.alias("xbar"), F.sum(inc).over(w).alias("ut")
    )
    ph = F.col("ut") - F.min("ut").over(w)
    return u.select(
        "day",
        F.round(F.col("xbar"), 6).alias("day_mean"),
        F.round(ph, 6).alias("ph"),
        F.when(ph > _PH_LAMBDA, 1).otherwise(0).cast("long").alias("alarm"),
    )


x_page_hinkley.__doc__ = x_page_hinkley.__doc__.format(
    d=_PH_DELTA, l=_PH_LAMBDA
)
