"""Round-6 batch 21: association statistics — market basket and MI.

- ``x_basket_lift`` — association rules over order baskets: support /
  confidence / lift for every co-occurring brand pair. The classic
  retail-affinity query; every statistic is emitted with its exact
  integer evidence (pair count, item counts, basket count) so the
  ratios are single IEEE divisions.
- ``x_mutual_info`` — mutual information (and the two marginal
  entropies) between customer market segment and nation. The
  "are these two categoricals dependent, and by how many nats" twin
  of x_chi2_independence — χ² gives a test statistic, MI gives the
  effect size on the information scale. Per-cell ln-terms are
  DECIMAL(18,8)-quantized before the exact sum (x_source_kl recipe).

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_BASKET_MIN_PAIRS = 5  # drop pairs seen in fewer baskets (noise floor)

_BASKET_ORACLE = f"""
WITH bi AS (
    SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), nb AS (
    SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM bi
), items AS (
    SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM bi GROUP BY item
), pairs AS (
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(COUNT(*) AS BIGINT) AS cnt_ab
    FROM bi a JOIN bi b
      ON a.basket = b.basket AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING COUNT(*) >= {_BASKET_MIN_PAIRS}
)
SELECT p.item_a, p.item_b, p.cnt_ab,
       ia.cnt AS cnt_a, ib.cnt AS cnt_b, nb.n AS n_baskets,
       ROUND(CAST(p.cnt_ab AS DOUBLE) / nb.n, 6) AS support,
       ROUND(CAST(p.cnt_ab AS DOUBLE) / ia.cnt, 6) AS confidence,
       ROUND(CAST(p.cnt_ab * nb.n AS DOUBLE)
             / CAST(ia.cnt * ib.cnt AS DOUBLE), 6) AS lift
FROM pairs p
JOIN items ia ON ia.item = p.item_a
JOIN items ib ON ib.item = p.item_b
CROSS JOIN nb
ORDER BY p.item_a, p.item_b
"""


@register("x_basket_lift", oracle=_BASKET_ORACLE)
def x_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-pair association rules over order baskets: for every
    unordered brand pair co-occurring in ≥ {_BASKET_MIN_PAIRS} orders,
    emit the integer evidence (pair/item/basket counts) and the derived
    support = n_ab/N, confidence(a→b) = n_ab/n_a, and
    lift = n_ab·N/(n_a·n_b) — lift > 1 marks genuinely associated
    brands. Ratios are single IEEE divisions of exact BIGINTs.

    Scale shape: the part dim joins BROADCAST; pair generation is a
    self-join on the basket key, so the blow-up per basket is bounded
    by (items-per-basket choose 2) — baskets are physically small —
    and the pair space aggregates straight down to the brand-domain
    square (≤ |brands|²/2 rows). Item counts join back broadcast-sized.
    No window, no global sort until the final bounded ORDER BY.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bi = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            F.col("l_orderkey").alias("basket"),
            F.col("p_brand").alias("item"),
        )
        .distinct()
    )
    nb = bi.agg(F.countDistinct("basket").cast("long").alias("n"))
    items = bi.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    a = bi.alias("a")
    b = bi.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_ab"))
        .where(F.col("cnt_ab") >= _BASKET_MIN_PAIRS)
    )
    ia = items.select(
        F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")
    )
    ib = items.select(
        F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            F.col("n").alias("n_baskets"),
            F.round(F.col("cnt_ab").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            F.round(
                F.col("cnt_ab").cast("double") / F.col("cnt_a"), 6
            ).alias("confidence"),
            F.round(
                (F.col("cnt_ab") * F.col("n")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy("item_a", "item_b")
    )


_MI_ORACLE = """
WITH base AS (
    SELECT c.c_mktsegment AS seg, n.n_name AS nat
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base
), cells AS (
    SELECT seg, nat, CAST(COUNT(*) AS BIGINT) AS nxy
    FROM base GROUP BY seg, nat
), margx AS (
    SELECT seg, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY seg
), margy AS (
    SELECT nat, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY nat
), mi AS (
    SELECT ROUND(CAST(SUM(CAST(
               (CAST(c.nxy AS DOUBLE) / t.n)
               * LN(CAST(c.nxy AS DOUBLE) * t.n
                    / (CAST(x.nx AS DOUBLE) * y.ny))
               AS DECIMAL(18,8))) AS DOUBLE), 6) AS mi_nats,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM cells c
    JOIN margx x ON x.seg = c.seg
    JOIN margy y ON y.nat = c.nat
    CROSS JOIN tot t
), hx AS (
    SELECT ROUND(CAST(SUM(CAST(
               -(CAST(nx AS DOUBLE) / t.n)
               * LN(CAST(nx AS DOUBLE) / t.n)
               AS DECIMAL(18,8))) AS DOUBLE), 6) AS h_seg
    FROM margx CROSS JOIN tot t
), hy AS (
    SELECT ROUND(CAST(SUM(CAST(
               -(CAST(ny AS DOUBLE) / t.n)
               * LN(CAST(ny AS DOUBLE) / t.n)
               AS DECIMAL(18,8))) AS DOUBLE), 6) AS h_nat
    FROM margy CROSS JOIN tot t
)
SELECT t.n, m.n_cells, hx.h_seg, hy.h_nat, m.mi_nats
FROM tot t CROSS JOIN mi m CROSS JOIN hx CROSS JOIN hy
"""


@register("x_mutual_info", oracle=_MI_ORACLE)
def x_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between customer market segment and nation:
    I(X;Y) = Σ_xy p_xy ln(p_xy/(p_x p_y)) over the contingency cells,
    plus the marginal entropies H(seg), H(nat) that bound it
    (0 ≤ MI ≤ min(H)). Reports nats. Each cell term's operands are
    exact integers over one total, the ln is the only inexact step and
    is DECIMAL(18,8)-quantized before the exact sum, so the scalars
    are bit-stable cross-engine.

    Scale shape: nation joins BROADCAST; everything after the first
    groupBy lives on the |seg|×|nat| contingency DOMAIN (≤ 125 cells)
    — marginals, totals, and the three quantized sums are
    metadata-sized, and the one wide stage is the map-side-combinable
    cell count.
    """
    c = load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nat")
    )
    cells = base.groupBy("seg", "nat").agg(
        F.count(F.lit(1)).cast("long").alias("nxy")
    )
    tot = cells.agg(F.sum("nxy").cast("long").alias("n"))
    margx = cells.groupBy("seg").agg(F.sum("nxy").cast("long").alias("nx"))
    margy = cells.groupBy("nat").agg(F.sum("nxy").cast("long").alias("ny"))
    mi_term = (
        (F.col("nxy").cast("double") / F.col("n"))
        * F.log(
            F.col("nxy").cast("double")
            * F.col("n")
            / (F.col("nx").cast("double") * F.col("ny"))
        )
    ).cast("decimal(18,8)")
    mi = (
        cells.join(F.broadcast(margx), "seg")
        .join(F.broadcast(margy), "nat")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(mi_term).cast("double"), 6).alias("mi_nats"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
    )

    def _entropy(marg: DataFrame, col: str, out: str) -> DataFrame:
        p = F.col(col).cast("double") / F.col("n")
        return marg.crossJoin(F.broadcast(tot)).agg(
            F.round(
                F.sum((-p * F.log(p)).cast("decimal(18,8)")).cast("double"),
                6,
            ).alias(out)
        )

    hx = _entropy(margx, "nx", "h_seg")
    hy = _entropy(margy, "ny", "h_nat")
    return (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select("n", "n_cells", "h_seg", "h_nat", "mi_nats")
    )
