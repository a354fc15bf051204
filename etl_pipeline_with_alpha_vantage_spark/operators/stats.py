"""Statistical / preference-query operators: Pareto skyline and
chi-square association (SURVEY.md §2.C widening — analytics shapes a
warehouse user of the reference would reach for next, built on the same
exactness discipline as the rest of the registry).

Both operators replace an O(n²) textbook formulation with a
decomposition that is one shuffle plus tiny-side work, and each oracle
IS the naive formulation — so the parity suite proves the decomposition
exact, not merely plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# --------------------------------------------------------------------------
# Pareto skyline (minimize price, maximize size)
# --------------------------------------------------------------------------

_SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""

_SKY_BUCKET_WIDTH = 64  # price units per segment of the prefix-max sweep


def pareto_frontier(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    bucket_width: float = _SKY_BUCKET_WIDTH,
) -> DataFrame:
    """Rows not dominated by any other row (minimize cost, maximize gain).

    Dominance: q dominates p iff q.cost <= p.cost AND q.gain >= p.gain
    with at least one strict. Exact-duplicate points do not dominate each
    other, so all copies of a frontier point survive — matching the
    NOT EXISTS definition. See skyline_pareto for the plan shape.
    """
    per_cost = df.groupBy(cost_col).agg(F.max(gain_col).alias("_max_gain"))
    bucketed = per_cost.withColumn(
        "_bucket", F.floor(F.col(cost_col) / bucket_width)
    )
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy(cost_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_local_prev", F.max("_max_gain").over(w_local)
    )
    bucket_tops = bucketed.groupBy("_bucket").agg(
        F.max("_max_gain").alias("_bucket_max")
    )
    w_buckets = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = bucket_tops.select(
        "_bucket", F.max("_bucket_max").over(w_buckets).alias("_prior_max")
    )
    frontier = (
        local.join(prior, "_bucket")
        .withColumn(
            "_prev_max",
            F.greatest(
                F.coalesce("_local_prev", F.lit(float("-inf"))),
                F.coalesce("_prior_max", F.lit(float("-inf"))),
            ),
        )
        .filter(F.col("_max_gain") > F.col("_prev_max"))
        .select(cost_col, "_max_gain")
    )
    return (
        df.join(F.broadcast(frontier), cost_col)  # bounded: prefix-max frontier (<= cost-bucket grid)
        .filter(F.col(gain_col) == F.col("_max_gain"))
        .drop("_max_gain")
    )


@query("skyline_pareto", oracle=_SKYLINE_ORACLE)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline over part: cheapest-for-its-size frontier
    (minimize p_retailprice, maximize p_size).

    The textbook NOT EXISTS self-join — which IS the oracle, proving
    this plan exact — is O(n²). The skyline has a sweep-line
    characterization instead: a row survives iff

      (a) its size equals the max size at its exact price, and
      (b) every strictly-cheaper price's max size is below its size.

    (b) is a prefix maximum over *distinct prices*, computed here with
    the same segmented two-pass trick as concurrency_peak so no global
    single-partition sort ever happens:

      1. one shuffle: per-price max size (price-level table, one row per
         distinct price);
      2. per price-bucket (floor(price/64)) local prefix max — window
         inside the bucket only;
      3. bucket-level maxima (one row per bucket) get a global running
         max — a window over #buckets rows, vanishingly small;
      4. prev_max = max(local prefix, previous buckets' max), rows with
         size > prev_max and size == their price's max are the skyline.

    The fact table is touched once (step 1's aggregation); everything
    after runs on the distinct-price table. At 100 TB with billions of
    rows but bounded distinct prices this is one real shuffle + dust.
    """
    part = table(spark, sf_dir, "part")
    return pareto_frontier(part, "p_retailprice", "p_size").select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("long").alias("p_size"),
    )


# --------------------------------------------------------------------------
# Chi-square association (event_type × user segment)
# --------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH obs AS (
    SELECT event_type, user_id % 4 AS segment, COUNT(*) AS o
    FROM events GROUP BY 1, 2
),
tot AS (SELECT SUM(o) AS n FROM obs),
rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
ct AS (SELECT segment, SUM(o) AS c FROM obs GROUP BY 1),
cells AS (
    SELECT obs.event_type, obs.o,
           CAST(rt.r AS DOUBLE) * ct.c / tot.n AS e
    FROM obs JOIN rt USING (event_type) JOIN ct USING (segment)
             CROSS JOIN tot
),
scored AS (
    SELECT event_type,
           CAST(floor((o - e) * (o - e) / e * 1e6 + 0.5) AS BIGINT)
               AS contrib_micro
    FROM cells
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)          AS n_cells,
       CAST(SUM(contrib_micro) / 1e6 AS DOUBLE) AS chi2_contrib
FROM scored GROUP BY event_type
"""


@query("chi_square_assoc", oracle=_CHI2_ORACLE)
def chi_square_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency contributions: is event_type independent of
    the user segment (user_id mod 4)? Per-event-type sum of the classic
    (observed − expected)²/expected cell statistic.

    The only real work is the contingency count — ONE partial-aggregated
    shuffle over the fact table producing #types × #segments rows.
    Marginals, expected counts, and the statistic all run on that tiny
    cell table (window totals over ~20 rows). Cross-engine exactness:
    expected counts derive from identical integers via identical IEEE
    ops, and each cell's contribution is rounded to integer micro-units
    BEFORE the per-type sum (the text_perplexity_proxy discipline), so
    summation order cannot produce drift.

    At 100 TB: the fact shuffle carries (type, segment) pairs — the
    aggregation state is bounded by the contingency table's size, not
    the data's.
    """
    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("segment")
    ).agg(F.count(F.lit(1)).alias("o"))
    w_all = Window.partitionBy()
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("segment")
    cells = obs.select(
        "event_type",
        "o",
        (
            F.sum("o").over(w_row).cast("double")
            * F.sum("o").over(w_col)
            / F.sum("o").over(w_all)
        ).alias("e"),
    )
    contrib = F.floor(
        (F.col("o") - F.col("e"))
        * (F.col("o") - F.col("e"))
        / F.col("e")
        * 1e6
        + 0.5
    ).cast("long")
    return (
        cells.select("event_type", contrib.alias("contrib_micro"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            (F.sum("contrib_micro") / 1e6).cast("double").alias("chi2_contrib"),
        )
    )


# --------------------------------------------------------------------------
# Correlation matrix — all measure pairs in ONE pass
# --------------------------------------------------------------------------

_CORR_VARS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    rows = []
    for i, a in enumerate(_CORR_VARS):
        for b in _CORR_VARS[i + 1 :]:
            rows.append(
                f"SELECT '{a}' AS var_a, '{b}' AS var_b,"
                f" CAST(round(corr({a}, {b}), 6) AS DOUBLE) AS corr"
                f" FROM lineitem"
            )
    return "\nUNION ALL\n".join(rows)


@query("agg_corr_matrix", oracle=_corr_oracle())
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of all four lineitem measures — the
    multivariate screen run before any modeling on warehouse columns.
    All 6 pairs compute in ONE partial-aggregated pass (co-moment
    aggregates are a monoid, so adding pairs adds agg expressions, not
    scans), then an in-row unpivot emits the (var_a, var_b, corr)
    triangle. Rounded to 6 dp — the agg_regression device: co-moment
    merge order differs across engines in the last ulps.
    """
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    names = []
    for i, a in enumerate(_CORR_VARS):
        for b in _CORR_VARS[i + 1 :]:
            names.append((a, b))
            aggs.append(F.round(F.corr(a, b), 6).alias(f"c{len(names)}"))
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("var_a"),
                F.lit(b).alias("var_b"),
                F.col(f"c{i + 1}").cast("double").alias("corr"),
            )
            for i, (a, b) in enumerate(names)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# --------------------------------------------------------------------------
# A/B experiment readout — two-proportion z-test on a hash-assigned split
# --------------------------------------------------------------------------

_AB_ORACLE = """
WITH assigned AS (
    SELECT user_id,
           ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events
    GROUP BY 1
),
arms AS (
    SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
               AS conv_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
               AS conv_b
    FROM assigned
)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(CAST(conv_a AS DOUBLE) / n_a AS DOUBLE) AS rate_a,
       CAST(CAST(conv_b AS DOUBLE) / n_b AS DOUBLE) AS rate_b,
       CAST(round(
           (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
           / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b)), 6) AS DOUBLE) AS z_score
FROM arms
"""


@query("ab_test_proportions", oracle=_AB_ORACLE)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: users hash-assigned to arms A/B
    (md5('ab:'||user_id) mod 2 — the sample_hash_split device, so
    assignment is reproducible and join-free), per-user conversion =
    any purchase event, and the two-proportion z-statistic comparing
    arms. This is the query every experimentation platform materializes
    per metric per day.

    Scale shape: one user_id shuffle produces per-user (arm, converted)
    — conversion folds map-side via MAX — then the arm totals reduce to
    a single row; the z-score is a handful of IEEE ops over exact
    integers, rounded 6 dp (the co-moment discipline) because sqrt's
    argument assembles differently-ordered sums across engines.
    """
    ev = table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    assigned = ev.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted"),
    )
    arms = assigned.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = F.round(
        (rate_a - rate_b)
        / F.sqrt(
            p_pool
            * (1.0 - p_pool)
            * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
        6,
    )
    return arms.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.cast("double").alias("rate_a"),
        rate_b.cast("double").alias("rate_b"),
        z.cast("double").alias("z_score"),
    )


# --------------------------------------------------------------------------
# Population-stability drift monitor (PSI) between two time windows
# --------------------------------------------------------------------------

_PSI_CUTOFF = "2024-01-11 00:00:00"
_PSI_BUCKET_CENTS = 2000  # $20 value bands
_PSI_ALERT = 0.1

_PSI_ORACLE = f"""
WITH binned AS (
    SELECT event_type,
           CAST(round(value * 100) AS BIGINT) // {_PSI_BUCKET_CENTS}
               AS bucket,
           CASE WHEN ts <= TIMESTAMP '{_PSI_CUTOFF}' THEN 1 ELSE 0 END
               AS is_ref
    FROM events
),
cells AS (
    SELECT event_type, bucket,
           CAST(SUM(is_ref) AS BIGINT) AS n_ref,
           CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
    FROM binned GROUP BY 1, 2
),
totals AS (
    SELECT event_type,
           CAST(SUM(n_ref) AS BIGINT) AS t_ref,
           CAST(SUM(n_cur) AS BIGINT) AS t_cur,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM cells GROUP BY 1
),
contrib AS (
    SELECT c.event_type, t.t_ref, t.t_cur, t.n_buckets,
           CAST(round(
               ((CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + t.n_buckets))
                - (CAST(c.n_cur + 1 AS DOUBLE) / (t.t_cur + t.n_buckets)))
               * ln((CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + t.n_buckets))
                    / (CAST(c.n_cur + 1 AS DOUBLE) / (t.t_cur + t.n_buckets)))
               * 1000000000) AS BIGINT) AS psi_nano
    FROM cells c JOIN totals t USING (event_type)
)
SELECT event_type,
       CAST(MAX(t_ref) AS BIGINT) AS n_ref,
       CAST(MAX(t_cur) AS BIGINT) AS n_cur,
       CAST(MAX(n_buckets) AS BIGINT) AS n_buckets,
       CAST(SUM(psi_nano) / 1000000000.0 AS DOUBLE) AS psi,
       SUM(psi_nano) > {_PSI_ALERT} * 1000000000 AS drifted
FROM contrib
GROUP BY event_type
ORDER BY event_type
"""


@query("drift_psi_monitor", oracle=_PSI_ORACLE)
def drift_psi_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitoring: the Population Stability Index of the
    value distribution per event type, reference window vs current
    (split at a cutoff), over $20 bands with add-one smoothing — the
    screen an ML-ops pipeline runs before trusting a feature again.
    Flags types whose PSI exceeds the conventional 0.1 alert level.

    Scale shape: ONE partial-aggregated shuffle builds the
    (type, bucket) cell table with both window counts as conditional
    sums (no second scan for the second window); totals re-aggregate
    the dust-sized cells and join back. Cross-engine exactness uses
    the perplexity-proxy discipline: each bucket's PSI term is rounded
    to integer NANO-units BEFORE the per-type sum, so the
    order-sensitive float addition becomes an exact bigint sum; ln()
    on identical IEEE inputs is bit-identical in both engines.
    """
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit(_PSI_CUTOFF).cast("timestamp")
    binned = ev.select(
        "event_type",
        F.floor(
            F.round(F.col("value") * 100).cast("long") / _PSI_BUCKET_CENTS
        )
        .cast("long")
        .alias("bucket"),
        (F.col("ts") <= cutoff).cast("int").alias("is_ref"),
    )
    cells = binned.groupBy("event_type", "bucket").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).alias("n_cur"),
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    j = cells.join(totals, "event_type")
    p = (F.col("n_ref") + 1).cast("double") / (
        F.col("t_ref") + F.col("n_buckets")
    )
    q = (F.col("n_cur") + 1).cast("double") / (
        F.col("t_cur") + F.col("n_buckets")
    )
    psi_nano = F.round((p - q) * F.log(p / q) * 1_000_000_000).cast("long")
    return (
        j.select(
            "event_type", "t_ref", "t_cur", "n_buckets",
            psi_nano.alias("psi_nano"),
        )
        .groupBy("event_type")
        .agg(
            F.max("t_ref").alias("n_ref"),
            F.max("t_cur").alias("n_cur"),
            F.max("n_buckets").alias("n_buckets"),
            (F.sum("psi_nano") / 1_000_000_000.0)
            .cast("double")
            .alias("psi"),
            (F.sum("psi_nano") > _PSI_ALERT * 1_000_000_000).alias(
                "drifted"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Mutual information — nonlinear dependence screen for feature selection
# --------------------------------------------------------------------------

_MI_ORACLE = """
WITH cells AS (
    SELECT event_type, user_id % 4 AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_xy
    FROM events GROUP BY 1, 2
),
marg AS (
    SELECT event_type, segment, n_xy,
           CAST(SUM(n_xy) OVER (PARTITION BY event_type) AS BIGINT) AS n_x,
           CAST(SUM(n_xy) OVER (PARTITION BY segment) AS BIGINT) AS n_y,
           CAST(SUM(n_xy) OVER () AS BIGINT) AS n
    FROM cells
)
SELECT event_type, CAST(segment AS BIGINT) AS segment, n_xy,
       CAST(round(ln(CAST(n_xy * n AS DOUBLE) / (CAST(n_x AS DOUBLE) * n_y))
                  * 1000000) AS BIGINT) AS pmi_micro,
       CAST(round(
           n_xy
           * (CAST(round(ln(CAST(n_xy * n AS DOUBLE)
                            / (CAST(n_x AS DOUBLE) * n_y)) * 1000000)
                   AS BIGINT))
           * 1.0 / n) AS BIGINT) AS mi_contrib_micro
FROM marg
ORDER BY event_type, segment
"""


@query("stats_mutual_information", oracle=_MI_ORACLE)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and user segment
    (user_id mod 4) — the information-theoretic dependence screen
    feature-selection pipelines run beside chi-square: per contingency
    cell, PMI = ln(p_xy/(p_x·p_y)) and the cell's MI contribution
    (n_xy/N)·PMI, both in micro-nats; the contributions sum to the MI
    of the pair. Unlike chi-square this is the exact quantity mutual-
    information-based selectors (mRMR etc.) threshold on.

    Cross-engine exactness: PMI's log consumes one ratio assembled from
    exact bigint counts (n_xy·N as an exact integer product, divided by
    the exact product of marginals — fixed expression shape, single
    IEEE divide) and rounds to integer micro-nats; the contribution
    multiplies that INTEGER by exact counts before its own rounding, so
    no float ever feeds another float. Integer headroom: n_xy·N tops
    out at N² ≈ 1e17 « 2^63 even at petabyte row counts per cell
    family.

    Scale shape: identical to chi_square_assoc — ONE partial-aggregated
    shuffle collapses the fact table to #types × #segments cells;
    marginals are windows over that ~20-row table. The 100 TB cost is
    the scan, as it must be.
    """
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("segment")
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    marg = cells.select(
        "*",
        F.sum("n_xy").over(Window.partitionBy("event_type")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("segment")).alias("n_y"),
        F.sum("n_xy").over(Window.partitionBy()).alias("n"),
    )
    pmi_micro = F.round(
        F.log(
            (F.col("n_xy") * F.col("n")).cast("double")
            / (F.col("n_x").cast("double") * F.col("n_y"))
        )
        * 1_000_000
    ).cast("long")
    return marg.select(
        "event_type",
        F.col("segment").cast("long").alias("segment"),
        "n_xy",
        pmi_micro.alias("pmi_micro"),
        F.round(F.col("n_xy") * pmi_micro * 1.0 / F.col("n"))
        .cast("long")
        .alias("mi_contrib_micro"),
    ).orderBy("event_type", "segment")


# --------------------------------------------------------------------------
# CUPED — variance-reduced experiment readout (Deng et al. 2013)
# --------------------------------------------------------------------------

_CUPED_ORACLE = """
WITH span AS (
    SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts)) // 1)
               // 2 AS mid_us
    FROM events
),
per_user AS (
    SELECT user_id,
           ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
               ::BIGINT % 2 AS arm,
           CAST(SUM(CASE WHEN epoch_us(ts) < s.mid_us
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS x_c,
           CAST(SUM(CASE WHEN epoch_us(ts) >= s.mid_us
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS y_c
    FROM events, span s
    GROUP BY 1
),
pooled AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x_c) AS BIGINT) AS sx,
           CAST(SUM(y_c) AS BIGINT) AS sy,
           CAST(SUM(x_c * x_c) AS BIGINT) AS sxx,
           CAST(SUM(x_c * y_c) AS BIGINT) AS sxy,
           CAST(SUM(y_c * y_c) AS BIGINT) AS syy
    FROM per_user
),
theta AS (
    SELECT n, sx, sy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS th,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS rho2
    FROM pooled
)
SELECT p.arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       round(SUM(p.x_c) / 100.0 / COUNT(*), 6) AS mean_x,
       round(SUM(p.y_c) / 100.0 / COUNT(*), 6) AS mean_y,
       round(SUM(p.y_c) / 100.0 / COUNT(*)
             - t.th * (SUM(p.x_c) / 100.0 / COUNT(*)
                       - t.sx / 100.0 / t.n), 6) AS mean_y_adj,
       round(t.th, 6) AS theta,
       round(t.rho2, 6) AS var_reduction
FROM per_user p, theta t
GROUP BY p.arm, t.th, t.rho2, t.sx, t.n
ORDER BY p.arm
"""


@query("ab_cuped_adjustment", oracle=_CUPED_ORACLE)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker 2013, public): per-user post-period spend Y adjusted by the
    pre-period covariate X via Y′ = Y − θ(X − E[X]), θ = cov(X,Y)/var(X)
    fitted POOLED across arms (so the adjustment cannot bias the
    treatment contrast). The pre/post split is the midpoint of the
    dataset's time span in exact epoch-micros; arms ride the same
    reproducible md5 assignment as ab_test_proportions. Emits, per arm:
    user count, raw means, the CUPED-adjusted mean, pooled θ, and ρ² —
    the fraction of metric variance the covariate removes, i.e. how
    much smaller the experiment could have been.

    Cross-engine exactness: per-user X and Y aggregate as exact cents
    (functions/exact.py discipline), so the pooled co-moments are exact
    bigint sums; θ and ρ² assemble from those integers with fixed-shape
    IEEE arithmetic and every emitted double rounds at 6 dp. Headroom:
    Σx² of per-user cents clears bigint through ~1e8 users at this
    activity level; beyond that the co-moments move to DECIMAL(38).

    Scale shape: ONE user_id shuffle builds per-user (arm, X, Y) with
    map-side partial sums; the co-moments collapse to a 1-row pooled
    frame (broadcast); the per-arm readout is a ≤2-row aggregate over
    the same per-user frame. Nothing downstream of the first shuffle
    touches fact-table volume — CUPED at 100 TB costs exactly one scan
    plus one shuffle, same as the unadjusted readout.
    """
    from ..functions.exact import cents

    ev = table(spark, sf_dir, "events")
    span = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
            / F.lit(2).cast("long")
        )
        .cast("long")
        .alias("mid_us")
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    per_user = (
        ev.crossJoin(F.broadcast(span))  # bounded: 1-row global aggregate
        .groupBy("user_id")
        .agg(
            F.first(arm).alias("arm"),
            F.sum(
                F.when(
                    F.unix_micros("ts") < F.col("mid_us"),
                    cents("value"),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("x_c"),
            F.sum(
                F.when(
                    F.unix_micros("ts") >= F.col("mid_us"),
                    cents("value"),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("y_c"),
        )
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_c").cast("long").alias("sx"),
        F.sum("y_c").cast("long").alias("sy"),
        F.sum(F.col("x_c") * F.col("x_c")).cast("long").alias("sxx"),
        F.sum(F.col("x_c") * F.col("y_c")).cast("long").alias("sxy"),
        F.sum(F.col("y_c") * F.col("y_c")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    theta = pooled.select(
        "n",
        "sx",
        (cov_n / varx_n).alias("th"),
        (cov_n * cov_n / (varx_n * vary_n)).alias("rho2"),
    )
    mean_x = F.sum("x_c") / 100.0 / F.count(F.lit(1))
    mean_y = F.sum("y_c") / 100.0 / F.count(F.lit(1))
    return (
        per_user.crossJoin(F.broadcast(theta))  # bounded: 1-row global aggregate
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(mean_x, 6).cast("double").alias("mean_x"),
            F.round(mean_y, 6).cast("double").alias("mean_y"),
            F.round(
                mean_y
                - F.first("th")
                * (mean_x - F.first("sx") / 100.0 / F.first("n")),
                6,
            )
            .cast("double")
            .alias("mean_y_adj"),
            F.round(F.first("th"), 6).cast("double").alias("theta"),
            F.round(F.first("rho2"), 6).cast("double").alias(
                "var_reduction"
            ),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# Off-policy evaluation: IPS / SNIPS over logged interactions
# --------------------------------------------------------------------------

_OPE_ACTIONS = ("click", "purchase", "view")  # 3-arm logged bandit
_OPE_K = len(_OPE_ACTIONS)

_OPE_ORACLE = f"""
WITH logs AS (
    SELECT user_id % 4 AS ctx,
           event_type AS action,
           CAST(round(value * 100) AS BIGINT) AS reward_cents
    FROM events
    WHERE event_type IN ('click', 'purchase', 'view')
),
arm_stats AS (
    SELECT ctx, action,
           CAST(SUM(reward_cents) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM logs GROUP BY 1, 2
),
target AS (
    SELECT ctx, action AS target_action
    FROM (
        SELECT ctx, action,
               row_number() OVER (
                   PARTITION BY ctx
                   ORDER BY cents * 1.0 / n DESC, action
               ) AS rn
        FROM arm_stats
    ) WHERE rn = 1
),
weighted AS (
    SELECT l.ctx,
           t.target_action,
           CAST(COUNT(*) AS BIGINT) AS n_logged,
           CAST(SUM(CASE WHEN l.action = t.target_action
                         THEN {_OPE_K} * l.reward_cents ELSE 0 END)
                AS BIGINT) AS wsum_cents,
           CAST(SUM(CASE WHEN l.action = t.target_action
                         THEN {_OPE_K} ELSE 0 END) AS BIGINT) AS wsum
    FROM logs l JOIN target t ON t.ctx = l.ctx
    GROUP BY 1, 2
)
SELECT ctx, target_action, n_logged,
       CAST(ROUND(wsum_cents * 1000000.0 / n_logged) AS BIGINT)
           AS ips_micro_cents,
       CAST(ROUND(wsum_cents * 1000000.0 / wsum) AS BIGINT)
           AS snips_micro_cents
FROM weighted
ORDER BY ctx
"""


@query("ab_offpolicy_ips", oracle=_OPE_ORACLE)
def ab_offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation of a greedy target policy from logged
    bandit data (inverse-propensity scoring, Horvitz–Thompson 1952 →
    IPS, plus the self-normalized SNIPS estimator that kills IPS's
    variance blow-up): contexts are user hash buckets, the logging
    policy is uniform over {k} actions (propensity 1/{k} → weight {k}),
    the target policy plays each context's empirically-best arm, and
    both estimators read ONLY the logs — the counterfactual readout an
    experimentation platform runs before shipping a policy, without an
    online test.

    Determinism: rewards are exact cents, weights exact integers, so
    both numerators and denominators are exact bigint sums on any
    partitioning; the two final divisions micro-round identically
    cross-engine; argmax ties break on action name.

    Scale shape: one partial-aggregated shuffle builds the per-(ctx,
    arm) stats (dust-sized), the target policy is a window over that
    dust, and the estimate pass is one more keyed aggregation with the
    4-row policy table broadcast into the probe — two fact-sized
    passes total, no row-level Python.
    """
    ev = table(spark, sf_dir, "events")
    logs = ev.filter(F.col("event_type").isin(*_OPE_ACTIONS)).select(
        (F.col("user_id") % 4).alias("ctx"),
        F.col("event_type").alias("action"),
        F.round(F.col("value") * 100).cast("long").alias("reward_cents"),
    )
    arm_stats = logs.groupBy("ctx", "action").agg(
        F.sum("reward_cents").alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("ctx").orderBy(
        (F.col("cents") * 1.0 / F.col("n")).desc(), "action"
    )
    target = (
        arm_stats.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("ctx", F.col("action").alias("target_action"))
    )
    hit = F.col("action") == F.col("target_action")
    weighted = (
        logs.join(F.broadcast(target), "ctx")  # bounded: enum/bucket-keyed rollup (bounded group count)
        .groupBy("ctx", "target_action")
        .agg(
            F.count(F.lit(1)).alias("n_logged"),
            F.sum(
                F.when(hit, F.lit(_OPE_K) * F.col("reward_cents")).otherwise(
                    F.lit(0)
                )
            ).alias("wsum_cents"),
            F.sum(F.when(hit, F.lit(_OPE_K)).otherwise(F.lit(0))).alias(
                "wsum"
            ),
        )
    )
    return weighted.select(
        "ctx",
        "target_action",
        "n_logged",
        F.round(F.col("wsum_cents") * 1000000.0 / F.col("n_logged"))
        .cast("long")
        .alias("ips_micro_cents"),
        F.round(F.col("wsum_cents") * 1000000.0 / F.col("wsum"))
        .cast("long")
        .alias("snips_micro_cents"),
    ).orderBy("ctx")


ab_offpolicy_ips.__doc__ = ab_offpolicy_ips.__doc__.format(k=_OPE_K)


# --------------------------------------------------------------------------
# Poisson bootstrap: distributed confidence intervals without resampling
# --------------------------------------------------------------------------

_BOOT_B = 32  # bootstrap replicates

# Cumulative Poisson(1) thresholds for the inverse-CDF draw; identical
# decimal literals in the Spark expression and the SQL oracle, compared
# against an exact md5-derived uniform, so every weight matches
# cross-engine.
_POIS = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.919698602928606",
    "0.9810118431238462",
    "0.9963401531726563",
)

_BOOT_ORACLE = f"""
WITH base AS (
    SELECT c_mktsegment AS segment, c_custkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS cents
    FROM customer
),
fan AS (
    SELECT segment, cents, b,
           (CAST(('0x' || substr(md5('boot:' || CAST(c_custkey AS VARCHAR)
                                  || ':' || CAST(b AS VARCHAR)), 1, 8))
                 AS BIGINT) + 0.5) / 4294967296.0 AS u
    FROM base, unnest(generate_series(0, {_BOOT_B - 1})) AS t(b)
),
weighted AS (
    SELECT segment, b,
           CASE WHEN u < {_POIS[0]} THEN 0
                WHEN u < {_POIS[1]} THEN 1
                WHEN u < {_POIS[2]} THEN 2
                WHEN u < {_POIS[3]} THEN 3
                WHEN u < {_POIS[4]} THEN 4
                ELSE 5 END AS w,
           cents
    FROM fan
),
reps AS (
    SELECT segment, b,
           SUM(w * cents) * 1.0 / SUM(w) AS rep_mean_cents
    FROM weighted
    GROUP BY 1, 2
    HAVING SUM(w) > 0
),
cis AS (
    SELECT segment, list_sort(list(rep_mean_cents)) AS means,
           CAST(COUNT(*) AS BIGINT) AS n_reps
    FROM reps GROUP BY 1
)
SELECT segment, n_reps,
       CAST(round(means[2]) AS BIGINT) AS ci_lo_cents,
       CAST(round(means[CAST(n_reps AS INTEGER) - 1]) AS BIGINT)
           AS ci_hi_cents
FROM cis
ORDER BY segment
"""


@query("stats_bootstrap_ci_poisson", oracle=_BOOT_ORACLE)
def stats_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence intervals the way a distributed engine can
    actually afford them: the POISSON bootstrap — instead of drawing B
    resamples (impossible without materializing the dataset B times),
    every row carries B independent Poisson(1) weights, and each
    replicate's statistic is a weighted aggregate. One fan-out + one
    partial-aggregated shuffle replaces B passes; the approximation to
    multinomial resampling is exact as n→∞ (Chamandy et al., Google,
    2012 — "Estimating uncertainty for massive data streams").

    Determinism: weights come from md5-seeded uniforms through an
    explicit inverse-CDF threshold chain (identical decimal literals in
    both engines), replicate means are exact-bigint ratios, and the CI
    is an order statistic over the sorted replicate means (2nd smallest
    / 2nd largest of {b} ≈ 94% interval).

    Scale shape: explode ×{b} collapses map-side into per-(segment,
    replicate) partials — shuffled rows = segments×{b}, independent of
    corpus size; the CI step sorts {b} doubles per segment.
    """
    base = table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    fan = base.select(
        "segment",
        "cents",
        "c_custkey",
        F.explode(
            F.sequence(F.lit(0), F.lit(_BOOT_B - 1))
        ).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("c_custkey").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    w = (
        F.when(u < float(_POIS[0]), 0)
        .when(u < float(_POIS[1]), 1)
        .when(u < float(_POIS[2]), 2)
        .when(u < float(_POIS[3]), 3)
        .when(u < float(_POIS[4]), 4)
        .otherwise(5)
    )
    reps = (
        fan.select("segment", "b", w.alias("w"), "cents")
        .groupBy("segment", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("wc"),
            F.sum("w").alias("wsum"),
        )
        .filter(F.col("wsum") > 0)
        .select(
            "segment",
            (F.col("wc") * 1.0 / F.col("wsum")).alias("rep_mean_cents"),
        )
    )
    cis = reps.groupBy("segment").agg(
        F.sort_array(F.collect_list("rep_mean_cents")).alias("means"),
        F.count(F.lit(1)).alias("n_reps"),
    )
    return cis.select(
        "segment",
        "n_reps",
        F.round(F.element_at("means", 2)).cast("long").alias("ci_lo_cents"),
        F.round(
            F.element_at("means", (F.col("n_reps") - 1).cast("int"))
        )
        .cast("long")
        .alias("ci_hi_cents"),
    ).orderBy("segment")


stats_bootstrap_ci_poisson.__doc__ = stats_bootstrap_ci_poisson.__doc__.format(
    b=_BOOT_B
)


# --------------------------------------------------------------------------
# TOST equivalence test — "statistically the same", not just "not different"
# --------------------------------------------------------------------------

_TOST_MARGIN_CENTS = 500  # ±δ: arms equivalent within 5.00 value units
_TOST_Z = 1.6448536269514722  # z_{0.95}; identical literal both engines

_TOST_ORACLE = f"""
WITH assign AS (
    SELECT event_type,
           user_id % 2 AS arm,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
arms AS (
    SELECT event_type, arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS s,
           CAST(SUM(cents * cents) AS BIGINT) AS ss
    FROM assign GROUP BY 1, 2
),
wide AS (
    SELECT event_type,
           MAX(CASE WHEN arm = 0 THEN n END) AS n0,
           MAX(CASE WHEN arm = 0 THEN s END) AS s0,
           MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
           MAX(CASE WHEN arm = 1 THEN n END) AS n1,
           MAX(CASE WHEN arm = 1 THEN s END) AS s1,
           MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
    FROM arms GROUP BY 1
),
calc AS (
    SELECT event_type, n0, n1,
           s0 * 1.0 / n0 - s1 * 1.0 / n1 AS diff,
           sqrt((ss0 - s0 * 1.0 / n0 * s0) / (n0 - 1) / n0
                + (ss1 - s1 * 1.0 / n1 * s1) / (n1 - 1) / n1) AS se
    FROM wide
)
SELECT event_type, n0 AS n_arm0, n1 AS n_arm1,
       CAST(ROUND(diff * 1000000) AS BIGINT) AS diff_micro_cents,
       CAST(ROUND(se * 1000000) AS BIGINT) AS se_micro_cents,
       CAST(ROUND((diff + {_TOST_MARGIN_CENTS}) / se * 1000000) AS BIGINT)
           AS t_lower_micro,
       CAST(ROUND((diff - {_TOST_MARGIN_CENTS}) / se * 1000000) AS BIGINT)
           AS t_upper_micro,
       (diff + {_TOST_MARGIN_CENTS}) / se > {_TOST_Z}
           AND (diff - {_TOST_MARGIN_CENTS}) / se < -{_TOST_Z}
           AS equivalent
FROM calc
ORDER BY event_type
"""


@query("ab_tost_equivalence", oracle=_TOST_ORACLE)
def ab_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test per event type (Schuirmann 1987): two
    one-sided Welch z-tests against the margin ±{d} cents — the readout
    a platform needs when the CLAIM is "the treatment changed nothing"
    (a plain t-test's non-significance is absence of evidence, not
    equivalence). Completes the experimentation family next to
    ab_test_proportions (difference) and ab_cuped_adjustment (variance
    reduction).

    Determinism: per-arm n/Σx/Σx² are exact bigints (cents), so means,
    Welch SE, and both t statistics are fixed double expressions with
    identical literals cross-engine; outputs micro-rounded, verdict a
    boolean on the same expressions.

    Scale shape: one partial-aggregated shuffle to (type, arm) — six
    integers per arm — then dust arithmetic.
    """
    ev = table(spark, sf_dir, "events")
    assign = ev.select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    arms = assign.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    wide = arms.groupBy("event_type").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("ss"))).alias("ss1"),
    )
    diff = F.col("s0") * 1.0 / F.col("n0") - F.col("s1") * 1.0 / F.col("n1")
    se = F.sqrt(
        (F.col("ss0") - F.col("s0") * 1.0 / F.col("n0") * F.col("s0"))
        / (F.col("n0") - 1)
        / F.col("n0")
        + (F.col("ss1") - F.col("s1") * 1.0 / F.col("n1") * F.col("s1"))
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    calc = wide.select(
        "event_type",
        F.col("n0").alias("n_arm0"),
        F.col("n1").alias("n_arm1"),
        diff.alias("diff"),
        se.alias("se"),
    )
    t_lo = (F.col("diff") + _TOST_MARGIN_CENTS) / F.col("se")
    t_hi = (F.col("diff") - _TOST_MARGIN_CENTS) / F.col("se")
    return calc.select(
        "event_type",
        "n_arm0",
        "n_arm1",
        F.round(F.col("diff") * 1000000).cast("long").alias(
            "diff_micro_cents"
        ),
        F.round(F.col("se") * 1000000).cast("long").alias("se_micro_cents"),
        F.round(t_lo * 1000000).cast("long").alias("t_lower_micro"),
        F.round(t_hi * 1000000).cast("long").alias("t_upper_micro"),
        ((t_lo > _TOST_Z) & (t_hi < -_TOST_Z)).alias("equivalent"),
    ).orderBy("event_type")


ab_tost_equivalence.__doc__ = ab_tost_equivalence.__doc__.format(
    d=_TOST_MARGIN_CENTS
)


# --------------------------------------------------------------------------
# Mann–Kendall trend test — nonparametric monotone-trend monitor
# --------------------------------------------------------------------------

# Split into the raw->monthly reduction and the readout so Spark can
# materialize `monthly` ONCE (localCheckpoint): Spark inlines CTEs, and
# the readout references monthly four times — inlined, that re-scanned
# orders x customer 4x. Both fragments are the identical text DuckDB
# runs (the oracle stitches them back into one WITH chain).
_MK_MONTHLY_SQL = """
    SELECT c.c_nationkey AS nation,
           EXTRACT(YEAR FROM o.o_orderdate) * 100
               + EXTRACT(MONTH FROM o.o_orderdate) AS ym,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_nationkey < 5
    GROUP BY 1, 2
"""

_MK_READOUT_SQL = """
WITH pairs AS (
    SELECT a.nation,
           CASE WHEN b.rev_cents > a.rev_cents THEN 1
                WHEN b.rev_cents < a.rev_cents THEN -1
                ELSE 0 END AS sgn
    FROM monthly a
    JOIN monthly b ON b.nation = a.nation AND b.ym > a.ym
),
s_stat AS (
    SELECT nation, CAST(SUM(sgn) AS BIGINT) AS s FROM pairs GROUP BY nation
),
ties AS (
    SELECT nation,
           CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
    FROM (SELECT nation, CAST(COUNT(*) AS BIGINT) AS t
          FROM monthly GROUP BY nation, rev_cents)
    GROUP BY nation
),
counts AS (
    SELECT nation, CAST(COUNT(*) AS BIGINT) AS n FROM monthly GROUP BY nation
)
SELECT c.nation,
       c.n AS n_months,
       s.s AS s_stat,
       c.n * (c.n - 1) * (2 * c.n + 5) - t.tie_term AS var18,
       CAST(round(
           (s.s - CASE WHEN s.s > 0 THEN 1
                       WHEN s.s < 0 THEN -1 ELSE 0 END)
           / sqrt((c.n * (c.n - 1) * (2 * c.n + 5) - t.tie_term) / 18.0)
           * 1000000) AS BIGINT) AS z_micro
FROM counts c
JOIN s_stat s ON s.nation = c.nation
JOIN ties t ON t.nation = c.nation
ORDER BY c.nation
"""

_MK_ORACLE = (
    "WITH monthly AS ("
    + _MK_MONTHLY_SQL
    + "), "
    + _MK_READOUT_SQL.lstrip()[len("WITH ") :]
)


def _mk_monthly_view(spark: SparkSession, sf_dir: str) -> None:
    """Build + register the nations×months dust table ONCE per
    (session, sf_dir) — the `_cosupply_edges` fixture-memo discipline
    (r12 optimization round, guide §5 lineage/caching): the eager
    localCheckpoint is a full orders⋈customer aggregation job, and all
    THREE trend queries (MK, Theil–Sen, seasonal MK) re-ran it on every
    build. The checkpointed 400-row artifact is the shared fixture; a
    switched sf_dir re-materializes and re-binds the view."""
    from ..catalog import (  # noqa: PLC0415
        _session_cache,
        derived_memo_key,
        register_views,
    )

    cache = _session_cache(spark)
    key = derived_memo_key("mk_monthly", sf_dir, ("orders", "customer"))
    monthly = cache.get(key)
    if monthly is None:
        # All ten canonical views through the memoized registrar — an
        # ad-hoc bind of a subset would silently desync its ident memo.
        register_views(spark, sf_dir)
        monthly = spark.sql(_MK_MONTHLY_SQL).localCheckpoint(eager=True)
        cache[key] = monthly
    # ALWAYS re-bind: `monthly` is a shared name the fuzz suites also
    # bind to synthetic series (test_ks_fuzz, test_round10_fuzz), so an
    # id-keyed binding memo here served a foreign table after a fuzz
    # test ran. One createOrReplaceTempView RPC per build is dust; the
    # expensive part (the checkpoint job) stays memoized above.
    monthly.createOrReplaceTempView("monthly")


@query("trend_mann_kendall", oracle=_MK_ORACLE)
def trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test per nation over the monthly
    revenue series — the standard nonparametric drift monitor for
    pipeline health metrics (no distribution assumed, robust to
    outliers, exactly what you point at a KPI before alerting on
    'revenue is trending down'). S = Σ_{i<j} sign(x_j − x_i); the
    variance uses the exact tie correction, kept as INTEGER 18·Var =
    n(n−1)(2n+5) − Σ_t t(t−1)(2t+5); z applies the continuity
    correction (S ∓ 1) and is rounded to integer micro-units after one
    identical IEEE sqrt/divide on both engines — the IDENTICAL SQL
    text runs on Spark and DuckDB (subquery_exists discipline).

    Scale shape: the raw fact table reduces to nations×months rows in
    one partial-aggregated shuffle FIRST; the O(n²) pair enumeration
    runs on that dust table (≤5 nations × ~80 months → ~3k comparisons
    per nation), never on raw rows — at 100 TB the month reduction is
    the same one shuffle and the quadratic stage is still dust. The
    nation < 5 filter keeps the demo bounded; production would shard
    the series-id space instead.
    """
    # Materialize the months dust table ONCE per session (~5 nations x
    # ~80 months); the four readout references then read checkpointed
    # blocks instead of re-scanning orders x customer per CTE reference.
    _mk_monthly_view(spark, sf_dir)
    return spark.sql(_MK_READOUT_SQL)


# --------------------------------------------------------------------------
# Theil–Sen slope — robust trend magnitude (companion to Mann–Kendall)
# --------------------------------------------------------------------------

_TS_READOUT_SQL = """
WITH idx AS (
    SELECT nation, ym, rev_cents,
           CAST(row_number() OVER (PARTITION BY nation ORDER BY ym)
                AS BIGINT) AS t
    FROM monthly
),
slopes AS (
    SELECT a.nation,
           CAST(round((b.rev_cents - a.rev_cents) * 1.0 / (b.t - a.t))
                AS BIGINT) AS slope_cents
    FROM idx a
    JOIN idx b ON b.nation = a.nation AND b.t > a.t
),
ranked AS (
    SELECT nation, slope_cents,
           row_number() OVER (PARTITION BY nation
                              ORDER BY slope_cents) AS rn,
           COUNT(*) OVER (PARTITION BY nation) AS n
    FROM slopes
)
SELECT nation,
       CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(FLOOR(SUM(slope_cents) * 1.0 / COUNT(*)) AS BIGINT)
           AS ts_slope_cents
FROM ranked
WHERE 2 * rn IN (n, n + 1, n + 2)
GROUP BY nation
ORDER BY nation
"""

_TS_ORACLE = (
    "WITH monthly AS ("
    + _MK_MONTHLY_SQL
    + "), "
    + _TS_READOUT_SQL.lstrip()[len("WITH ") :]
)


@query("trend_theil_sen", oracle=_TS_ORACLE)
def trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen slope per nation over the monthly revenue series — the
    robust trend MAGNITUDE that pairs with trend_mann_kendall's
    direction/significance readout (median of all pairwise slopes:
    29% breakdown point, no residual-normality assumption — the
    estimator monitoring stacks quote as 'revenue is drifting −X per
    month'). Slopes are rounded to integer cents/month at birth; the
    median is the exact middle order statistic(s) selected WITHOUT an
    integer-division spelling (2·rn ∈ {n, n+1, n+2} hits exactly the
    one (odd n) or two (even n) middle ranks), then floor-averaged —
    identical SQL text on both engines.

    Scale shape: shares trend_mann_kendall's materialized months dust
    table (the raw fact collapses once); the O(n²) slope enumeration
    and the ranking window run on ≤5 nations × ~80 months. At scale
    the series-id space shards; the per-series pair count is bounded
    by the retention window, not the corpus.
    """
    _mk_monthly_view(spark, sf_dir)
    return spark.sql(_TS_READOUT_SQL)


# --------------------------------------------------------------------------
# Mann–Whitney U — rank-based two-sample test without a global sort
# --------------------------------------------------------------------------

_MW_BUCKET_CENTS = 100_000  # $1000 segments for the two-pass prefix sum

# Identical final-arithmetic expression on both engines (exact bigint
# inputs, one IEEE expression, micro-rounded once). u2 = 2U.
_MW_Z_EXPR = (
    "CAST(round((u2 - na * nb) / (2 * sqrt(na * 1.0 * nb * "
    "((na + nb) * (na + nb - 1.0) * (na + nb + 1) - tie) "
    "/ (12.0 * (na + nb) * (na + nb - 1)))) * 1000000) AS BIGINT)"
)

_MW_ORACLE = f"""
WITH base AS (
    SELECT o_orderpriority AS grp,
           o_orderkey % 2 AS arm,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
g AS (
    SELECT grp, cents,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM base GROUP BY 1, 2
),
p AS (
    SELECT grp, n_a, n_b,
           COALESCE(SUM(n_b) OVER (
               PARTITION BY grp ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS cum_b
    FROM g
),
agg AS (
    SELECT grp,
           CAST(SUM(n_a) AS BIGINT) AS na,
           CAST(SUM(n_b) AS BIGINT) AS nb,
           CAST(SUM(2 * n_a * cum_b + n_a * n_b) AS BIGINT) AS u2,
           CAST(SUM((n_a + n_b) * (n_a + n_b) * (n_a + n_b)
                    - (n_a + n_b)) AS BIGINT) AS tie
    FROM p GROUP BY grp
)
SELECT grp, na, nb, u2, tie, {_MW_Z_EXPR} AS z_micro
FROM agg
ORDER BY grp
"""


@query("ab_mann_whitney", oracle=_MW_ORACLE)
def ab_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U per order priority (arms = order key parity) —
    the RANK-based two-sample test that completes the experimentation
    family (proportions z, CUPED, TOST, IPS are all mean/ratio-shaped;
    this one detects distributional shift with no normality assumption,
    the standard test for skewed revenue-per-unit metrics). Emits exact
    2U (so ties' half-steps stay integer), the exact tie term Σ(t³−t),
    and the normal-approximation z in micro-units.

    Cross-engine exactness: U is assembled from exact bigint counts —
    2U = Σ_groups (2·n_a·cumB_before + n_a·n_b) — and the z expression
    is ONE shared arithmetic string ({z}) evaluated on exact integers
    by both engines.

    Scale shape — the interesting part is computing a RANK statistic
    with no global sort: the value-group table (one partial-aggregated
    shuffle) gets its B-count prefix sums via the segmented two-pass
    device (skyline_pareto / concurrency_peak): a window INSIDE each
    $1000 value bucket plus a running total over the per-bucket dust
    table, so no window ever spans more than one bucket of one
    priority group. The oracle uses the naive full-partition window —
    proving the segmented decomposition exact, not merely plausible.
    """
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_orderkey") % 2).alias("arm"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return mw_statistic(base)


def mw_statistic(base: DataFrame) -> DataFrame:
    """Exact-integer Mann–Whitney over a (grp, arm, cents) frame — the
    kernel behind ab_mann_whitney, shared with the batched differential
    fuzz (tests/test_ks_fuzz.py) so random-case parity against a
    transparent reference covers the kernel the registry query runs.
    Emits per grp: arm sizes, exact 2U, the tie term Σ(t³−t), and the
    tie-corrected normal z in micro-units."""
    g = base.groupBy("grp", "cents").agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
    )
    bucketed = g.withColumn(
        "bucket", (F.col("cents") / _MW_BUCKET_CENTS).cast("long")
    )
    w_local = (
        Window.partitionBy("grp", "bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "local_prev", F.sum("n_b").over(w_local)
    )
    bucket_tots = bucketed.groupBy("grp", "bucket").agg(
        F.sum("n_b").alias("bucket_b")
    )
    w_buckets = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = bucket_tots.select(
        "grp",
        "bucket",
        F.sum("bucket_b").over(w_buckets).alias("prior_b"),
    )
    p = local.join(prior, ["grp", "bucket"]).select(
        "grp",
        "n_a",
        "n_b",
        (
            F.coalesce("local_prev", F.lit(0))
            + F.coalesce("prior_b", F.lit(0))
        ).alias("cum_b"),
    )
    t = F.col("n_a") + F.col("n_b")
    agg = p.groupBy("grp").agg(
        F.sum("n_a").cast("long").alias("na"),
        F.sum("n_b").cast("long").alias("nb"),
        F.sum(2 * F.col("n_a") * F.col("cum_b") + F.col("n_a") * F.col("n_b"))
        .cast("long")
        .alias("u2"),
        F.sum(t * t * t - t).cast("long").alias("tie"),
    )
    return agg.select(
        "grp", "na", "nb", "u2", "tie",
        F.expr(_MW_Z_EXPR).alias("z_micro"),
    ).orderBy("grp")


ab_mann_whitney.__doc__ = ab_mann_whitney.__doc__.format(z=_MW_Z_EXPR)


# --------------------------------------------------------------------------
# Kolmogorov–Smirnov two-sample test — exact integer D, no global sort
# --------------------------------------------------------------------------

# D's argmax compares |cumA/na - cumB/nb| — cross-multiplied to the
# exact bigint |cumA*nb - cumB*na| so the max needs no float compares.
_KS_LAMBDA_EXPR = (
    "CAST(round(d_num * 1.0 / (na * nb) "
    "* sqrt(na * 1.0 * nb / (na + nb)) * 1000000) AS BIGINT)"
)

_KS_ORACLE = f"""
WITH base AS (
    SELECT o_orderpriority AS grp,
           o_orderkey % 2 AS arm,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
g AS (
    SELECT grp, cents,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM base GROUP BY 1, 2
),
p AS (
    SELECT grp, cents,
           SUM(n_a) OVER (PARTITION BY grp ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
           SUM(n_b) OVER (PARTITION BY grp ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
    FROM g
),
tot AS (
    SELECT grp, CAST(SUM(n_a) AS BIGINT) AS na, CAST(SUM(n_b) AS BIGINT) AS nb
    FROM g GROUP BY grp
),
agg AS (
    SELECT p.grp, t.na, t.nb,
           CAST(MAX(ABS(p.cum_a * t.nb - p.cum_b * t.na)) AS BIGINT)
               AS d_num
    FROM p JOIN tot t ON t.grp = p.grp
    GROUP BY p.grp, t.na, t.nb
)
SELECT grp, na, nb, d_num,
       CAST(round(d_num * 1000000.0 / (na * nb)) AS BIGINT) AS d_micro,
       {_KS_LAMBDA_EXPR} AS lambda_micro
FROM agg
ORDER BY grp
"""


@query("drift_ks_two_sample", oracle=_KS_ORACLE)
def drift_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov two-sample statistic per order priority —
    the distribution-level drift test that pairs with the binned
    drift_psi_monitor (PSI needs bucket choices; KS is the
    supremum-CDF-gap test with none) and with ab_mann_whitney
    (location shift vs ANY distributional difference). Emits the exact
    integer numerator D·na·nb = max|cumA·nb − cumB·na| — the argmax
    involves NO float comparisons — plus D and the asymptotic
    λ = D·√(na·nb/(na+nb)) in micro-units from one shared expression.

    Scale shape: identical to ab_mann_whitney's rank device — one
    partial-aggregated shuffle to per-value arm counts, then BOTH
    inclusive prefix sums via the segmented two-pass trick ($1000
    value buckets: in-bucket windows + per-bucket running totals), so
    no window spans more than one bucket of one group; the oracle uses
    the naive full-partition window, proving the decomposition exact.
    """
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_orderkey") % 2).alias("arm"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return ks_statistic(base)


def ks_statistic(base: DataFrame) -> DataFrame:
    """Exact-integer two-sample KS over a (grp, arm, cents) frame — the
    kernel behind drift_ks_two_sample, shared with the volume suite so
    the segmented prefix-sum device proven closed-form at 10M rows is
    the one the registry query runs. Emits per grp: arm sizes, the
    integer numerator D·na·nb, and D / λ in micro-units."""
    g = base.groupBy("grp", "cents").agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
    )
    bucketed = g.withColumn(
        "bucket", (F.col("cents") / _MW_BUCKET_CENTS).cast("long")
    )
    w_local = (
        Window.partitionBy("grp", "bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.select(
        "grp",
        "bucket",
        "cents",
        F.sum("n_a").over(w_local).alias("loc_a"),
        F.sum("n_b").over(w_local).alias("loc_b"),
    )
    bucket_tots = bucketed.groupBy("grp", "bucket").agg(
        F.sum("n_a").alias("ba"), F.sum("n_b").alias("bb")
    )
    w_buckets = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = bucket_tots.select(
        "grp",
        "bucket",
        F.sum("ba").over(w_buckets).alias("pa"),
        F.sum("bb").over(w_buckets).alias("pb"),
    )
    p = local.join(prior, ["grp", "bucket"]).select(
        "grp",
        (F.col("loc_a") + F.coalesce("pa", F.lit(0))).alias("cum_a"),
        (F.col("loc_b") + F.coalesce("pb", F.lit(0))).alias("cum_b"),
    )
    tot = g.groupBy("grp").agg(
        F.sum("n_a").cast("long").alias("na"),
        F.sum("n_b").cast("long").alias("nb"),
    )
    agg = (
        p.join(F.broadcast(tot), "grp")  # bounded: k-row per-group totals (bounded group count)
        .groupBy("grp", "na", "nb")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("nb")
                    - F.col("cum_b") * F.col("na")
                )
            )
            .cast("long")
            .alias("d_num")
        )
    )
    return agg.select(
        "grp",
        "na",
        "nb",
        "d_num",
        F.expr(
            "CAST(round(d_num * 1000000.0 / (na * nb)) AS BIGINT)"
        ).alias("d_micro"),
        F.expr(_KS_LAMBDA_EXPR).alias("lambda_micro"),
    ).orderBy("grp")


# --------------------------------------------------------------------------
# One-way ANOVA (events.value across event_type)
# --------------------------------------------------------------------------

_ANOVA_CORRECTION = (
    "CAST(round(CAST(s_all AS DOUBLE) / n_total * s_all) AS BIGINT)"
)

# F pinned at micro precision, NULL on the degenerate inputs where the
# ratio is undefined (one group, zero residual df, or zero within-group
# variance): an unguarded /0 yields Infinity, which Spark CASTs to
# Long.MaxValue while DuckDB raises on CAST(inf AS BIGINT) — the guard
# makes both engines return NULL instead. All three conditions are
# exact-integer comparisons, so the guard itself cannot diverge.
_ANOVA_F_EXPR = (
    "CASE WHEN k_groups <= 1 OR n_total = k_groups"
    " OR ss_total_c2 - ss_between_c2 = 0 THEN NULL"
    " ELSE CAST(floor((CAST(ss_between_c2 AS DOUBLE) / (k_groups - 1))"
    " / (CAST(ss_total_c2 - ss_between_c2 AS DOUBLE)"
    " / (n_total - k_groups)) * 1000000 + 0.5) AS BIGINT) END"
)

_ANOVA_ORACLE = f"""
WITH g AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
    FROM events GROUP BY event_type
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS k_groups,
           CAST(SUM(s) AS BIGINT) AS s_all,
           CAST(SUM(q) AS BIGINT) AS q_all,
           CAST(SUM(CAST(round(CAST(s AS DOUBLE) / n * s) AS BIGINT))
                AS BIGINT) AS sum_between_raw
    FROM g
),
fin AS (
    SELECT n_total, k_groups,
           q_all - {_ANOVA_CORRECTION} AS ss_total_c2,
           sum_between_raw - {_ANOVA_CORRECTION} AS ss_between_c2
    FROM tot
)
SELECT n_total,
       k_groups,
       CAST(ss_between_c2 / 10000.0 AS DOUBLE) AS ss_between,
       CAST((ss_total_c2 - ss_between_c2) / 10000.0 AS DOUBLE) AS ss_within,
       {_ANOVA_F_EXPR} AS f_micro
FROM fin
"""


@query("stats_anova_oneway", oracle=_ANOVA_ORACLE)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean event value differ across event types?

    The classic sufficient-statistic decomposition — per-group (n, Σx,
    Σx²) in ONE partial-aggregated shuffle over the fact table, then
    SS_between / SS_within / F assembled on the k-row group table. No
    second pass, no centering pass: the correction-term form
    SS_total = Σx² − (Σx)²/N needs only the moments.

    Exactness: x is 2-dp exact, so Σ cents and Σ cents² are exact
    bigints on any partitioning (cents² ≤ 2.4e9/row → bigint headroom
    to ~3.8e9 rows/group; past that, rescale to whole units the same
    way functions/exact.py documents). The only divisions — s²/n per
    group and the grand correction — are single deterministic double
    ops on those exact integers, rounded to integer cents² before the
    k-term sum, so the group-order sensitivity of float Σ never
    arises. The F statistic is one double expression on the final
    integers, pinned at micro precision.

    At 100 TB this is the map-side-combine shape: the fact table never
    moves, only (event_type, n, s, q) triples do.
    """
    ev = table(spark, sf_dir, "events")
    return anova_oneway(ev.select("event_type", "value"))


def anova_oneway(frame: DataFrame) -> DataFrame:
    """ANOVA core over any (event_type, value) frame with 2-dp-exact
    values. Closed-form-proven at 5M rows by tests/test_scale_smoke.py
    (a synthetic with analytically known SS_between / SS_within)."""
    c = F.round(F.col("value") * 100).cast("long")
    g = frame.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("s"),
        F.sum(c * c).cast("long").alias("q"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("s").cast("long").alias("s_all"),
        F.sum("q").cast("long").alias("q_all"),
        F.sum(
            F.expr("CAST(round(CAST(s AS DOUBLE) / n * s) AS BIGINT)")
        )
        .cast("long")
        .alias("sum_between_raw"),
    )
    fin = tot.select(
        "n_total",
        "k_groups",
        (F.col("q_all") - F.expr(_ANOVA_CORRECTION)).alias("ss_total_c2"),
        (F.col("sum_between_raw") - F.expr(_ANOVA_CORRECTION)).alias(
            "ss_between_c2"
        ),
    )
    return fin.select(
        "n_total",
        "k_groups",
        (F.col("ss_between_c2") / F.lit(10000.0))
        .cast("double")
        .alias("ss_between"),
        ((F.col("ss_total_c2") - F.col("ss_between_c2")) / F.lit(10000.0))
        .cast("double")
        .alias("ss_within"),
        F.expr(_ANOVA_F_EXPR).alias("f_micro"),
    )


# --------------------------------------------------------------------------
# Brown–Forsythe / Levene test: variance homogeneity via the ANOVA kernel
# --------------------------------------------------------------------------

# The z-transform CTE feeds the UNCHANGED ANOVA oracle body: z carries
# |2c − 2·median| half-cent integers as value = z2/100.0, which the
# kernel's round(value·100) maps back to exactly z2 — so one oracle
# text serves both tests.
_LEVENE_ORACLE = f"""
WITH raw AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
    FROM events
),
med AS (
    SELECT event_type,
           CAST(round(2 * median(c)) AS BIGINT) AS med2
    FROM raw GROUP BY event_type
),
z AS (
    SELECT raw.event_type,
           abs(2 * raw.c - med.med2) / 100.0 AS value
    FROM raw JOIN med USING (event_type)
),
{_ANOVA_ORACLE.replace("FROM events GROUP BY event_type",
                       "FROM z GROUP BY event_type").lstrip()[len("WITH "):]}
"""


@query("stats_levene_test", oracle=_LEVENE_ORACLE)
def stats_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test (Levene's test with the
    median center — the robust form): is the SPREAD of event values the
    same across event types? This is ANOVA's mandatory companion (the
    F test assumes equal variances; this tests that assumption) and a
    drift screen in its own right — a variance shift with a stable mean
    slips past every mean-shaped monitor.

    Pure kernel composition, the eval_model_auc discipline: z_ij =
    |x_ij − median_j| routed through the SAME anova_oneway kernel —
    W IS the ANOVA F statistic on the transformed values. Exactness:
    medians of integer cents are half-integers, so 2z = |2c − 2·med| is
    an exact integer carried as z/100 (maps back to exactly 2z inside
    the kernel's cents rounding); the oracle reuses the ANOVA oracle
    body verbatim over the transform CTE. Group medians use the exact
    median aggregate over the 5 bounded groups (at 100 TB swap in the
    2-pass selection-by-counting kernel of agg_exact_median_2pass —
    same value, streaming memory); the transform join is a 5-row
    broadcast; everything after is the ANOVA one-shuffle moment pass.
    """
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    raw = ev.select("event_type", c.alias("c"))
    med = raw.groupBy("event_type").agg(
        F.round(2 * F.median("c")).cast("long").alias("med2")
    )
    z = raw.join(F.broadcast(med), "event_type").select(  # bounded: enum/bucket-keyed rollup (bounded group count)
        "event_type",
        (F.abs(2 * F.col("c") - F.col("med2")) / 100.0).alias("value"),
    )
    return anova_oneway(z)


# --------------------------------------------------------------------------
# Welch's ANOVA — the unequal-variance F test stats_levene_test points at
# --------------------------------------------------------------------------

# Per-group corrected sum of squares, the exact-bigint form shared with
# the classic ANOVA's between term.
_WELCH_SS = "q - CAST(round(CAST(s AS DOUBLE) / n * s) AS BIGINT)"

# Raw Welch weight w_j = n_j/s²_j = n_j(n_j−1)/ss_j — NULL marks a group
# the statistic is undefined for (singleton or zero variance).
_WELCH_W_RAW = (
    f"CASE WHEN n <= 1 OR {_WELCH_SS} <= 0 THEN NULL"
    f" ELSE CAST(n AS DOUBLE) * (n - 1) / CAST({_WELCH_SS} AS DOUBLE) END"
)

# Weights pinned RELATIVE to the group maximum on a pico grid: MAX over
# doubles is order-independent (unlike SUM), so wmax is exact, and
# s_pin ∈ [0, 1e12] always fits int64 with ~12 significant digits on the
# dominant weights — no absolute-scale overflow bound to document.
_WELCH_S_PIN = (
    "CASE WHEN w_raw IS NULL OR wmax IS NULL THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(1000000000000.0 * w_raw / wmax) AS BIGINT) END"
)

# Runtime poles (r12, VERDICT item 3): the two pinned products clamp
# silently in Spark / raise in DuckDB past their int64 bounds, so each
# pole is now an IN-PLAN guard — the over-pole group contributes 0 to
# the pinned sum, a flag records it, and the final F/df2 are NULL with
# over_pole = 1 in BOTH engines (the t-closeness NULL-guard pattern),
# instead of a silent cross-engine divergence on an off-fixture corpus.
_WELCH_MEAN_POLE = 9.0e6  # cents; s_pin·mean wraps at |mean| ≈ 9.2e6
_WELCH_DM_POLE = 3.0e6  # cents; s_pin·dm²/1e6 wraps at |dm| ≈ 3.03e6

# Σ s_pin·mean_j term, pinned per group before the exact bigint sum
# (s_pin ≤ 1e12, guarded |mean| < 9.0e6 cents → product fits int64).
_WELCH_WM_PIN = (
    "CASE WHEN w_raw IS NULL THEN CAST(0 AS BIGINT)"
    f" WHEN abs(CAST(s AS DOUBLE) / n) >= {_WELCH_MEAN_POLE}"
    " THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(CAST(s_pin AS DOUBLE) * s / n) AS BIGINT) END"
)

# Group-mean pole flag, aggregated in the same pass as wmsum.
_WELCH_WM_OVER = (
    "CASE WHEN w_raw IS NOT NULL"
    f" AND abs(CAST(s AS DOUBLE) / n) >= {_WELCH_MEAN_POLE}"
    " THEN 1 ELSE 0 END"
)

# Between-group term s_pin·(mean−x̄w)², carried at micro downscale; the
# 1e6 factor is restored in the final F expression. DOMAIN BOUND (r11,
# corrected): A_pin = s_pin·dm²/1e6 with s_pin ≤ 1e12, so the
# max-weight group overflows int64 once |mean_j − x̄w| exceeds
# √(2^63/1e6) ≈ 3.0e6 cents (~$30k mean deviation for the
# lowest-variance group). The pole is guarded IN-PLAN (r12): an
# over-pole group contributes 0 here and trips the a_over flag, which
# NULLs F/df2 in both engines; the fixture-margin assertion stays in
# tests/test_round11_fuzz.py.
_WELCH_A_PIN = (
    "CASE WHEN w_raw IS NULL OR ssum <= 0 THEN CAST(0 AS BIGINT)"
    " WHEN abs(CAST(s AS DOUBLE) / n - CAST(wmsum AS DOUBLE) / ssum)"
    f" >= {_WELCH_DM_POLE} THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(CAST(s_pin AS DOUBLE)"
    " * (CAST(s AS DOUBLE) / n - CAST(wmsum AS DOUBLE) / ssum)"
    " * (CAST(s AS DOUBLE) / n - CAST(wmsum AS DOUBLE) / ssum)"
    " / 1000000.0) AS BIGINT) END"
)

# Mean-deviation pole flag, aggregated in the same pass as asum.
_WELCH_A_OVER = (
    "CASE WHEN w_raw IS NOT NULL AND ssum > 0"
    " AND abs(CAST(s AS DOUBLE) / n - CAST(wmsum AS DOUBLE) / ssum)"
    f" >= {_WELCH_DM_POLE} THEN 1 ELSE 0 END"
)

# Welch correction term (1 − w_j/W)²/(n_j−1), pico-pinned; w_j/W equals
# s_pin/ssum exactly up to the pinning grid (the wmax scale cancels).
_WELCH_U_PIN = (
    "CASE WHEN w_raw IS NULL OR ssum <= 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(1000000000000.0"
    " * (1.0 - CAST(s_pin AS DOUBLE) / ssum)"
    " * (1.0 - CAST(s_pin AS DOUBLE) / ssum) / (n - 1)) AS BIGINT) END"
)

# F* = [Σw(m−x̄w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·U], micro-pinned; NULL on
# any undefined group, one group, or an all-degenerate weight table —
# unguarded /0 diverges engines (Spark CASTs Inf, DuckDB raises).
_WELCH_F_EXPR = (
    "CASE WHEN any_bad = 1 OR wm_over = 1 OR a_over = 1"
    " OR k_groups <= 1 OR ssum <= 0 THEN NULL"
    " ELSE CAST(round(wmax * CAST(asum AS DOUBLE) / 1000000.0"
    " / (k_groups - 1)"
    " / (1.0 + 2.0 * (k_groups - 2)"
    " * (CAST(usum AS DOUBLE) / 1000000000000.0)"
    " / (CAST(k_groups AS DOUBLE) * k_groups - 1)) * 1000000)"
    " AS BIGINT) END"
)

# Welch df2 = (k²−1)/(3U), emitted as a DOUBLE (one deterministic
# expression on exact integers — a micro-pinned bigint would overflow
# when U is tiny, i.e. huge balanced groups).
_WELCH_DF2_EXPR = (
    "CASE WHEN any_bad = 1 OR wm_over = 1 OR a_over = 1"
    " OR k_groups <= 1 OR ssum <= 0 OR usum <= 0"
    " THEN NULL"
    " ELSE CAST((CAST(k_groups AS DOUBLE) * k_groups - 1)"
    " / (3.0 * (CAST(usum AS DOUBLE) / 1000000000000.0)) AS DOUBLE) END"
)

_WELCH_ORACLE = f"""
WITH g AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
    FROM events GROUP BY event_type
),
gw AS (
    SELECT event_type, n, s, ({_WELCH_W_RAW}) AS w_raw FROM g
),
tot0 AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS k_groups,
           MAX(CASE WHEN w_raw IS NULL THEN 1 ELSE 0 END) AS any_bad,
           MAX(w_raw) AS wmax
    FROM gw
),
gs AS (
    SELECT event_type, n, s, w_raw, wmax,
           ({_WELCH_S_PIN}) AS s_pin
    FROM gw CROSS JOIN tot0
),
tot1 AS (
    SELECT CAST(SUM(s_pin) AS BIGINT) AS ssum,
           CAST(SUM({_WELCH_WM_PIN}) AS BIGINT) AS wmsum,
           CAST(MAX({_WELCH_WM_OVER}) AS BIGINT) AS wm_over
    FROM gs
),
fin AS (
    SELECT CAST(SUM({_WELCH_A_PIN}) AS BIGINT) AS asum,
           CAST(SUM({_WELCH_U_PIN}) AS BIGINT) AS usum,
           CAST(MAX({_WELCH_A_OVER}) AS BIGINT) AS a_over
    FROM gs CROSS JOIN tot1
)
SELECT n_total, k_groups,
       {_WELCH_F_EXPR} AS f_micro,
       {_WELCH_DF2_EXPR} AS df2,
       CAST(GREATEST(wm_over, a_over) AS BIGINT) AS over_pole
FROM tot0 CROSS JOIN tot1 CROSS JOIN fin
"""


@query("stats_welch_anova", oracle=_WELCH_ORACLE)
def stats_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's ANOVA — the unequal-variance F test: does mean event
    value differ across event types WITHOUT assuming equal group
    variances? This is where stats_levene_test's own output points: a
    significant Levene/Brown–Forsythe W says the classic ANOVA's
    pooled-variance F is untrustworthy, and Welch (1951) is the
    standard replacement. Weights each group by the precision of its
    mean (w_j = n_j/s²_j) and applies the Welch–Satterthwaite
    denominator correction; df2 comes back alongside F because the
    reference distribution depends on it.

    Same scale shape as stats_anova_oneway: per-group (n, Σx, Σx²) in
    ONE partial-aggregated shuffle over the fact table, everything
    after on the k-row group dust (two broadcast-joined pin passes).
    Exactness discipline: every cross-group Σ runs on exact bigints —
    weights are pinned RELATIVE to the group-max weight (MAX over
    doubles is order-independent, unlike float SUM) on a pico grid, so
    pins always fit int64 with no absolute-scale bound, and all
    remaining doubles are single deterministic expressions on exact
    integers. Degenerate inputs (singleton group, zero within-group
    variance, k=1) yield NULL in both engines rather than an
    Inf/NaN-cast divergence.
    """
    ev = table(spark, sf_dir, "events")
    return welch_anova(ev.select("event_type", "value"))


def welch_anova(frame: DataFrame) -> DataFrame:
    """Welch ANOVA core over any (event_type, value) frame with
    2-dp-exact values; see stats_welch_anova. Fuzzed against a
    double-for-double python replay by tests/test_round10_fuzz.py."""
    c = F.round(F.col("value") * 100).cast("long")
    g = frame.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("s"),
        F.sum(c * c).cast("long").alias("q"),
    )
    # The k-row moment table feeds FOUR downstream branches (tot0, gs,
    # tot1, fin); without a checkpoint Spark compiles each branch with
    # its own copy of the scan+reduce subtree — 4 static fact scans.
    # A lazy localCheckpoint persists the dust once (MEMORY_AND_DISK),
    # so the fact table is read exactly once per execution at any SF.
    gw = g.select(
        "event_type", "n", "s", F.expr(_WELCH_W_RAW).alias("w_raw")
    ).localCheckpoint(eager=False)
    tot0 = gw.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.max(
            F.expr("CASE WHEN w_raw IS NULL THEN 1 ELSE 0 END")
        ).alias("any_bad"),
        F.max("w_raw").alias("wmax"),
    )
    gs = gw.crossJoin(F.broadcast(tot0)).select(  # bounded: 1-row global aggregate
        "event_type",
        "n",
        "s",
        "w_raw",
        "n_total",
        "k_groups",
        "any_bad",
        "wmax",
        F.expr(_WELCH_S_PIN).alias("s_pin"),
    )
    tot1 = gs.agg(
        F.sum("s_pin").cast("long").alias("ssum"),
        F.sum(F.expr(_WELCH_WM_PIN)).cast("long").alias("wmsum"),
        F.max(F.expr(_WELCH_WM_OVER)).cast("long").alias("wm_over"),
    )
    fin = (
        gs.crossJoin(F.broadcast(tot1))  # bounded: 1-row global aggregate
        .groupBy(
            "n_total", "k_groups", "any_bad", "wmax", "ssum", "wm_over"
        )
        .agg(
            F.sum(F.expr(_WELCH_A_PIN)).cast("long").alias("asum"),
            F.sum(F.expr(_WELCH_U_PIN)).cast("long").alias("usum"),
            F.max(F.expr(_WELCH_A_OVER)).cast("long").alias("a_over"),
        )
    )
    return fin.select(
        "n_total",
        "k_groups",
        F.expr(_WELCH_F_EXPR).alias("f_micro"),
        F.expr(_WELCH_DF2_EXPR).alias("df2"),
        F.greatest("wm_over", "a_over").cast("long").alias("over_pole"),
    )


# --------------------------------------------------------------------------
# Kruskal–Wallis H — the k-sample rank test (nonparametric ANOVA twin)
# --------------------------------------------------------------------------

_KW_BUCKET_CENTS = 1000

# Each group's H contribution 12·R_g²/(N(N+1)·n_g) is micro-pinned
# BEFORE the k-term sum (float Σ over groups would be order-sensitive;
# the per-term double products run on exact bigints — the CAPM overflow
# lesson says never square R_g in int64). h_micro then closes the
# −3(N+1) shift and the tie correction on exact integers.
_KW_TERM_EXPR = (
    "CAST(round(12.0 * (CAST(r2_g AS DOUBLE) / n_g) * r2_g"
    " / (4.0 * n_total * (n_total + 1.0)) * 1000000) AS BIGINT)"
)
# NULL on degenerate input instead of diverging: n_total <= 1 makes the
# inner n³−n zero (tie/0 → NaN), and all-pooled-values-tied makes the
# correction 1 − tie/(n³−n) zero (H/0 → Inf) — Spark CASTs NaN/Inf to
# 0/Long.MaxValue while DuckDB raises. Both guard comparisons run on the
# SAME double expressions as the division (n³ > 2^53 at ~2M rows, so an
# exact-bigint n³ would overflow — compare in double like the divisor,
# ≥ because the bigint tie may cast a ulp above the double product).
_KW_H_EXPR = (
    "CASE WHEN n_total <= 1 OR CAST(tie AS DOUBLE)"
    " >= CAST(n_total AS DOUBLE) * n_total * n_total - n_total THEN NULL"
    " ELSE CAST(round((hterm_sum / 1000000.0 - 3.0 * (n_total + 1))"
    " / (1.0 - CAST(tie AS DOUBLE)"
    "          / (CAST(n_total AS DOUBLE) * n_total * n_total - n_total))"
    " * 1000000) AS BIGINT) END"
)

# The rank machinery (pooled distinct values -> doubled average ranks ->
# per-group doubled rank sums) is shared verbatim between the KW omnibus
# and its Dunn post-hoc, in both engines.
_KW_RANK_CTES = """base AS (
    SELECT event_type AS grp,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
gv AS (
    SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS n_gv
    FROM base GROUP BY 1, 2
),
vt AS (
    SELECT cents, CAST(SUM(n_gv) AS BIGINT) AS t
    FROM gv GROUP BY cents
),
ranked AS (
    SELECT cents, t,
           2 * COALESCE(SUM(t) OVER (
               ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS rank2
    FROM vt
),
per_g AS (
    SELECT gv.grp,
           CAST(SUM(gv.n_gv) AS BIGINT) AS n_g,
           CAST(SUM(gv.n_gv * r.rank2) AS BIGINT) AS r2_g
    FROM gv JOIN ranked r ON r.cents = gv.cents
    GROUP BY gv.grp
)"""

_KW_ORACLE = f"""
WITH {_KW_RANK_CTES},
tot0 AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS k_groups
    FROM per_g
),
hsum AS (
    SELECT n_total, k_groups,
           CAST(SUM({_KW_TERM_EXPR}) AS BIGINT) AS hterm_sum
    FROM per_g CROSS JOIN tot0
    GROUP BY n_total, k_groups
),
ties AS (
    SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie FROM vt
)
SELECT n_total, k_groups, tie, {_KW_H_EXPR} AS h_micro
FROM hsum CROSS JOIN ties
"""


@query("stats_kruskal_wallis", oracle=_KW_ORACLE)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across event types — the k-sample RANK test that
    completes the one-way family: stats_anova_oneway compares means
    (normality-sensitive), stats_levene_test compares spreads, this one
    compares distributions with no normality assumption (the k-group
    generalization of ab_mann_whitney, which it degenerates to at
    k = 2).

    Rank machinery without a global sort: pooled values collapse to a
    distinct-value table (one shuffle), the global rank prefix runs as
    the bucketed two-pass device over that dust (doubled average ranks
    2r̄ = 2·cum_before + t + 1 stay exact integers through ties), and
    per-group rank sums come from one join keyed on the value. Each
    group's H contribution runs in doubles cast from exact bigints (the
    quant_beta_capm int64-overflow lesson — R_g² reaches ~5e23 at
    sf0.1) and is micro-pinned BEFORE the k-term sum, so the float Σ
    over groups never becomes order-sensitive; tie correction Σ(t³−t)
    is an exact bigint.
    """
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return kruskal_wallis(base)


def _kw_rank_frames(base: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared rank machinery for the KW omnibus and its Dunn post-hoc:
    returns (vt, per_g) where vt = per-distinct-pooled-value tie counts
    (cents, t) and per_g = per-group exact doubled rank sums
    (grp, n_g, r2_g). See stats_kruskal_wallis for the exactness story.
    """
    # Lazy checkpoint: the distinct-value reduction feeds the rank
    # device, the per-group rollup, AND the tie term — one fact scan,
    # not three; gv is bounded by k × distinct values, dust relative to
    # the fact table (see welch_anova's note).
    gv = (
        base.groupBy("grp", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gv"))
        .localCheckpoint(eager=False)
    )
    vt = gv.groupBy("cents").agg(F.sum("n_gv").cast("long").alias("t"))
    # Bucketed two-pass global prefix over the distinct-value dust.
    bucketed = vt.withColumn(
        "bucket", (F.col("cents") / _KW_BUCKET_CENTS).cast("long")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("local_prev", F.sum("t").over(w_local))
    bucket_tots = bucketed.groupBy("bucket").agg(
        F.sum("t").alias("bucket_t")
    )
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = bucket_tots.select(
        "bucket", F.sum("bucket_t").over(w_buckets).alias("prior_t")
    )
    ranked = (
        local.join(prior, "bucket")
        .select(
            "cents",
            "t",
            (
                2
                * (
                    F.coalesce("local_prev", F.lit(0))
                    + F.coalesce("prior_t", F.lit(0))
                )
                + F.col("t")
                + 1
            ).alias("rank2"),
        )
    )
    # Lazy checkpoint: the k-row rank-sum table feeds multiple dust
    # subtrees in both consumers (hsum + tot0 here; both pair sides +
    # tot0 in the Dunn post-hoc).
    per_g = (
        gv.join(ranked.select("cents", "rank2"), "cents")
        .groupBy("grp")
        .agg(
            F.sum("n_gv").cast("long").alias("n_g"),
            F.sum(F.col("n_gv") * F.col("rank2")).cast("long").alias("r2_g"),
        )
        .localCheckpoint(eager=False)
    )
    return vt, per_g


def kruskal_wallis(base: DataFrame) -> DataFrame:
    """KW core over any (grp, cents) frame; see stats_kruskal_wallis.
    Replay-proven at 2M rows by tests/test_scale_smoke.py: a fully
    separated block design has closed-form doubled ranks and tie term,
    and the statistic matches a python double-for-double replay of the
    identical micro-pinned expression."""
    vt, per_g = _kw_rank_frames(base)
    tot0 = per_g.agg(
        F.sum("n_g").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
    )
    hsum = (
        per_g.crossJoin(F.broadcast(tot0))  # bounded: 1-row global aggregate
        .groupBy("n_total", "k_groups")
        .agg(
            F.sum(F.expr(_KW_TERM_EXPR)).cast("long").alias("hterm_sum")
        )
    )
    ties = vt.agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("long")
        .alias("tie")
    )
    return hsum.crossJoin(F.broadcast(ties)).select(  # bounded: 1-row global aggregate
        "n_total", "k_groups", "tie", F.expr(_KW_H_EXPR).alias("h_micro")
    )


# --------------------------------------------------------------------------
# Dunn post-hoc: pairwise rank-mean z after a significant Kruskal–Wallis
# --------------------------------------------------------------------------

# All-pooled-tied makes the tie-corrected variance exactly zero (the
# same pole as the KW H correction), and n_total <= 1 divides by zero in
# the tie term — identical guard text as _KW_H_EXPR's, evaluated on the
# same double expressions as the divisors.
_DUNN_BAD = (
    "n_total <= 1 OR CAST(tie AS DOUBLE)"
    " >= CAST(n_total AS DOUBLE) * n_total * n_total - n_total"
)

# Mean-rank difference in milli-rank units: mean rank = r2_g/(2 n_g) on
# doubles cast from exact bigints, fixed pair orientation grp_a < grp_b
# (the Games–Howell discipline), so the one subtraction is
# deterministic in both engines.
_DUNN_MEANDIFF = (
    "CAST(round(1000.0 * (CAST(r2_a AS DOUBLE) / (2.0 * n_a)"
    " - CAST(r2_b AS DOUBLE) / (2.0 * n_b))) AS BIGINT)"
)

# Dunn z = (R̄_a − R̄_b) / sqrt[(N(N+1)/12 − Σ(t³−t)/(12(N−1)))·(1/n_a
# + 1/n_b)] (Dunn 1964, tie-corrected), micro-pinned. Every factor is a
# double cast from an exact bigint; sqrt is IEEE correctly-rounded, so
# the single expression agrees bit-for-bit across engines. N³ would
# pass 2^53 at ~2M pooled rows, hence the guard compares in double like
# the KW correction does.
_DUNN_Z = (
    f"CASE WHEN {_DUNN_BAD} THEN NULL"
    " ELSE CAST(round((CAST(r2_a AS DOUBLE) / (2.0 * n_a)"
    " - CAST(r2_b AS DOUBLE) / (2.0 * n_b))"
    " / sqrt((CAST(n_total AS DOUBLE) * (n_total + 1.0) / 12.0"
    " - CAST(tie AS DOUBLE) / (12.0 * (n_total - 1.0)))"
    " * (1.0 / n_a + 1.0 / n_b)) * 1000000) AS BIGINT) END"
)

_DUNN_ORACLE = f"""
WITH {_KW_RANK_CTES},
tot0 AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n_total FROM per_g
),
ties AS (
    SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie FROM vt
),
pairs AS (
    SELECT a.grp AS grp_a, b.grp AS grp_b,
           a.n_g AS n_a, a.r2_g AS r2_a,
           b.n_g AS n_b, b.r2_g AS r2_b
    FROM per_g a JOIN per_g b ON a.grp < b.grp
)
SELECT grp_a, grp_b, n_a, n_b,
       {_DUNN_MEANDIFF} AS rankdiff_milli,
       {_DUNN_Z} AS z_micro
FROM pairs CROSS JOIN tot0 CROSS JOIN ties
ORDER BY grp_a, grp_b
"""


@query("stats_dunn_test", oracle=_DUNN_ORACLE)
def stats_dunn_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn post-hoc: after stats_kruskal_wallis's omnibus H says SOME
    event-type distributions differ, this answers WHICH pairs do —
    pairwise mean-rank z statistics with the pooled tie-corrected
    variance (Dunn 1964), the standard nonparametric post-hoc. Mirrors
    stats_games_howell's role exactly one column over in the test
    matrix: Welch omnibus → Games–Howell pairs (means), KW omnibus →
    Dunn pairs (ranks). Compare |z| against the Bonferroni-adjusted
    normal quantile for k(k−1)/2 comparisons downstream.

    Exactness: ranks come from the SAME shared machinery as the
    omnibus (_kw_rank_frames / _KW_RANK_CTES — doubled average ranks
    and per-group rank sums as exact bigints), and each pair statistic
    is a single deterministic double expression on one pair's exact
    (n_g, r2_g) plus the global (N, Σ(t³−t)) bigints, oriented
    grp_a < grp_b. The all-tied pole NULLs via the identical guard
    text as the omnibus correction.

    Scale shape: one fact-scan shuffle to the (grp, value) distinct
    table, the bucketed two-pass rank device over that dust, then a
    broadcast self-join of the k-row rank-sum table — C(k,2) result
    rows of pure dust; the 1-row N and tie aggregates broadcast.
    """
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return dunn_test(base)


def dunn_test(base: DataFrame) -> DataFrame:
    """Dunn core over any (grp, cents) frame; see stats_dunn_test."""
    vt, per_g = _kw_rank_frames(base)
    tot0 = per_g.agg(F.sum("n_g").cast("long").alias("n_total"))
    ties = vt.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie")
    )
    a = per_g.select(
        F.col("grp").alias("grp_a"),
        F.col("n_g").alias("n_a"),
        F.col("r2_g").alias("r2_a"),
    )
    b = per_g.select(
        F.col("grp").alias("grp_b"),
        F.col("n_g").alias("n_b"),
        F.col("r2_g").alias("r2_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))  # bounded: k-row per-group rank-sum table (bounded group count)
    return (
        pairs.crossJoin(F.broadcast(tot0))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(ties))  # bounded: 1-row global aggregate
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            F.expr(_DUNN_MEANDIFF).alias("rankdiff_milli"),
            F.expr(_DUNN_Z).alias("z_micro"),
        )
        .orderBy("grp_a", "grp_b")
    )


# --------------------------------------------------------------------------
# Games–Howell post-hoc: pairwise Welch t after a significant omnibus test
# --------------------------------------------------------------------------

# Per-side sample variance in cents², a single double expression on the
# exact per-group moments (same correction form as the ANOVA family).
def _gh_s2(side: str) -> str:
    return (
        f"(CAST(q_{side} - CAST(round(CAST(s_{side} AS DOUBLE) / n_{side}"
        f" * s_{side}) AS BIGINT) AS DOUBLE) / (n_{side} - 1))"
    )


_GH_BAD = (
    "n_a <= 1 OR n_b <= 1"
    " OR q_a - CAST(round(CAST(s_a AS DOUBLE) / n_a * s_a) AS BIGINT) <= 0"
    " OR q_b - CAST(round(CAST(s_b AS DOUBLE) / n_b * s_b) AS BIGINT) <= 0"
)

_GH_MEANDIFF = (
    "CAST(round(1000.0 * (CAST(s_a AS DOUBLE) / n_a"
    " - CAST(s_b AS DOUBLE) / n_b)) AS BIGINT)"
)

# Welch t = (m_a − m_b)/√(s²_a/n_a + s²_b/n_b), micro-pinned; the two
# standard-error terms add in the FIXED pair orientation (grp_a < grp_b),
# so the double sum has one deterministic order in both engines.
_GH_T = (
    f"CASE WHEN {_GH_BAD} THEN NULL"
    f" ELSE CAST(round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE)"
    f" / n_b) / sqrt({_gh_s2('a')} / n_a + {_gh_s2('b')} / n_b)"
    f" * 1000000) AS BIGINT) END"
)

# Welch–Satterthwaite df, emitted as a DOUBLE (single deterministic
# expression; pinning would overflow for huge balanced groups).
_GH_DF = (
    f"CASE WHEN {_GH_BAD} THEN NULL"
    f" ELSE CAST(({_gh_s2('a')} / n_a + {_gh_s2('b')} / n_b)"
    f" * ({_gh_s2('a')} / n_a + {_gh_s2('b')} / n_b)"
    f" / (({_gh_s2('a')} / n_a) * ({_gh_s2('a')} / n_a) / (n_a - 1)"
    f" + ({_gh_s2('b')} / n_b) * ({_gh_s2('b')} / n_b) / (n_b - 1))"
    f" AS DOUBLE) END"
)

_GH_ORACLE = f"""
WITH g AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
    FROM events GROUP BY event_type
),
pairs AS (
    SELECT a.event_type AS grp_a, b.event_type AS grp_b,
           a.n AS n_a, a.s AS s_a, a.q AS q_a,
           b.n AS n_b, b.s AS s_b, b.q AS q_b
    FROM g a JOIN g b ON a.event_type < b.event_type
)
SELECT grp_a, grp_b, n_a, n_b,
       {_GH_MEANDIFF} AS meandiff_milli,
       {_GH_T} AS t_micro,
       {_GH_DF} AS df
FROM pairs
ORDER BY grp_a, grp_b
"""


@query("stats_games_howell", oracle=_GH_ORACLE)
def stats_games_howell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Games–Howell post-hoc: after stats_welch_anova's omnibus F says
    SOME event-type means differ, this answers WHICH pairs do —
    pairwise Welch t statistics with Welch–Satterthwaite degrees of
    freedom, the standard unequal-variance post-hoc (Games & Howell
    1976; compare against the studentized-range quantile at the
    returned df). Completes the heteroscedastic chain the round-9
    verdict asked for: Levene flags unequal spread → Welch tests the
    omnibus → Games–Howell localizes it.

    Exactness is trivially strong here: unlike the omnibus tests there
    are NO cross-group float sums at all — every statistic is a single
    deterministic double expression on the exact per-group (n, Σx, Σx²)
    bigints of ONE pair, oriented grp_a < grp_b. Degenerate sides
    (singleton or zero variance) NULL that pair only. Scale shape:
    the same one-shuffle moment pass as the ANOVA family, then a
    broadcast self-join of the k-row group table — C(k,2) result rows
    of pure dust.
    """
    ev = table(spark, sf_dir, "events")
    return games_howell(ev.select("event_type", "value"))


def games_howell(frame: DataFrame) -> DataFrame:
    """Games–Howell core over any (event_type, value) frame with
    2-dp-exact values; see stats_games_howell. Fuzzed against a python
    replay by tests/test_round10_fuzz.py."""
    c = F.round(F.col("value") * 100).cast("long")
    # Lazy checkpoint: the k-row moment table feeds both pair sides —
    # one fact scan, not two (see welch_anova's note).
    g = frame.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("s"),
        F.sum(c * c).cast("long").alias("q"),
    ).localCheckpoint(eager=False)
    a = g.select(
        F.col("event_type").alias("grp_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("q").alias("q_a"),
    )
    b = g.select(
        F.col("event_type").alias("grp_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("q").alias("q_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))  # bounded: k-row per-group moment table (bounded group count)
    return pairs.select(
        "grp_a",
        "grp_b",
        "n_a",
        "n_b",
        F.expr(_GH_MEANDIFF).alias("meandiff_milli"),
        F.expr(_GH_T).alias("t_micro"),
        F.expr(_GH_DF).alias("df"),
    ).orderBy("grp_a", "grp_b")


# --------------------------------------------------------------------------
# Two-way ANOVA with interaction (event_type × day-of-week cycle)
# --------------------------------------------------------------------------

# Per-group "raw between" term, the exact-bigint pinned form shared with
# the one-way kernel: round(S²/n) as S/n*S on doubles cast from exact
# bigints.
_TW_RAW = "CAST(round(CAST(s AS DOUBLE) / n * s) AS BIGINT)"

# Day-of-week cycle from epoch days — pure arithmetic so both engines
# agree (calendar dayofweek() numbering differs across engines); the
# micros value is exact below 2^53 so the double division is exact-safe.
_TW_DOW_SPARK = (
    "CAST(floor(unix_micros(ts) / 86400000000.0) AS BIGINT) % 7"
)
_TW_DOW_DUCK = "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) % 7"

_TW_BAD = "a_levels <= 1 OR b_levels <= 1 OR n_total <= n_cells"


def _tw_f(ss: str, df: str) -> str:
    """Micro-pinned F ratio with the degenerate-pole guard (NULL instead
    of an Inf-cast divergence — the one-way family's discipline)."""
    return (
        f"CASE WHEN {_TW_BAD} OR ss_within_c2 = 0 THEN NULL"
        f" ELSE CAST(floor((CAST({ss} AS DOUBLE) / ({df}))"
        f" / (CAST(ss_within_c2 AS DOUBLE) / (n_total - n_cells))"
        f" * 1000000 + 0.5) AS BIGINT) END"
    )


_TW_FIN_COLS = f"""
       n_total, a_levels, b_levels,
       CAST(ss_a_c2 / 10000.0 AS DOUBLE) AS ss_a,
       CAST(ss_b_c2 / 10000.0 AS DOUBLE) AS ss_b,
       CAST((ss_cells_c2 - ss_a_c2 - ss_b_c2) / 10000.0 AS DOUBLE) AS ss_ab,
       CAST(ss_within_c2 / 10000.0 AS DOUBLE) AS ss_within,
       {_tw_f('ss_a_c2', 'a_levels - 1')} AS fa_micro,
       {_tw_f('ss_b_c2', 'b_levels - 1')} AS fb_micro,
       {_tw_f('ss_cells_c2 - ss_a_c2 - ss_b_c2',
              '(a_levels - 1) * (b_levels - 1)')} AS fab_micro
"""

_TW_ORACLE = f"""
WITH cells AS (
    SELECT event_type AS fa,
           {_TW_DOW_DUCK} AS fb,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
    FROM events GROUP BY 1, 2
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(SUM(s) AS BIGINT) AS s_all,
           CAST(SUM(q) AS BIGINT) AS q_all,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(COUNT(DISTINCT fa) AS BIGINT) AS a_levels,
           CAST(COUNT(DISTINCT fb) AS BIGINT) AS b_levels,
           CAST(SUM({_TW_RAW}) AS BIGINT) AS ss_cells_raw
    FROM cells
),
ma AS (
    SELECT CAST(SUM({_TW_RAW}) AS BIGINT) AS ss_a_raw
    FROM (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
          FROM cells GROUP BY fa)
),
mb AS (
    SELECT CAST(SUM({_TW_RAW}) AS BIGINT) AS ss_b_raw
    FROM (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
          FROM cells GROUP BY fb)
),
fin AS (
    SELECT n_total, a_levels, b_levels, n_cells,
           ss_a_raw - {_ANOVA_CORRECTION} AS ss_a_c2,
           ss_b_raw - {_ANOVA_CORRECTION} AS ss_b_c2,
           ss_cells_raw - {_ANOVA_CORRECTION} AS ss_cells_c2,
           q_all - ss_cells_raw AS ss_within_c2
    FROM tot CROSS JOIN ma CROSS JOIN mb
)
SELECT {_TW_FIN_COLS}
FROM fin
"""


@query("stats_anova_twoway", oracle=_TW_ORACLE)
def stats_anova_twoway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA with interaction: does mean event value vary by
    event TYPE, by DAY-OF-WEEK cycle, and — the question neither
    one-way pass can ask — does the type effect itself CHANGE across
    days (interaction)? The factorial completion of the one-way family
    (ANOVA → Levene → Welch → Games–Howell → this): a weekday-only
    seasonality monitor and a type-only monitor both miss a type that
    degrades only on weekends.

    Decomposition: the textbook factor-margin sums of squares on the
    (type × day) cell moment table — SS_A, SS_B from margins,
    SS_AB = SS_cells − SS_A − SS_B, SS_within = SS_total − SS_cells.
    Orthogonal (and the interaction term clean) under
    balanced/proportional cell counts — the standard caveat; event
    streams are close to proportional across a weekly cycle, and the
    decomposition is deterministic regardless.

    Scale shape: ONE partial-aggregated shuffle to the a×b cell moment
    table, lazily checkpointed (it feeds the total, A-margin, and
    B-margin branches — the stats-family one-scan discipline); both
    margins and every SS are exact-bigint sums of per-group pinned
    terms, so no float accumulation-order risk anywhere. The day factor
    is pure epoch arithmetic (calendar dayofweek() numbering differs
    across engines). Degenerate designs (single level, saturated cells,
    zero residual) yield NULL F's in both engines.
    """
    ev = table(spark, sf_dir, "events")
    return anova_twoway(
        ev.select(
            F.col("event_type").alias("fa"),
            F.expr(_TW_DOW_SPARK).alias("fb"),
            "value",
        )
    )


def anova_twoway(frame: DataFrame) -> DataFrame:
    """Two-way ANOVA core over any (fa, fb, value) frame with
    2-dp-exact values; see stats_anova_twoway. Fuzzed against a
    double-for-double python replay by tests/test_round10_fuzz.py."""
    c = F.round(F.col("value") * 100).cast("long")
    cells = (
        frame.groupBy("fa", "fb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(c).cast("long").alias("s"),
            F.sum(c * c).cast("long").alias("q"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("long").alias("s_all"),
        F.sum("q").cast("long").alias("q_all"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.count_distinct("fa").cast("long").alias("a_levels"),
        F.count_distinct("fb").cast("long").alias("b_levels"),
        F.sum(F.expr(_TW_RAW)).cast("long").alias("ss_cells_raw"),
    )
    ma = (
        cells.groupBy("fa")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s").cast("long").alias("s"),
        )
        .agg(F.sum(F.expr(_TW_RAW)).cast("long").alias("ss_a_raw"))
    )
    mb = (
        cells.groupBy("fb")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s").cast("long").alias("s"),
        )
        .agg(F.sum(F.expr(_TW_RAW)).cast("long").alias("ss_b_raw"))
    )
    fin = (
        tot.crossJoin(F.broadcast(ma))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(mb))  # bounded: 1-row global aggregate
        .select(
            "n_total",
            "a_levels",
            "b_levels",
            "n_cells",
            (F.col("ss_a_raw") - F.expr(_ANOVA_CORRECTION)).alias("ss_a_c2"),
            (F.col("ss_b_raw") - F.expr(_ANOVA_CORRECTION)).alias("ss_b_c2"),
            (F.col("ss_cells_raw") - F.expr(_ANOVA_CORRECTION)).alias(
                "ss_cells_c2"
            ),
            (F.col("q_all") - F.col("ss_cells_raw")).alias("ss_within_c2"),
        )
    )
    return fin.select(
        "n_total",
        "a_levels",
        "b_levels",
        F.expr("CAST(ss_a_c2 / 10000.0 AS DOUBLE)").alias("ss_a"),
        F.expr("CAST(ss_b_c2 / 10000.0 AS DOUBLE)").alias("ss_b"),
        F.expr(
            "CAST((ss_cells_c2 - ss_a_c2 - ss_b_c2) / 10000.0 AS DOUBLE)"
        ).alias("ss_ab"),
        F.expr("CAST(ss_within_c2 / 10000.0 AS DOUBLE)").alias("ss_within"),
        F.expr(_tw_f("ss_a_c2", "a_levels - 1")).alias("fa_micro"),
        F.expr(_tw_f("ss_b_c2", "b_levels - 1")).alias("fb_micro"),
        F.expr(
            _tw_f(
                "ss_cells_c2 - ss_a_c2 - ss_b_c2",
                "(a_levels - 1) * (b_levels - 1)",
            )
        ).alias("fab_micro"),
    )


# --------------------------------------------------------------------------
# Seasonal Mann–Kendall (Hirsch–Slack) — trend through seasonality
# --------------------------------------------------------------------------

# Same identical-SQL-text device as trend_mann_kendall: the readout
# below runs verbatim on Spark (over the checkpointed `monthly` view)
# and inside the DuckDB oracle's WITH chain.
_SMK_READOUT_SQL = """
WITH pairs AS (
    SELECT a.nation,
           CASE WHEN b.rev_cents > a.rev_cents THEN 1
                WHEN b.rev_cents < a.rev_cents THEN -1
                ELSE 0 END AS sgn
    FROM monthly a
    JOIN monthly b ON b.nation = a.nation
                  AND b.ym % 100 = a.ym % 100
                  AND b.ym > a.ym
),
s_stat AS (
    SELECT nation, CAST(SUM(sgn) AS BIGINT) AS s FROM pairs GROUP BY nation
),
seas AS (
    SELECT nation, ym % 100 AS season, CAST(COUNT(*) AS BIGINT) AS n
    FROM monthly GROUP BY 1, 2
),
ties AS (
    SELECT nation, season,
           CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
    FROM (SELECT nation, ym % 100 AS season, CAST(COUNT(*) AS BIGINT) AS t
          FROM monthly GROUP BY nation, ym % 100, rev_cents)
    GROUP BY 1, 2
),
var18 AS (
    SELECT s.nation,
           CAST(SUM(s.n * (s.n - 1) * (2 * s.n + 5)
                    - COALESCE(t.tie_term, 0)) AS BIGINT) AS var18
    FROM seas s
    LEFT JOIN ties t ON t.nation = s.nation AND t.season = s.season
    GROUP BY s.nation
),
counts AS (
    SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_months
    FROM monthly GROUP BY nation
)
SELECT c.nation,
       c.n_months,
       s.s AS s_stat,
       v.var18,
       CASE WHEN v.var18 = 0 THEN NULL
            ELSE CAST(round(
                (s.s - CASE WHEN s.s > 0 THEN 1
                            WHEN s.s < 0 THEN -1 ELSE 0 END)
                / sqrt(v.var18 / 18.0) * 1000000) AS BIGINT) END AS z_micro
FROM counts c
JOIN s_stat s ON s.nation = c.nation
JOIN var18 v ON v.nation = c.nation
ORDER BY c.nation
"""

_SMK_ORACLE = (
    "WITH monthly AS ("
    + _MK_MONTHLY_SQL
    + "), "
    + _SMK_READOUT_SQL.lstrip()[len("WITH ") :]
)


@query("trend_mann_kendall_seasonal", oracle=_SMK_ORACLE)
def trend_mann_kendall_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann–Kendall (Hirsch & Slack 1984): the trend monitor
    for metrics with a seasonal cycle — plain MK reads December-vs-July
    level shifts as "trend", so it compares values ONLY within the same
    calendar month across years: S = Σ_seasons S_season, 18·Var =
    Σ_seasons [n(n−1)(2n+5) − tie term] per season, z with the
    continuity correction. The standard companion the hydrology
    literature built for exactly the revenue-style series
    trend_mann_kendall watches.

    Same exactness device as the plain test: S and 18·Var are exact
    integers, z is one identical IEEE sqrt/divide text on both engines,
    and the season key ym % 100 is pure integer arithmetic. The
    degenerate pole (every season a singleton → zero variance) NULLs
    in both engines. Scale shape unchanged: one partial-aggregated
    reduction to nations×months dust (the checkpointed `monthly` view
    shared with MK/Theil–Sen), then the within-season pair enumeration
    runs on 1/12th of even that dust's pair count.
    """
    _mk_monthly_view(spark, sf_dir)
    return spark.sql(_SMK_READOUT_SQL)


# --------------------------------------------------------------------------
# Spearman rank correlation — Pearson on exact doubled average ranks
# --------------------------------------------------------------------------

_SP_BUCKET = 1000  # rank-device segment width over distinct values


def _spearman_exprs(wide: str) -> tuple[str, str]:
    """The (da/db guard, rho) expression pair over the 1-row exact sums
    (n, sx, sy, sxx, syy, sxy), parametrized ONLY by the wide-integer
    type name — DECIMAL(38,0) on Spark, HUGEINT in DuckDB — so the
    arithmetic text is otherwise shared verbatim. Every product is
    exact wide-integer (num ≈ 4N⁴ stays under 1e38 to N≈2.2e9 rows —
    documented pole, tripwired on the fixture); the ONE cast to double
    per factor is correctly rounded in both engines, and the final
    divide/sqrt is a single deterministic IEEE expression."""
    n = f"CAST(n AS {wide})"
    num = f"CAST({n} * sxy - sx * sy AS DOUBLE)"
    da = f"CAST({n} * sxx - sx * sx AS DOUBLE)"
    db = f"CAST({n} * syy - sy * sy AS DOUBLE)"
    bad = f"{da} <= 0.0 OR {db} <= 0.0"
    rho = (
        f"CASE WHEN {bad} THEN NULL"
        f" ELSE CAST(round({num} / sqrt({da} * {db}) * 1000000)"
        f" AS BIGINT) END"
    )
    return bad, rho


_SP_ORACLE = f"""
WITH base AS (
    SELECT CAST(l_quantity AS BIGINT) AS xv,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS yv
    FROM lineitem
),
vx AS (
    SELECT xv AS v, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY 1
),
rx AS (
    SELECT v,
           2 * COALESCE(SUM(t) OVER (
               ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS rank2
    FROM vx
),
vy AS (
    SELECT yv AS v, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY 1
),
ry AS (
    SELECT v,
           2 * COALESCE(SUM(t) OVER (
               ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS rank2
    FROM vy
),
j AS (
    SELECT rx.rank2 AS a, ry.rank2 AS b
    FROM base
    JOIN rx ON rx.v = base.xv
    JOIN ry ON ry.v = base.yv
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(a AS HUGEINT)) AS sx,
           SUM(CAST(b AS HUGEINT)) AS sy,
           SUM(CAST(a AS HUGEINT) * a) AS sxx,
           SUM(CAST(b AS HUGEINT) * b) AS syy,
           SUM(CAST(a AS HUGEINT) * b) AS sxy
    FROM j
),
dx AS (SELECT CAST(COUNT(*) AS BIGINT) AS distinct_x FROM vx),
dy AS (SELECT CAST(COUNT(*) AS BIGINT) AS distinct_y FROM vy)
SELECT n, distinct_x, distinct_y,
       {_spearman_exprs('HUGEINT')[1]} AS rho_micro
FROM s CROSS JOIN dx CROSS JOIN dy
"""


def _rank2_of(vals: DataFrame) -> DataFrame:
    """Doubled-average-rank table over a single-column (v) observation
    frame: returns (v, rank2) with rank2 = 2·r̄ kept exact-integer
    through ties — the KW bucketed two-pass prefix device over the
    distinct-value dust (no global sort of the fact)."""
    vt = vals.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("t"))
    bucketed = vt.withColumn(
        "bucket", (F.col("v") / _SP_BUCKET).cast("long")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("local_prev", F.sum("t").over(w_local))
    bucket_tots = bucketed.groupBy("bucket").agg(
        F.sum("t").alias("bucket_t")
    )
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = bucket_tots.select(
        "bucket", F.sum("bucket_t").over(w_buckets).alias("prior_t")
    )
    return (
        local.join(prior, "bucket")
        .select(
            "v",
            "t",
            (
                2
                * (
                    F.coalesce("local_prev", F.lit(0))
                    + F.coalesce("prior_t", F.lit(0))
                )
                + F.col("t")
                + 1
            ).alias("rank2"),
        )
    )


@query("stats_spearman_rank", oracle=_SP_ORACLE)
def stats_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem quantity and extended
    price — the monotone-association twin of agg_regression's Pearson:
    rank both variables with exact doubled average ranks (ties →
    half-ranks stay integer), then Pearson on the ranks; constant
    factors cancel, so 2r̄ works directly. The standard robust
    screen for nonlinear-but-monotone feature relationships.

    Cross-engine exactness: ranks come from the KW bucketed two-pass
    device (exact bigints through ties); the five moment sums run in
    wide exact integers (DECIMAL(38,0) on Spark, HUGEINT in DuckDB —
    SUM over int64 would wrap at ~1e9 rows since Σrank2² ≈ 4N³), and
    rho is one deterministic double expression on those exact values
    (see _spearman_exprs). Degenerate all-tied variables NULL via the
    same-expression guard.

    Scale shape: each variable collapses to its distinct-value dust
    (one partial-aggregated shuffle each), the rank prefix runs over
    that dust, and the fact joins each rank table by value (shuffle
    joins — the price rank table is O(distinct) = O(SF), never
    broadcast per the round-11 rule; AQE may still elect broadcast at
    small SF). One final 1-row aggregate."""
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("xv"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yv"),
    ).localCheckpoint(eager=False)
    rx = _rank2_of(base.select(F.col("xv").alias("v")))
    ry = _rank2_of(base.select(F.col("yv").alias("v")))
    j = (
        base.join(rx.select(F.col("v").alias("xv"), F.col("rank2").alias("a")), "xv")
        .join(ry.select(F.col("v").alias("yv"), F.col("rank2").alias("b")), "yv")
    )
    wide = "DECIMAL(38,0)"
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(f"CAST(a AS {wide})")).alias("sx"),
        F.sum(F.expr(f"CAST(b AS {wide})")).alias("sy"),
        F.sum(F.expr(f"CAST(a AS {wide}) * a")).alias("sxx"),
        F.sum(F.expr(f"CAST(b AS {wide}) * b")).alias("syy"),
        F.sum(F.expr(f"CAST(a AS {wide}) * b")).alias("sxy"),
    )
    dx = rx.agg(F.count(F.lit(1)).cast("long").alias("distinct_x"))
    dy = ry.agg(F.count(F.lit(1)).cast("long").alias("distinct_y"))
    return (
        s.crossJoin(F.broadcast(dx))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(dy))  # bounded: 1-row global aggregate
        .select(
            "n",
            "distinct_x",
            "distinct_y",
            F.expr(_spearman_exprs(wide)[1]).alias("rho_micro"),
        )
    )


# --------------------------------------------------------------------------
# Friedman test — rank test for complete randomized blocks
# --------------------------------------------------------------------------

# Tie-corrected Friedman statistic (Conover's general form) on DOUBLED
# ranks: with R2_j = 2·R_j and r2 = 2·r, χ² = (k−1)·Σ_j(R2_j −
# b(k+1))² / (Σ r2² − b·k·(k+1)²) — the /4 factors cancel, so both
# pieces are exact bigints and the one division is a single shared
# double expression. All cells tied in every block makes the
# denominator exactly zero → NULL (not Inf) in both engines; b = 0
# (no complete blocks) guards the same way.
_FR_CHI2 = (
    "CASE WHEN b = 0 OR s2 <= 0 THEN NULL"
    " ELSE CAST(round((k - 1) * CAST(s1 AS DOUBLE) / s2 * 1000000)"
    " AS BIGINT) END"
)

_FR_ORACLE = f"""
WITH cell AS (
    SELECT c.c_nationkey AS block, o.o_orderpriority AS treat,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS v
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
kk AS (
    SELECT CAST(COUNT(DISTINCT treat) AS BIGINT) AS k FROM cell
),
complete AS (
    SELECT block FROM cell CROSS JOIN kk
    GROUP BY block, k HAVING COUNT(*) = MAX(k)
),
cc AS (
    SELECT cell.* FROM cell JOIN complete USING (block)
),
gv AS (
    SELECT block, v, CAST(COUNT(*) AS BIGINT) AS t
    FROM cc GROUP BY 1, 2
),
ranked AS (
    SELECT block, v,
           2 * COALESCE(SUM(t) OVER (
               PARTITION BY block ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS rank2
    FROM gv
),
rc AS (
    SELECT cc.block, cc.treat, r.rank2
    FROM cc JOIN ranked r ON r.block = cc.block AND r.v = cc.v
),
bb AS (
    SELECT CAST(COUNT(DISTINCT block) AS BIGINT) AS b FROM rc
),
rj AS (
    SELECT treat, CAST(SUM(rank2) AS BIGINT) AS r2_j
    FROM rc GROUP BY treat
),
s1t AS (
    SELECT CAST(SUM((r2_j - b * (k + 1)) * (r2_j - b * (k + 1)))
               AS BIGINT) AS s1
    FROM rj CROSS JOIN bb CROSS JOIN kk
),
s2t AS (
    SELECT CAST(SUM(rank2 * rank2) - MAX(b) * MAX(k) * (MAX(k) + 1)
               * (MAX(k) + 1) AS BIGINT) AS s2
    FROM rc CROSS JOIN bb CROSS JOIN kk
)
SELECT b, k, s1, s2, {_FR_CHI2} AS chi2_micro
FROM bb CROSS JOIN kk CROSS JOIN s1t CROSS JOIN s2t
"""


@query("stats_friedman_test", oracle=_FR_ORACLE)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test across order priorities BLOCKED by customer nation
    — the repeated-measures member completing the rank-test matrix:
    ab_mann_whitney (2 independent samples), stats_kruskal_wallis (k
    independent), stats_dunn_test (its post-hoc), THIS (k related
    samples, one observation per block×treatment cell). Cells are
    exact per-(nation, priority) revenue sums; blocks missing any
    treatment drop whole (the complete-block requirement, identically
    in both engines).

    Cross-engine exactness: within-block doubled average ranks (the
    shared rank device partitioned by block — ties stay integer), and
    Conover's tie-corrected statistic assembled so the doubled-rank
    /4 factors cancel: χ² = (k−1)·Σ(R2_j − b(k+1))² / (Σr2² −
    bk(k+1)²), exact bigints into one shared double expression.
    All-tied blocks zero the denominator → NULL, never Inf.

    Scale shape: one fact ⋈ customer co-partitioned join, one
    partial-aggregated shuffle to the b×k cell table — everything
    after runs on ≤ b×k rows of dust with block-partitioned windows
    (never global). At 100 TB, b scales to any block cardinality; the
    per-block work stays k-bounded."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("treat"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("block"),
    )
    cell = (
        orders.join(cust, "o_custkey")
        .groupBy("block", "treat")
        .agg(F.sum("cents").cast("long").alias("v"))
        .localCheckpoint(eager=False)
    )
    kk = cell.agg(
        F.count_distinct("treat").cast("long").alias("k")
    )
    complete = (
        cell.crossJoin(F.broadcast(kk))  # bounded: 1-row global aggregate
        .groupBy("block", "k")
        .agg(F.count(F.lit(1)).alias("nt"), F.max("k").alias("kmax"))
        .filter(F.col("nt") == F.col("kmax"))
        .select("block")
    )
    cc = cell.join(complete, "block").localCheckpoint(eager=False)
    gv = cc.groupBy("block", "v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    ranked = gv.select(
        "block",
        "v",
        (
            2
            * F.coalesce(
                F.sum("t").over(
                    Window.partitionBy("block")
                    .orderBy("v")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.col("t")
            + 1
        ).alias("rank2"),
    )
    rc = cc.join(ranked, ["block", "v"]).select(
        "block", "treat", "rank2"
    ).localCheckpoint(eager=False)
    bb = rc.agg(F.count_distinct("block").cast("long").alias("b"))
    rj = rc.groupBy("treat").agg(
        F.sum("rank2").cast("long").alias("r2_j")
    )
    s1t = (
        rj.crossJoin(F.broadcast(bb))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(kk))  # bounded: 1-row global aggregate
        .agg(
            F.sum(
                F.expr(
                    "(r2_j - b * (k + 1)) * (r2_j - b * (k + 1))"
                )
            )
            .cast("long")
            .alias("s1")
        )
    )
    s2t = (
        rc.crossJoin(F.broadcast(bb))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(kk))  # bounded: 1-row global aggregate
        .agg(
            (
                F.sum(F.col("rank2") * F.col("rank2"))
                - F.max("b") * F.max("k") * (F.max("k") + 1)
                * (F.max("k") + 1)
            )
            .cast("long")
            .alias("s2")
        )
    )
    return (
        bb.crossJoin(F.broadcast(kk))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(s1t))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(s2t))  # bounded: 1-row global aggregate
        .select("b", "k", "s1", "s2", F.expr(_FR_CHI2).alias("chi2_micro"))
    )


# --------------------------------------------------------------------------
# Page's trend test — ordered alternative in the complete-block design
# --------------------------------------------------------------------------

# z on DOUBLED ranks: L2 = Σ_j c_j·R2_j (exact bigint), E[L2] =
# b·k(k+1)²/2 (exact — k(k+1) is even), Var(L2) = b·k²(k+1)²(k−1)/36;
# one shared double expression. Degenerate designs (k ≤ 1 or b = 0)
# NULL. Mid-rank ties keep the conventional no-tie moments — the
# standard Page approximation — identically in both engines.
_PAGE_Z = (
    "CASE WHEN b = 0 OR k <= 1 THEN NULL"
    " ELSE CAST(round((l2 - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1)"
    " / 2.0) / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k + 1)"
    " * (k - 1) / 36.0) * 1000000) AS BIGINT) END"
)

_PAGE_ORACLE = f"""
WITH cell AS (
    SELECT c.c_nationkey AS block, o.o_orderpriority AS treat,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS v
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
kk AS (
    SELECT CAST(COUNT(DISTINCT treat) AS BIGINT) AS k FROM cell
),
complete AS (
    SELECT block FROM cell CROSS JOIN kk
    GROUP BY block, k HAVING COUNT(*) = MAX(k)
),
cc AS (
    SELECT cell.* FROM cell JOIN complete USING (block)
),
gv AS (
    SELECT block, v, CAST(COUNT(*) AS BIGINT) AS t
    FROM cc GROUP BY 1, 2
),
ranked AS (
    SELECT block, v,
           2 * COALESCE(SUM(t) OVER (
               PARTITION BY block ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS rank2
    FROM gv
),
rc AS (
    SELECT cc.block, cc.treat, r.rank2
    FROM cc JOIN ranked r ON r.block = cc.block AND r.v = cc.v
),
pos AS (
    SELECT treat,
           CAST(dense_rank() OVER (ORDER BY treat) AS BIGINT) AS c_j
    FROM (SELECT DISTINCT treat FROM rc)
),
bb AS (
    SELECT CAST(COUNT(DISTINCT block) AS BIGINT) AS b FROM rc
),
lsum AS (
    SELECT CAST(SUM(p.c_j * rc.rank2) AS BIGINT) AS l2
    FROM rc JOIN pos p ON p.treat = rc.treat
)
SELECT b, k, l2, {_PAGE_Z} AS z_micro
FROM bb CROSS JOIN kk CROSS JOIN lsum
"""


@query("stats_page_trend", oracle=_PAGE_ORACLE)
def stats_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test (Page 1963) across the ORDERED priority levels
    blocked by customer nation — the ordered-alternative companion to
    stats_friedman_test: Friedman asks "do treatments differ at all?";
    Page asks "do they trend MONOTONICALLY in the hypothesized order?"
    (here, the priority levels' lexicographic order 1-URGENT…5-LOW),
    with far more power against monotone dose-response shapes. L =
    Σ_j position_j·R_j over within-block ranks.

    Cross-engine exactness: the identical block-rank machinery as
    Friedman (doubled average ranks per block — exact integers through
    ties); L2 = Σ c_j·R2_j is an exact bigint; the z statistic is one
    shared double expression on (L2, b, k) with the closed-form no-tie
    moments E[L2] = b·k(k+1)²/2 and Var(L2) = b·k²(k+1)²(k−1)/36
    (mid-rank ties keep these conventional moments — the standard Page
    approximation — identically in both engines). Degenerate designs
    NULL.

    Scale shape: identical to stats_friedman_test — one co-partitioned
    fact ⋈ customer join, one shuffle to the b×k cell dust,
    block-partitioned windows, then k-row and 1-row aggregates only.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("treat"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("block"),
    )
    cell = (
        orders.join(cust, "o_custkey")
        .groupBy("block", "treat")
        .agg(F.sum("cents").cast("long").alias("v"))
        .localCheckpoint(eager=False)
    )
    kk = cell.agg(F.count_distinct("treat").cast("long").alias("k"))
    complete = (
        cell.crossJoin(F.broadcast(kk))  # bounded: 1-row global aggregate
        .groupBy("block", "k")
        .agg(F.count(F.lit(1)).alias("nt"), F.max("k").alias("kmax"))
        .filter(F.col("nt") == F.col("kmax"))
        .select("block")
    )
    cc = cell.join(complete, "block").localCheckpoint(eager=False)
    gv = cc.groupBy("block", "v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    ranked = gv.select(
        "block",
        "v",
        (
            2
            * F.coalesce(
                F.sum("t").over(
                    Window.partitionBy("block")
                    .orderBy("v")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.col("t")
            + 1
        ).alias("rank2"),
    )
    rc = cc.join(ranked, ["block", "v"]).select(
        "block", "treat", "rank2"
    ).localCheckpoint(eager=False)
    pos = (
        rc.select("treat")
        .distinct()
        .withColumn(
            "c_j",
            F.dense_rank().over(Window.orderBy("treat")).cast("long"),
        )
    )
    bb = rc.agg(F.count_distinct("block").cast("long").alias("b"))
    lsum = (
        rc.join(F.broadcast(pos), "treat")  # bounded: k-row treatment-position table
        .agg(
            F.sum(F.col("c_j") * F.col("rank2"))
            .cast("long")
            .alias("l2")
        )
    )
    return (
        bb.crossJoin(F.broadcast(kk))  # bounded: 1-row global aggregate
        .crossJoin(F.broadcast(lsum))  # bounded: 1-row global aggregate
        .select("b", "k", "l2", F.expr(_PAGE_Z).alias("z_micro"))
    )
