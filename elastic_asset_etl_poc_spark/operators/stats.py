"""Statistical inference operators: is an observed difference real?

The drift family (``operators/profile.py`` monitors, PSI/CUSUM/centroid)
reports effect sizes — THAT a distribution moved.  These operators answer
the follow-up a paging decision needs: is the move distinguishable from
sampling noise?  Every test statistic is explicit power-sum / life-table
arithmetic on DataFrame expressions (no engine stats builtins whose
estimator conventions differ between engines, no SciPy), so the suite's
DuckDB oracles can restate the identical formulas and the driver hash
checks the inference math end to end.

No reference-repo counterpart (the reference's 782-LoC TS PoC has no
statistics surface); this extends the analytics families the way a
100-TB curation pipeline needs: gate retrain/rollout decisions on
significance, not raw deltas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cond_a: Column,
    cond_b: Column,
    crit: float = 1.96,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test per group.

    ``cond_a`` / ``cond_b`` split each group's rows into the two samples
    (rows matching neither are ignored; rows matching both would be
    double-counted — caller's contract to keep them disjoint).  Returns
    one row per group with n/mean per sample, the t statistic, the
    Welch–Satterthwaite degrees of freedom, and a normal-approximation
    significance flag at ``crit`` (df is typically huge here, where t≈z).

    Scale shape: ONE map-side-combined aggregation over the group key
    computes all six power sums (n, Σx, Σx²) for both samples; the test
    arithmetic runs on the |groups| frame.  Sample variances are clamped
    at 0 (catastrophic-cancellation guard for near-constant groups).
    """
    v = F.col(value_col)
    g = df.groupBy(group_col).agg(
        F.sum(F.when(cond_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(cond_a, v)).alias("sa1"),
        F.sum(F.when(cond_a, v * v)).alias("sa2"),
        F.sum(F.when(cond_b, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(cond_b, v)).alias("sb1"),
        F.sum(F.when(cond_b, v * v)).alias("sb2"),
    )
    return welch_from_sums(g, group_col, crit=crit)


def welch_from_sums(
    g: DataFrame, group_col: str, crit: float = 1.96
) -> DataFrame:
    """The Welch tail over an already-aggregated power-sum frame
    (columns na, sa1, sa2, nb, sb1, sb2 per group) — split out so the
    STREAMING twin can maintain the six sums as one running aggregation
    and read t/df off the drained state with the identical expression
    tree as the batch form."""
    na, nb = F.col("na"), F.col("nb")
    mean_a, mean_b = F.col("sa1") / na, F.col("sb1") / nb
    qa = (
        F.greatest(
            (F.col("sa2") - F.col("sa1") * F.col("sa1") / na) / (na - 1),
            F.lit(0),
        )
        / na
    )
    qb = (
        F.greatest(
            (F.col("sb2") - F.col("sb1") * F.col("sb1") / nb) / (nb - 1),
            F.lit(0),
        )
        / nb
    )
    # degenerate guard: if BOTH sample variances are 0 (constant
    # samples, or squares underflowing to 0 for subnormal values —
    # found by hypothesis), t is undefined; emit NULLs rather than
    # letting ANSI mode throw DIVIDE_BY_ZERO mid-pipeline
    defined = (qa + qb) > 0
    t = F.when(defined, (mean_a - mean_b) / F.sqrt(qa + qb))
    df_ws = F.when(
        defined,
        (qa + qb) * (qa + qb)
        / (qa * qa / (na - 1) + qb * qb / (nb - 1)),
    )
    return g.filter((na > 1) & (nb > 1)).select(
        group_col,
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        t.alias("t_stat"),
        df_ws.alias("df"),
        F.when(F.abs(t) > crit, 1)
        .when(t.isNotNull(), 0)
        .cast("int")
        .alias("significant"),
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-squared test of independence between two categoricals.

    Returns the contingency table with per-cell expected counts and
    contributions plus the (repeated) summed chi2 statistic and
    dof = (R−1)(C−1), so the margin arithmetic — not just the scalar
    verdict — is checkable.

    Scale shape: ONE map-side-combined aggregation builds the observed
    table; margins, expectations, and the statistic are window sums over
    the |A|×|B| cell frame (tiny by construction — a categorical test
    over unbounded-cardinality keys is the caller's modeling error).
    """
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("o"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct(col_a).alias("r"),
        F.countDistinct(col_b).alias("c"),
    )
    m = (
        cells.crossJoin(F.broadcast(tot))
        .withColumn("row_tot", F.sum("o").over(Window.partitionBy(col_a)))
        .withColumn("col_tot", F.sum("o").over(Window.partitionBy(col_b)))
    )
    x = m.withColumn(
        "e", F.col("row_tot") * F.col("col_tot") * 1.0 / F.col("n")
    )
    contrib = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col(
        "e"
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return x.select(
        col_a,
        col_b,
        F.col("o").cast("bigint").alias("n_obs"),
        F.col("e").alias("expected"),
        contrib.alias("contrib"),
        F.sum(contrib).over(w_all).alias("chi2_stat"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
    )


def kaplan_meier(episodes: DataFrame) -> DataFrame:
    """Kaplan-Meier survival estimator from an episode frame.

    ``episodes`` must carry integer ``t_day`` (duration) and integer
    ``observed`` (1 = the terminal event happened, 0 = right-censored —
    the subject was still alive when observation stopped, so its
    duration is a lower bound).  Returns the life table: per distinct
    duration t, at-risk count nₜ = total − Σ_{s<t}(dₛ+cₛ), event and
    censor counts, and S(t) = Π_{s≤t}(1 − dₛ/nₛ) computed as exp of a
    cumulative Σln (associative, engine-portable), with a cumulative
    dead_seen flag replacing ln(0) when a day absorbs everyone at risk.

    Scale shape: ONE shuffle aggregates episodes to the life table; the
    table is O(distinct durations) — days, not subjects — so the
    single-partition cumulative windows run on a constant-size frame.
    """
    life = episodes.groupBy("t_day").agg(
        F.sum(F.col("observed")).alias("d"),
        F.sum(1 - F.col("observed")).alias("c"),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.partitionBy().orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.partitionBy().orderBy("t_day")
    r = life.withColumn(
        "n_risk",
        F.sum(F.col("d") + F.col("c")).over(w_all)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    s = r.withColumn(
        "dead_seen",
        F.max(F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)).over(
            w_cum
        ),
    ).withColumn(
        "logsum",
        F.sum(
            F.when(
                (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
                F.log(1 - F.col("d") * 1.0 / F.col("n_risk")),
            ).otherwise(0.0)
        ).over(w_cum),
    )
    return s.select(
        F.col("t_day").cast("bigint").alias("t_day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        F.when(F.col("dead_seen") == 1, 0.0)
        .otherwise(F.exp(F.col("logsum")))
        .alias("survival"),
    )


#: Cumulative Poisson(1) probabilities c_k = Σ_{j≤k} e⁻¹/j! for k = 0..6.
#: A deterministic uniform u maps to the weight k with c_{k-1} ≤ u < c_k
#: (u ≥ c_6 → 7; P ≈ 8e-5 truncation, mean preserved to ~1e-4).  Computed
#: once here and interpolated into BOTH the Spark expression and the suite's
#: DuckDB oracle SQL, so the two engines compare u against bit-identical
#: literals.
POISSON1_CUM: list[float] = []
_acc, _term = 0.0, 2.718281828459045**-1.0
for _k in range(7):
    _acc += _term
    POISSON1_CUM.append(_acc)
    _term /= _k + 1


def poisson_weight_case_sql(u_expr: str) -> str:
    """The weight CASE as ANSI SQL over a uniform expression."""
    arms = "\n".join(
        f"         WHEN {u_expr} < {c!r} THEN {k}"
        for k, c in enumerate(POISSON1_CUM)
    )
    return f"    CASE\n{arms}\n         ELSE 7 END"


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    n_reps: int = 32,
    alpha: float = 0.05,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-group mean.

    The classic bootstrap resamples n rows WITH replacement — a
    per-replicate global operation that cannot be expressed as one scan.
    The Poisson bootstrap (Kleiner et al.'s streaming approximation)
    replaces the multinomial with an independent Poisson(1) weight per
    (row, replicate): each replicate's weighted mean is then an ordinary
    associative aggregation, so R replicates are ONE map-side-combined
    shuffle over an exploded (row × replicate) stream — no resampling
    pass, no driver state.

    The weight draw is the repo's replayable idiom: u = md5(id ‖ ':' ‖
    rep) → (0,1), mapped through the POISSON1_CUM thresholds — fully
    deterministic, so an oracle can replay the exact draws and the CI is
    hash-checkable (a production run would salt the hash per publication).

    Returns per group: row count, plain mean, and the interpolated
    [alpha/2, 1−alpha/2] percentile interval over the R replicate means
    (exact `percentile` — the buffer is R values per group, constant).
    """
    lo_q, hi_q = alpha / 2.0, 1.0 - alpha / 2.0
    # Hash once, slice many: one md5 per (row, salt) yields EIGHT 16-bit
    # uniforms (4 hex chars each), so n_reps replicates cost
    # ceil(n_reps/8) digests per row instead of n_reps — at corpus scale
    # the hashing, not the weighted sum, dominates the bootstrap
    # (measured at sf0.1: 5.9s per-rep md5 → 3.0s sliced; a 64-agg
    # explode-free variant was ALSO tried and rejected — its generated
    # hash-agg method exceeds the JIT limit, Spark falls back to
    # interpreted aggregation, and it times 5.3s).  16-bit resolution is
    # ample against the POISSON1_CUM thresholds (truncation shifts the
    # weight probabilities by < 2⁻¹⁶), and the draw stays fully
    # replayable: the oracle slices the identical digests.
    n_salts = (n_reps + 7) // 8
    v = F.col(value_col)
    base = df.select(
        F.col(group_col).alias("g"), F.col(id_col).alias("rid"), v.alias("v")
    )
    for sidx in range(n_salts):
        base = base.withColumn(
            f"h{sidx}",
            F.md5(F.concat(F.col("rid").cast("string"), F.lit(f":{sidx}"))),
        )

    x = base.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1)))
    )
    hx = F.col("h0")
    for sidx in range(1, n_salts):
        hx = F.when(
            F.floor(F.col("rep") / 8) == sidx, F.col(f"h{sidx}")
        ).otherwise(hx)
    u = (
        F.conv(
            hx.substr(
                ((F.col("rep") % 8) * 4 + 1).cast("int"), F.lit(4)
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / 65536.0
    wt = F.lit(7)
    for k in range(len(POISSON1_CUM) - 1, -1, -1):
        wt = F.when(u < F.lit(POISSON1_CUM[k]), k).otherwise(wt)
    w = x.withColumn("wt", wt)
    m = w.groupBy("g", "rep").agg(
        (F.sum(F.col("wt") * F.col("v")) / F.sum("wt")).alias("mboot")
    )
    ci = m.groupBy("g").agg(
        F.expr(f"percentile(mboot, {lo_q}D)").alias("boot_lo"),
        F.expr(f"percentile(mboot, {hi_q}D)").alias("boot_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
    )
    stats = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(v) / F.count(F.lit(1))).alias("mean"),
    )
    return stats.join(F.broadcast(ci), "g").select(
        F.col("g").alias(group_col),
        "n_rows",
        "mean",
        "boot_lo",
        "boot_hi",
        "n_reps",
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    cond_a: Column,
    cond_b: Column,
    quantize: int = 2,
    crit: float = 1.96,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test with tie correction —
    the NONPARAMETRIC sibling of welch_ttest: is sample A stochastically
    larger than sample B, with no normality assumption (the right test
    when `value` is skewed revenue / latency, where a mean-based t-test
    chases outliers).

    Rank arithmetic without a global rank window:
    U_A = #(a > b) + ½·#(a == b) over all cross pairs = Σ_v
    ca(v)·(cumB(<v) + ½·cb(v)), so the corpus collapses to ONE
    aggregation over DISTINCT QUANTIZED values (`round(value,
    quantize)` — the quantization bounds the distinct-value frame by
    the value range, not the corpus, which is what makes the cumulative
    window scale; ties it introduces are handled exactly by the tie
    correction).  The single ordered window then runs over that bounded
    frame only.  Normal approximation with tie-corrected variance:
    σ² = na·nb/12·((n+1) − Σ(t³−t)/(n(n−1))).

    Tie cubes stay EXACT-INTEGER (DECIMAL(38,0) — not BIGINT, whose
    int64 wraps silently in non-ANSI Spark once a quantized tie group
    exceeds ~2.1M rows while DuckDB raises, diverging the engines at
    scale) until one final float conversion, so partition order cannot
    perturb z and t up to ~4.6e12 rows per tie group is exact.  The
    oracle mirrors with HUGEINT (int128) — same values below 1e38.
    Returns one row: n_a, n_b, u_stat, z, significant."""
    v = F.round(F.col(value_col).cast("double"), quantize)
    per_v = (
        df.filter(cond_a | cond_b)
        .select(
            v.alias("qv"),
            F.when(cond_a, 1).otherwise(0).alias("ia"),
            F.when(cond_b, 1).otherwise(0).alias("ib"),
        )
        .groupBy("qv")
        .agg(
            F.sum("ia").cast("bigint").alias("ca"),
            F.sum("ib").cast("bigint").alias("cb"),
        )
    )
    w = (
        Window.orderBy("qv")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = per_v.withColumn(
        "cum_b_less", F.coalesce(F.sum("cb").over(w), F.lit(0))
    )
    t = (F.col("ca") + F.col("cb")).cast("decimal(20,0)")
    agg = scored.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca").cast("double")
            * (
                F.col("cum_b_less").cast("double")
                + F.col("cb").cast("double") / 2.0
            )
        ).alias("u_a"),
        F.sum(t * t * t - t).alias("tie_cubes"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    n = na + nb
    mu = na * nb / 2.0
    var = (
        na
        * nb
        / 12.0
        * (
            (n + 1.0)
            - F.col("tie_cubes").cast("double") / (n * (n - 1.0))
        )
    )
    z = F.when(var > 0, (F.col("u_a") - mu) / F.sqrt(var))
    return agg.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("u_a").alias("u_stat"),
        z.alias("z"),
        F.when(F.abs(z) > crit, 1)
        .when(z.isNotNull(), 0)
        .cast("int")
        .alias("significant"),
    )


def bh_fdr(
    tests: DataFrame,
    key_col: str,
    p_col: str,
    q: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control over a frame of
    per-hypothesis p-values — the multiple-testing step every
    drift/experiment DASHBOARD needs once it tests many segments at
    once (m tests at α=0.05 expect m/20 false alarms; BH caps the
    expected false-discovery fraction at q instead).

    Sort p ascending (key tiebreak), threshold the i-th smallest at
    i·q/m, reject hypotheses 1..k where k is the LARGEST i passing its
    threshold (the BH step-up rule — rejects everything below the last
    passing rank even if intermediate ranks failed).

    Scale shape: the input frame is one row per HYPOTHESIS (segments,
    not corpus rows — upstream tests already collapsed the corpus), so
    the two global windows here run over m rows.  NULL p-values
    (degenerate upstream tests) are excluded from m and reported
    unrejected."""
    tested = tests.filter(F.col(p_col).isNotNull())
    wrank = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        tested.withColumn("bh_rank", F.row_number().over(wrank))
        .withColumn("__m", F.count(F.lit(1)).over(wall))
        .withColumn(
            "bh_thresh",
            F.col("bh_rank").cast("double") * q / F.col("__m"),
        )
        .withColumn(
            "__k",
            F.max(
                F.when(
                    F.col(p_col) <= F.col("bh_thresh"), F.col("bh_rank")
                ).otherwise(0)
            ).over(wall),
        )
        .withColumn(
            "rejected",
            (F.col("bh_rank") <= F.col("__k")).cast("int"),
        )
    )
    skipped = tests.filter(F.col(p_col).isNull()).withColumn(
        "bh_rank", F.lit(None).cast("int")
    ).withColumn("bh_thresh", F.lit(None).cast("double")).withColumn(
        "rejected", F.lit(0)
    )
    return ranked.drop("__m", "__k").unionByName(skipped)


def ks_test(
    df: DataFrame,
    value_col: str,
    cond_a: Column,
    cond_b: Column,
    quantize: int = 2,
    alpha_c: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: D = max |F_a(v) − F_b(v)|
    over the pooled support — the distribution-SHAPE drift test that
    catches what mean/variance tests (welch) and binned divergences
    (PSI, whose verdict depends on the chosen bins) both miss, with no
    bins to tune.

    Same scale skeleton as mann_whitney_u: collapse the corpus to
    per-quantized-value counts in ONE aggregation, then a single
    ordered window over the bounded distinct-value frame computes both
    running CDFs; D is the max absolute gap.  Integer cumulative
    counts divide by integer totals once per value — each |gap| is one
    IEEE subtraction of two single-division ratios, identical in any
    engine, and max() is order-free.  Significance at α=0.05 uses the
    asymptotic critical value c(α)·√((na+nb)/(na·nb)), c = 1.358.

    Returns one row: n_a, n_b, ks_stat, ks_crit, significant."""
    v = F.round(F.col(value_col).cast("double"), quantize)
    per_v = (
        df.filter(cond_a | cond_b)
        .select(
            v.alias("qv"),
            F.when(cond_a, 1).otherwise(0).alias("ia"),
            F.when(cond_b, 1).otherwise(0).alias("ib"),
        )
        .groupBy("qv")
        .agg(
            F.sum("ia").cast("bigint").alias("ca"),
            F.sum("ib").cast("bigint").alias("cb"),
        )
    )
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_v.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    ).select(
        "cum_a",
        "cum_b",
        F.max("cum_a").over(w_all).alias("ta"),
        F.max("cum_b").over(w_all).alias("tb"),
    )
    agg = cum.agg(
        F.max("ta").alias("na"),
        F.max("tb").alias("nb"),
        F.max(
            F.abs(
                F.col("cum_a").cast("double") / F.col("ta")
                - F.col("cum_b").cast("double") / F.col("tb")
            )
        ).alias("ks_stat"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    crit = F.lit(alpha_c) * F.sqrt((na + nb) / (na * nb))
    return agg.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("ks_stat"),
        crit.alias("ks_crit"),
        (F.col("ks_stat") > crit).cast("int").alias("significant"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    quantize: int = 2,
) -> DataFrame:
    """Spearman rank correlation with average-rank tie handling —
    Pearson's r computed on RANKS, the monotone-association measure
    robust to outliers and nonlinearity (welch/theil-sen answer level
    and trend; this answers "do x and y move together at all").

    Ranks never materialize per row: for each quantized value, the
    average rank is cum_before + (count+1)/2 — a window over the
    bounded distinct-value frame per AXIS (two small windows), joined
    back to the corpus rows map-side (broadcast: the rank tables are
    value-domain-sized).  The Pearson tail is then ONE power-sum
    aggregation over (rank_x, rank_y) pairs, the welch/moments shape.

    Returns one row: n, rho, with rho = (nΣxy − ΣxΣy) /
    √(nΣx²−(Σx)²)/√(nΣy²−(Σy)²) on ranks."""
    qx = F.round(F.col(x_col).cast("double"), quantize)
    qy = F.round(F.col(y_col).cast("double"), quantize)
    base = df.select(qx.alias("qx"), qy.alias("qy"))

    def rank_table(col: str):
        per = base.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per.select(
            col,
            (
                F.coalesce(F.sum("c").over(w), F.lit(0)).cast("double")
                + (F.col("c").cast("double") + 1.0) / 2.0
            ).alias(f"r{col[-1]}"),
        )

    ranked = base.join(F.broadcast(rank_table("qx")), "qx").join(
        F.broadcast(rank_table("qy")), "qy"
    )
    g = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return g.select(
        n.cast("bigint").alias("n"),
        F.when(den > 0, num / den).alias("rho"),
    )
