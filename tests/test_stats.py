"""Statistical-inference operators vs pure-Python references.

Each operator's DataFrame arithmetic (power sums, contingency margins,
life-table products) is replayed in plain Python on hypothesis-generated
data — the same engine-vs-reference discipline as the dedup union-find
and EWMA property tests.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from elastic_asset_etl_poc_spark.operators.stats import (
    chi2_independence,
    kaplan_meier,
    welch_ttest,
)

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)


def _welch_ref(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    qa = max((sum(x * x for x in xs) - sum(xs) ** 2 / na) / (na - 1), 0) / na
    qb = max((sum(y * y for y in ys) - sum(ys) ** 2 / nb) / (nb - 1), 0) / nb
    t = (ma - mb) / math.sqrt(qa + qb)
    df = (qa + qb) ** 2 / (qa**2 / (na - 1) + qb**2 / (nb - 1))
    return t, df


@settings(max_examples=10, deadline=None)
@given(
    xs=st.lists(finite, min_size=2, max_size=20),
    ys=st.lists(finite, min_size=2, max_size=20),
)
def test_welch_ttest_matches_reference_property(spark, xs, ys):
    """t and df agree with a plain-Python Welch computation, and the
    significance flag is consistent with |t| vs the critical value."""
    rows = [("g", float(v), 1) for v in xs] + [("g", float(v), 0) for v in ys]
    df = spark.createDataFrame(rows, "grp string, value double, arm int")
    from pyspark.sql import functions as F

    out = welch_ttest(
        df, "grp", "value", F.col("arm") == 1, F.col("arm") == 0
    ).collect()
    assert len(out) == 1
    r = out[0]
    na, nb = len(xs), len(ys)
    qa = max((sum(x * x for x in xs) - sum(xs) ** 2 / na) / (na - 1), 0) / na
    qb = max((sum(y * y for y in ys) - sum(ys) ** 2 / nb) / (nb - 1), 0) / nb
    assert r.n_a == na and r.n_b == nb
    if qa + qb == 0:
        # both variances vanish (constant samples, or squares that
        # underflow to 0 — hypothesis found [0.0, 2.2e-309]): t is
        # undefined and the operator must say NULL, not throw
        assert r.t_stat is None and r.df is None and r.significant is None
        return
    t_ref, df_ref = _welch_ref(xs, ys)
    assert math.isclose(r.t_stat, t_ref, rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(r.df, df_ref, rel_tol=1e-9, abs_tol=1e-9)
    assert r.significant == (1 if abs(t_ref) > 1.96 else 0)


@settings(max_examples=10, deadline=None)
@given(
    counts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(1, 9)),
        min_size=2,
        max_size=9,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_chi2_matches_reference_property(spark, counts):
    """chi2 equals the plain-Python Σ(o−e)²/e over the same table, and
    per-cell expected counts reproduce row·col/N."""
    cells = {(a, b): n for a, b, n in counts}
    if len({a for a, _ in cells}) < 2 or len({b for _, b in cells}) < 2:
        return  # degenerate margin: dof 0, nothing to test
    rows = [(f"a{a}", f"b{b}") for (a, b), n in cells.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi2_independence(df, "a", "b").collect()
    n = sum(cells.values())
    row_tot = {}
    col_tot = {}
    for (a, b), c in cells.items():
        row_tot[a] = row_tot.get(a, 0) + c
        col_tot[b] = col_tot.get(b, 0) + c
    chi2_ref = sum(
        (c - row_tot[a] * col_tot[b] / n) ** 2 / (row_tot[a] * col_tot[b] / n)
        for (a, b), c in cells.items()
    )
    assert len(out) == len(cells)
    for r in out:
        a, b = int(r.a[1:]), int(r.b[1:])
        e_ref = row_tot[a] * col_tot[b] / n
        assert r.n_obs == cells[(a, b)]
        assert math.isclose(r.expected, e_ref, rel_tol=1e-9)
        assert math.isclose(r.chi2_stat, chi2_ref, rel_tol=1e-9, abs_tol=1e-9)
        assert r.dof == (len(row_tot) - 1) * (len(col_tot) - 1)


def _km_ref(episodes):
    """Plain-Python Kaplan-Meier life table: {t: (n_risk, d, c, S)}."""
    from collections import Counter

    d = Counter(t for t, obs in episodes if obs)
    c = Counter(t for t, obs in episodes if not obs)
    total = len(episodes)
    out, removed, s = {}, 0, 1.0
    for t in sorted(set(d) | set(c)):
        n_risk = total - removed
        if d[t] > 0:
            s *= 1 - d[t] / n_risk
        out[t] = (n_risk, d[t], c[t], s)
        removed += d[t] + c[t]
    return out


@settings(max_examples=10, deadline=None)
@given(
    episodes=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()), min_size=1, max_size=40
    )
)
def test_kaplan_meier_matches_reference_property(spark, episodes):
    """Life table matches the sequential-product reference exactly
    (counts) and to 1e-9 (survival); survival is non-increasing and
    hits 0 exactly when a day absorbs everyone at risk."""
    df = spark.createDataFrame(
        [(t, 1 if obs else 0) for t, obs in episodes],
        "t_day int, observed int",
    )
    out = sorted(kaplan_meier(df).collect(), key=lambda r: r.t_day)
    ref = _km_ref(episodes)
    assert [r.t_day for r in out] == sorted(ref)
    prev_s = 1.0
    for r in out:
        n_risk, d, c, s = ref[r.t_day]
        assert (r.n_risk, r.n_events, r.n_censored) == (n_risk, d, c)
        assert math.isclose(r.survival, s, rel_tol=1e-9, abs_tol=1e-9)
        assert r.survival <= prev_s + 1e-12
        prev_s = r.survival


def test_kaplan_meier_censoring_changes_the_answer(spark):
    """The reason KM exists: censored subjects keep contributing to the
    at-risk denominator, so S(t) sits ABOVE the naive all-events curve.
    5 events at t=1 plus 5 censored at t=2: KM S(1) = 0.5; treating the
    censored as events would give the same S(1) but S(2)=0 — KM leaves
    S(2) at 0.5 because no event ever occurs at t=2."""
    rows = [(1, 1)] * 5 + [(2, 0)] * 5
    df = spark.createDataFrame(rows, "t_day int, observed int")
    out = {r.t_day: r for r in kaplan_meier(df).collect()}
    assert out[1].n_risk == 10 and abs(out[1].survival - 0.5) < 1e-12
    assert out[2].n_risk == 5 and abs(out[2].survival - 0.5) < 1e-12
    assert out[2].n_events == 0 and out[2].n_censored == 5


def _interp_median(vals):
    v = sorted(vals)
    pos = 0.5 * (len(v) - 1)
    lo, hi = math.floor(pos), math.ceil(pos)
    return v[lo] + (v[hi] - v[lo]) * (pos - lo)


@settings(max_examples=10, deadline=None)
@given(
    ys=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=3,
        max_size=12,
    )
)
def test_theil_sen_matches_reference_property(spark, ys):
    """Slope/intercept equal the plain-Python median-of-pairwise-slopes
    (interpolated median, same index arithmetic)."""
    from elastic_asset_etl_poc_spark.operators.profile import theil_sen

    rows = [("g", float(i), float(y)) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = theil_sen(df, "g", "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    slopes = [
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    ]
    slope_ref = _interp_median(slopes)
    icept_ref = _interp_median([y - slope_ref * i for i, y in enumerate(ys)])
    assert r.n_points == len(ys) and r.n_pairs == len(slopes)
    assert math.isclose(r.slope, slope_ref, rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(r.intercept, icept_ref, rel_tol=1e-9, abs_tol=1e-9)


def test_theil_sen_breakdown_resists_outliers(spark):
    """The robustness claim itself: corrupt 2 of 10 days of a perfect
    slope-3 line by +1000 and the Theil-Sen slope stays exactly 3
    (OLS on the same data gives ~48)."""
    from elastic_asset_etl_poc_spark.operators.profile import theil_sen

    ys = [3.0 * i for i in range(10)]
    ys[4] += 1000
    ys[7] += 1000
    df = spark.createDataFrame(
        [("g", float(i), y) for i, y in enumerate(ys)],
        "g string, x double, y double",
    )
    r = theil_sen(df, "g", "x", "y").collect()[0]
    assert abs(r.slope - 3.0) < 1e-9


@settings(max_examples=10, deadline=None)
@given(
    baskets=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.lists(st.integers(0, 4), min_size=1, max_size=4),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_basket_rules_matches_bruteforce_property(spark, baskets):
    """Every pair's n_ab/support/confidence/lift equals the itertools
    brute force over the same basket sets, and no pair is missing."""
    from itertools import combinations

    from elastic_asset_etl_poc_spark.operators.rules import basket_rules

    rows = [
        (bk, f"i{it}") for bk, items in baskets for it in items
    ]
    df = spark.createDataFrame(rows, "bk int, item string")
    out = {
        (r.item_a, r.item_b): r
        for r in basket_rules(df, "bk", "item", min_support=0.0).collect()
    }
    sets = {bk: {f"i{i}" for i in items} for bk, items in baskets}
    n = len(sets)
    item_n = {}
    pair_n = {}
    for s in sets.values():
        for it in s:
            item_n[it] = item_n.get(it, 0) + 1
        for a, b in combinations(sorted(s), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    assert set(out) == set(pair_n)
    for (a, b), nab in pair_n.items():
        r = out[(a, b)]
        assert r.n_ab == nab
        assert math.isclose(r.support, nab / n, rel_tol=1e-12)
        assert math.isclose(r.conf_a_to_b, nab / item_n[a], rel_tol=1e-12)
        assert math.isclose(r.conf_b_to_a, nab / item_n[b], rel_tol=1e-12)
        assert math.isclose(
            r.lift, nab * n / (item_n[a] * item_n[b]), rel_tol=1e-12
        )


def _interp_pct(vals, q):
    v = sorted(vals)
    pos = q * (len(v) - 1)
    lo, hi = math.floor(pos), math.ceil(pos)
    return v[lo] + (v[hi] - v[lo]) * (pos - lo)


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        min_size=4,
        max_size=25,
    ),
    reps=st.sampled_from([8, 16]),
)
def test_bootstrap_ci_replays_exactly_property(spark, vals, reps):
    """The whole mechanism — md5 uniform, Poisson threshold walk,
    replicate weighted means, interpolated percentile CI — replayed in
    plain Python with hashlib agrees to 1e-9."""
    import hashlib

    from elastic_asset_etl_poc_spark.operators.stats import (
        POISSON1_CUM,
        bootstrap_mean_ci,
    )

    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, rid int, v double")
    out = bootstrap_mean_ci(df, "g", "rid", "v", n_reps=reps).collect()
    assert len(out) == 1
    r = out[0]

    def weight(rid, rep):
        h = hashlib.md5(f"{rid}:{rep // 8}".encode()).hexdigest()
        off = (rep % 8) * 4
        u = (int(h[off : off + 4], 16) + 0.5) / 65536.0
        for k, c in enumerate(POISSON1_CUM):
            if u < c:
                return k
        return 7

    means = []
    for rep in range(reps):
        ws = [weight(i, rep) for i in range(len(vals))]
        if sum(ws) > 0:
            means.append(
                sum(w * v for w, v in zip(ws, vals)) / sum(ws)
            )
    if len(means) < reps:
        return  # a replicate drew all-zero weights: out of contract
    assert r.n_rows == len(vals) and r.n_reps == reps
    assert math.isclose(r.mean, sum(vals) / len(vals), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(
        r.boot_lo, _interp_pct(means, 0.025), rel_tol=1e-9, abs_tol=1e-9
    )
    assert math.isclose(
        r.boot_hi, _interp_pct(means, 0.975), rel_tol=1e-9, abs_tol=1e-9
    )
    assert r.boot_lo <= r.boot_hi


@settings(max_examples=10, deadline=None)
@given(
    ys=st.lists(
        st.floats(min_value=0, max_value=500, allow_nan=False),
        min_size=2,
        max_size=15,
    ),
    ab=st.tuples(
        st.floats(min_value=0.1, max_value=0.9),
        st.floats(min_value=0.1, max_value=0.9),
    ),
)
def test_holt_linear_matches_reference_property(spark, ys, ab):
    """The JVM array fold replays the plain-Python Holt recurrence
    exactly: level, trend, one-step SSE, and h-step forecasts."""
    from elastic_asset_etl_poc_spark.operators.temporal import holt_linear

    alpha, beta = ab
    df = spark.createDataFrame(
        [("g", float(i), float(y)) for i, y in enumerate(ys)],
        "g string, x double, y double",
    )
    out = holt_linear(
        df, "g", "x", "y", alpha=alpha, beta=beta, horizon=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    l, b, sse = ys[1], ys[1] - ys[0], 0.0
    for y in ys[2:]:
        pred = l + b
        l2 = alpha * y + (1.0 - alpha) * pred
        b2 = beta * (l2 - l) + (1.0 - beta) * b
        d = y - pred
        sse += d * d
        l, b = l2, b2
    assert r.n_points == len(ys)
    assert math.isclose(r.level, l, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(r.trend, b, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(r.sse, sse, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(r.forecast_1, l + b, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(
        r.forecast_2, l + 2.0 * b, rel_tol=1e-12, abs_tol=1e-12
    )


def test_holt_linear_tracks_a_perfect_line(spark):
    """On an exact line y = 5 + 2x the smoother locks on: one-step
    predictions are exact (SSE 0) and forecasts continue the line."""
    from elastic_asset_etl_poc_spark.operators.temporal import holt_linear

    df = spark.createDataFrame(
        [("g", float(i), 5.0 + 2.0 * i) for i in range(12)],
        "g string, x double, y double",
    )
    r = holt_linear(df, "g", "x", "y", alpha=0.4, beta=0.2).collect()[0]
    assert abs(r.sse) < 1e-18
    assert abs(r.trend - 2.0) < 1e-12
    assert abs(r.forecast_3 - (5.0 + 2.0 * 14)) < 1e-9
