"""Degenerate-input sweep: empty corpora, single rows, all-identical rows,
all-null payloads.  The advisor-class failure mode is an unguarded
division/aggregate on a degenerate distribution (r4 found one in the
power iteration); this pins the core operator families against the three
cheapest adversaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


EMPTY = []
SINGLE = [(0, "one single document here")]
IDENTICAL = [(i, "same words in every doc") for i in range(12)]


@pytest.mark.parametrize("rows", [EMPTY, SINGLE, IDENTICAL], ids=["empty", "single", "identical"])
def test_dedup_family_degenerate(spark, rows):
    from es_ch_sync_spark.operators import dedup as dd

    df = (
        _docs(spark, rows)
        if rows
        else spark.createDataFrame([], "doc_id long, text string")
    )
    assert dd.minhash_near_duplicates(df, threshold=0.5).count() >= 0
    assert dd.remove_dup_spans(df, k=3).count() >= 0
    assert dd.remove_boilerplate_chunks(df, chunk_tokens=2, min_docs=2).count() == len(rows)
    assert dd.prefix_filter_pairs(df, shingle_k=3, threshold=0.6).count() >= 0
    if rows is IDENTICAL:
        # 12 identical docs → all pairs are dups in every exact tier
        assert dd.prefix_filter_pairs(df, shingle_k=3, threshold=0.6).count() == 66
        groups = dd.exact_duplicate_groups(df).collect()
        assert len(groups) == 1 and groups[0]["n_copies"] == 12


@pytest.mark.parametrize("rows", [EMPTY, SINGLE, IDENTICAL], ids=["empty", "single", "identical"])
def test_text_family_degenerate(spark, rows):
    from es_ch_sync_spark.operators import text as tx

    df = (
        _docs(spark, rows)
        if rows
        else spark.createDataFrame([], "doc_id long, text string")
    )
    assert tx.analyze_documents(df).count() == len(rows)
    assert tx.tfidf_top_terms(df, k=3).count() >= 0


def test_similarity_degenerate_single_vector(spark):
    """A 1-vector corpus: cosine top-k returns nothing when the only
    vector is excluded; a 2-identical-vector corpus scores 1.0."""
    from es_ch_sync_spark.operators import similarity as sim

    one = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    q = [1.0] * 8
    assert sim.cosine_topk(one, q, k=5, exclude_id=0).count() == 0
    two = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    got = sim.cosine_topk(two, q, k=5, exclude_id=0).collect()
    assert len(got) == 1 and abs(got[0]["cos_sim"] - 1.0) < 1e-6


def test_sampling_degenerate(spark):
    from es_ch_sync_spark.operators import sampling as sp

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert sp.assign_split(empty).count() == 0
    assert sp.global_shuffle(empty).count() == 0
    one = spark.createDataFrame(
        [(5, "only doc", "s")], "doc_id long, text string, source string"
    )
    shuf = sp.global_shuffle(one).collect()
    assert len(shuf) == 1 and shuf[0]["shuffle_pos"] == 0
    # negative sampling on a single-doc corpus: anchor exists (pos 0),
    # negatives must never be the anchor — with N=1 deflection wraps to
    # the anchor itself, the documented N>1 contract, so just require it
    # not to crash and to emit no self-pair OR nothing
    out = sp.negative_sample_pairs(one, k=2, anchor_every=1).collect()
    for r in out:
        assert r["slot"] in (0, 1)


def test_analytics_degenerate(spark):
    from es_ch_sync_spark.operators import analytics as an

    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, value double"
    )
    assert an.sessionize(empty, gap_seconds=1800).count() == 0
    assert an.ewma_last(empty, "user_id", ["ts", "event_id"], "value", 0.3).count() == 0
    # constant series: zscore must not divide by zero
    import datetime

    const = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, h), h, 5.0)
            for h in range(10)
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    rows = an.zscore_anomalies(
        const, key="user_id", value_col="value", id_col="event_id"
    ).collect()
    assert rows == [] or all(not r["is_anomaly"] for r in rows)


def test_mann_kendall_singleton_and_empty_series(spark):
    """A key with one day has no pairs — it drops out of the result (S is
    undefined, matching R's Kendall on n<2) rather than emitting junk;
    an empty frame yields an empty result with the right schema."""
    import datetime

    from es_ch_sync_spark.operators.analytics import mann_kendall_sen

    d0 = datetime.date(2024, 1, 1)
    rows = [("solo", d0, 5)] + [
        ("pair", d0 + datetime.timedelta(days=i), 5 + i) for i in range(2)
    ]
    daily = spark.createDataFrame(rows, "k string, day date, y long")
    got = {r["k"]: r for r in mann_kendall_sen(daily, key_col="k").collect()}
    assert "solo" not in got and got["pair"]["s_stat"] == 1
    empty = spark.createDataFrame([], "k string, day date, y long")
    out = mann_kendall_sen(empty, key_col="k")
    assert out.count() == 0
    assert set(out.columns) == {"k", "n_days", "s_stat", "sen_slope", "z_score", "trend"}


def test_spearman_constant_series_yields_null_rho(spark):
    """Zero variance in either series → rho is NULL (undefined), never a
    division-by-zero or a fabricated 0."""
    from es_ch_sync_spark.operators.analytics import spearman_by_key

    rows = [("k", i, 7, 100 - i) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, day int, x long, y long")
    got = spearman_by_key(df, key_col="k", x_col="x", y_col="y").collect()[0]
    assert got["spearman_rho"] is None and got["n"] == 5


def test_k_anonymity_empty_when_compliant(spark):
    """A table whose every class clears both floors reports nothing."""
    from es_ch_sync_spark.operators.sampling import k_anonymity_report

    rows = [("g", i % 10) for i in range(50)]
    df = spark.createDataFrame(rows, "q string, s long")
    out = k_anonymity_report(df, ["q"], "s", k=5, l=2)
    assert out.count() == 0


def test_stats_family_degenerate(spark):
    """Empty pools, one-arm-only pools, constant series: every statistic
    must return an empty frame or NULL, never divide by zero."""
    import datetime as dt

    from es_ch_sync_spark.operators.analytics import (
        acf_daily,
        benford_report,
        kendall_tau_pairs,
        ks_two_sample,
    )

    empty = spark.createDataFrame([], "arm string, value double")
    assert ks_two_sample(empty, "arm", "value", "A", "B").count() == 0

    one_arm = spark.createDataFrame([("A", 1.0), ("A", 2.0)], "arm string, value double")
    r = ks_two_sample(one_arm, "arm", "value", "A", "B").collect()[0]
    assert r["n_b"] == 0 and r["d_stat"] is None  # 0/0 -> NULL, no crash

    d0 = dt.date(2024, 1, 1)
    const = spark.createDataFrame(
        [("k", d0 + dt.timedelta(days=i), 5.0) for i in range(4)],
        "k string, day date, y double",
    )
    # constant series: denominator 0 -> acf NULL on every lag
    assert all(x["acf"] is None for x in acf_daily(const, "k", "day", "y", 2).collect())
    single = spark.createDataFrame([("k", d0, 1.0)], "k string, day date, y double")
    assert acf_daily(single, "k", "day", "y", 2).count() == 0  # no lag pairs

    lone = spark.createDataFrame(
        [("a", d0 + dt.timedelta(days=i), i) for i in range(3)],
        "k string, day date, y long",
    )
    assert kendall_tau_pairs(lone, "k", "day", "y").count() == 0  # one key, no pairs

    no_rows = spark.createDataFrame([], "amt double")
    grid = benford_report(no_rows, "amt").collect()
    assert len(grid) == 9 and all(g["n_obs"] == 0 for g in grid)
    assert all(g["chisq_term"] is None for g in grid)  # N=0 -> NULL terms


def test_char_entropy_degenerate(spark):
    """Empty docs drop out (no characters); a constant doc has exactly
    zero entropy; a uniform two-char doc has ln(2) nats."""
    import math

    from es_ch_sync_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, ""), (2, "aaaa"), (3, "abab")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert 1 not in got
    assert got[2]["entropy_nats"] == 0.0 and got[2]["n_distinct"] == 1
    assert abs(got[3]["entropy_nats"] - math.log(2)) < 1e-5


def test_mann_whitney_degenerate_pools_emit_zero_rows(spark):
    """Empty or one-arm pools emit ZERO rows — matching the SQL oracle's
    cross join of per-arm subqueries — instead of one NULL/0 row from the
    global aggregate (r8 ADVICE)."""
    from es_ch_sync_spark.operators.analytics import ab_mann_whitney

    empty = spark.createDataFrame([], "arm string, value double")
    assert ab_mann_whitney(empty, "arm", "value", "A", "B").count() == 0

    one_arm = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0)], "arm string, value double"
    )
    assert ab_mann_whitney(one_arm, "arm", "value", "A", "B").count() == 0

    # a healthy two-arm pool is unaffected
    both = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)],
        "arm string, value double",
    )
    r = ab_mann_whitney(both, "arm", "value", "A", "B").collect()
    assert len(r) == 1 and r[0]["n_a"] == 2 and r[0]["n_b"] == 2


def test_kendall_tau_pairs_key_count_ceiling(spark):
    """A degenerate high-key-count table fails LOUDLY at the guarded
    LIMIT probe (quadratic C(keys,2) output; r8 judge directive #2)
    instead of silently forming 10^10 pairs; under the ceiling the
    operator is unchanged."""
    import datetime as dt

    import pytest

    from es_ch_sync_spark.operators.analytics import kendall_tau_pairs

    d0 = dt.date(2024, 1, 1)
    wide = spark.createDataFrame(
        [(f"k{i}", d0, 1) for i in range(12)], "k string, day date, y long"
    )
    with pytest.raises(ValueError, match="quadratic"):
        kendall_tau_pairs(wide, "k", "day", "y", max_keys=10)
    # the same table under the ceiling runs (12 keys, 1 day -> no day pairs)
    assert kendall_tau_pairs(wide, "k", "day", "y", max_keys=20).count() == 0


def test_readability_degenerate(spark):
    """Whitespace-only and empty docs: zero words must yield NULL scores
    (never a division by zero) while counts stay exact."""
    from es_ch_sync_spark.operators.text import readability_by_source

    df = spark.createDataFrame(
        [("s", ""), ("s", "   ")], "source string, text string"
    )
    r = readability_by_source(df).collect()[0]
    assert r["sum_words"] == 0
    assert r["flesch_ease"] is None and r["fk_grade"] is None


def test_cohen_kappa_hand_computed(spark):
    """Textbook 2×2 table (20/5/10/15): po = 0.7, pe = 0.5, kappa = 0.4
    exactly; constant raters -> pe = 1 -> NULL kappa; NULL labels
    (abstentions) are excluded from N."""
    from es_ch_sync_spark.operators.analytics import cohen_kappa

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10
        + [("n", "n")] * 15 + [(None, "y")] * 3
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50 and r["n_agree"] == 35
    assert r["po"] == 0.7 and r["pe"] == 0.5 and r["kappa"] == 0.4

    const = spark.createDataFrame([("y", "y")] * 9, "a string, b string")
    rc = cohen_kappa(const, "a", "b").collect()[0]
    assert rc["po"] == 1.0 and rc["kappa"] is None  # pe = 1, undefined

    empty = spark.createDataFrame([], "a string, b string")
    assert cohen_kappa(empty, "a", "b").count() == 0


def test_dp_noisy_counts_seeded_and_exact_base(spark):
    """The seeded Laplace release is deterministic across runs, keeps the
    exact true_count column, and the noise magnitude is ln-bounded by the
    uniform's 1e-6 floor (|noise| <= ln(5e5)/eps)."""
    import math

    from es_ch_sync_spark.operators.sampling import dp_noisy_counts

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3, "g string"
    )
    r1 = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    r2 = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    assert r1["a"]["true_count"] == 7 and r1["b"]["true_count"] == 3
    for g in ("a", "b"):
        assert r1[g]["noisy_count"] == r2[g]["noisy_count"]  # seeded
        assert abs(r1[g]["noisy_count"] - r1[g]["true_count"]) <= math.log(5e5)
    # higher epsilon -> strictly smaller noise magnitude
    tight = {r["g"]: r for r in dp_noisy_counts(df, "g", epsilon=10.0).collect()}
    for g in ("a", "b"):
        assert abs(tight[g]["noisy_count"] - tight[g]["true_count"]) < abs(
            r1[g]["noisy_count"] - r1[g]["true_count"]
        ) + 1e-9


def test_classification_report_hand_computed(spark):
    """Hand confusion: 3 labels; 'c' is never predicted (precision NULL,
    recall 0), 'd' never occurs as truth (recall NULL); F1 is always
    2tp/(n_true+n_pred) — one exact-integer division; NULL-labeled rows
    excluded."""
    from es_ch_sync_spark.operators.analytics import classification_report

    rows = (
        [("a", "a")] * 3 + [("a", "b")] * 1   # a: tp=3, fn=1
        + [("b", "b")] * 2 + [("b", "d")] * 2 # b: tp=2, fn=2
        + [("c", "a")] * 1                    # c: never predicted
        + [(None, "a"), ("a", None)]          # abstentions excluded
    )
    df = spark.createDataFrame(rows, "t string, p string")
    got = {r["label"]: r for r in classification_report(df, "t", "p").collect()}
    assert set(got) == {"a", "b", "c", "d"}
    a = got["a"]
    assert (a["n_true"], a["n_pred"], a["tp"]) == (4, 4, 3)
    assert a["precision"] == 0.75 and a["recall"] == 0.75
    assert a["f1"] == 0.75
    b = got["b"]
    assert (b["n_true"], b["n_pred"], b["tp"]) == (4, 3, 2)
    assert b["precision"] == round(2 / 3, 6) and b["recall"] == 0.5
    assert b["f1"] == round(4 / 7, 6)
    c = got["c"]
    assert c["precision"] is None and c["recall"] == 0.0 and c["f1"] == 0.0
    d = got["d"]
    assert d["recall"] is None and d["precision"] == 0.0 and d["f1"] == 0.0


def test_expected_calibration_error_hand_computed(spark):
    """Hand bins: perfectly calibrated scores give ECE = MCE = 0; a
    planted miscalibrated bin contributes its exact |mean_pred −
    frac_pos| share; degenerate single-score input still emits one row."""
    from es_ch_sync_spark.operators.analytics import expected_calibration_error

    # bin 1 (p=0.15): 4 rows, 1 positive -> gap |0.15 - 0.25| = 0.1
    # bin 8 (p=0.85): 4 rows, 4 positives -> gap |0.85 - 1.0| = 0.15
    rows = [(0, 0.15)] * 3 + [(1, 0.15)] + [(1, 0.85)] * 4
    df = spark.createDataFrame(rows, "y int, p double")
    r = expected_calibration_error(df, "y", "p", n_bins=10).collect()[0]
    assert r["n"] == 8 and r["n_bins_used"] == 2
    assert r["ece"] == round((4 * 0.1 + 4 * 0.15) / 8, 6)
    assert r["mce"] == 0.15
    # perfectly calibrated: half positives at p = 0.5
    cal = spark.createDataFrame([(0, 0.5), (1, 0.5)], "y int, p double")
    r2 = expected_calibration_error(cal, "y", "p").collect()[0]
    assert r2["ece"] == 0.0 and r2["mce"] == 0.0


def test_winsorized_stats_whale_and_small_groups(spark):
    """A planted whale drags the raw mean but neither robust mean; a
    group too small to cut (n <= 2k) emits NULL robust means; the
    winsorized sum replaces exactly k values per side with the boundary
    values."""
    from es_ch_sync_spark.operators.analytics import winsorized_stats_ranktrim as winsorized_stats

    # group 'a': values 1..9 plus a 1000.0 whale -> n=10, k=1
    rows = [(i, "a", float(v)) for i, v in enumerate([*range(1, 10), 1000])]
    rows += [(100, "b", 5.0), (101, "b", 7.0)]  # n=2, k=0 -> ok (n > 0)
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r["event_type"]: r for r in winsorized_stats(
        df, "event_type", "value", "event_id"
    ).collect()}
    a = got["a"]
    assert a["n"] == 10 and a["n_cut_each"] == 1
    assert a["mean"] == round((45 + 1000) / 10, 6)
    assert a["trimmed_mean"] == round(sum(range(2, 10)) / 8, 6)  # drop 1, 1000
    # winsorize: 1 -> 2, 1000 -> 9
    assert a["winsorized_mean"] == round((sum(range(2, 10)) + 2 + 9) / 10, 6)
    b = got["b"]
    assert b["n_cut_each"] == 0  # nothing cut: robust means = raw mean
    assert b["trimmed_mean"] == b["winsorized_mean"] == b["mean"] == 6.0
    # degenerate: a 1-row group with 10% trim cuts nothing and stays exact
    one = spark.createDataFrame(
        [(0, "z", 3.5)], "event_id long, event_type string, value double"
    )
    z = winsorized_stats(one, "event_type", "value", "event_id").collect()[0]
    assert z["trimmed_mean"] == z["winsorized_mean"] == 3.5


def test_r12_ab_family_degenerate(spark):
    """Empty pools and one-arm pools: every r12 A/B operator emits zero
    rows or NULL statistics, never a division error."""
    from es_ch_sync_spark.operators.analytics import (
        ab_panel,
        brown_forsythe,
        effect_sizes_ab,
        kruskal_wallis,
        paired_permutation_test,
        wilcoxon_signed_rank,
    )

    empty = spark.createDataFrame([], "u long, arm string, value double")
    one_arm = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 3.0)], "u long, arm string, value double"
    )
    for df in (empty, one_arm):
        assert ab_panel(df, "arm", "value", "a", "b").count() == 0
        assert effect_sizes_ab(df, "arm", "value", "a", "b").count() == 0
        assert wilcoxon_signed_rank(df, "u", "arm", "value", "a", "b").count() == 0
        assert (
            paired_permutation_test(df, "u", "arm", "value", "a", "b").count()
            == 0
        )
    # kruskal/brown-forsythe run on k>=1 groups: one group must be
    # guarded, not crash
    r = kruskal_wallis(one_arm, "arm", "value").collect()[0]
    assert r["n_groups"] == 1 and r["df_h"] == 0
    assert brown_forsythe(one_arm, "arm", "value").count() == 0
    assert kruskal_wallis(empty, "arm", "value").count() == 0
    assert brown_forsythe(empty, "arm", "value").count() == 0


def test_r12_survival_and_series_degenerate(spark):
    """Empty/constant series: survival, trend, extremes, and strength
    operators emit empty or NULL readouts."""
    import datetime

    from es_ch_sync_spark.operators.analytics import (
        gumbel_block_maxima,
        jackknife_group_means,
        logrank_test,
        nelson_aalen,
        runs_test,
        seasonal_strength,
        theil_sen,
    )

    e_dur = spark.createDataFrame([], "grp int, dur long, e int")
    assert nelson_aalen(e_dur, "dur", "e").count() == 0
    # global-agg-on-empty emits ONE all-NULL-stat row (the mcnemar/fleiss
    # family posture — the oracle's aggregate does the same, so the
    # engines agree); the statistic itself is NULL, never a crash
    lr_empty = logrank_test(e_dur, "grp", "dur", "e").collect()
    assert len(lr_empty) == 1 and lr_empty[0]["chi2_logrank"] is None
    one_grp = spark.createDataFrame([(1, 3, 1), (1, 5, 1)], "grp int, dur long, e int")
    r = logrank_test(one_grp, "grp", "dur", "e").collect()[0]
    assert r["chi2_logrank"] is None  # no group-0 risk: V = 0
    base = datetime.date(2024, 1, 1)
    flat = spark.createDataFrame(
        [("a", base + datetime.timedelta(days=i), 5) for i in range(10)],
        "g string, day date, y long",
    )
    assert runs_test(flat, "g", "day", "y").count() == 0  # no nonzero moves
    one_day = spark.createDataFrame(
        [("a", base, 5)], "g string, day date, y long"
    )
    assert theil_sen(one_day, "g", "day", "y").count() == 0  # no pairs
    gb = gumbel_block_maxima(one_day, "g", "day", "y").collect()[0]
    assert gb["gumbel_beta"] is None  # single block
    assert seasonal_strength(one_day, "g").count() == 0  # no full window
    solo = spark.createDataFrame([], "g string, x double")
    assert jackknife_group_means(solo, "g", "x").count() == 0


def test_r12_misc_degenerate(spark):
    """Empty inputs through the sketch, clustering, MI, contrast, and
    gains operators."""
    from es_ch_sync_spark.operators.analytics import (
        cochran_q,
        cumulative_gains,
        grouped_mutual_information,
        nmi_vmeasure,
        pairwise_mean_contrasts,
    )
    from es_ch_sync_spark.operators.clustering import grid_density_clusters
    from es_ch_sync_spark.operators.graph import degree_powerlaw
    from es_ch_sync_spark.operators.sketches import ams_f2_sketch
    from es_ch_sync_spark.operators.text import kneser_ney_bigram

    assert (
        cochran_q(
            spark.createDataFrame([], "a boolean, b boolean"), "a", "b"
        ).collect()[0]["q_stat"]
        is None
    )
    e_lab = spark.createDataFrame([], "id long, label_a string")
    e_lab_b = spark.createDataFrame([], "id long, label_b string")
    # same global-agg posture: one row, every readout NULL
    nmi_empty = nmi_vmeasure(e_lab, e_lab_b, "id").collect()
    assert len(nmi_empty) == 1 and nmi_empty[0]["v_measure"] is None
    assert (
        grouped_mutual_information(
            spark.createDataFrame([], "g string, a boolean, b boolean"),
            "g", "a", "b",
        ).count()
        == 0
    )
    assert (
        pairwise_mean_contrasts(
            spark.createDataFrame([("a", 1.0)], "g string, x double"),
            "g", "x",
        ).count()
        == 0  # one arm: no pairs
    )
    assert (
        cumulative_gains(
            spark.createDataFrame([], "y int, p double"), "y", "p"
        ).count()
        == 0
    )
    assert (
        ams_f2_sketch(
            spark.createDataFrame([], "k string"), "k"
        ).count()
        == 0  # empty census: no median row survives the join
    )
    sparse = spark.createDataFrame(
        [(0.05, 0.05), (0.95, 0.95)], "x double, y double"
    )
    assert grid_density_clusters(sparse, "x", "y", min_pts=10).count() == 0
    assert (
        degree_powerlaw(
            spark.createDataFrame([], "src string, dst string")
        ).count()
        == 0
    )
    kn = kneser_ney_bigram(
        spark.createDataFrame([(1, "word")], "doc_id long, text string")
    ).collect()[0]
    assert kn["n_bigrams"] is None or kn["n_bigrams"] == 0 or kn["h_kn"] is None


def test_r13_cuped_sprt_degenerate(spark):
    """CUPED with an empty/one-arm unit table emits zero rows; zero
    covariate variance yields NULL theta and readouts (undefined, not a
    division error); SPRT on an empty stream emits zero rows."""
    import datetime

    from es_ch_sync_spark.operators.analytics import (
        cuped_adjusted_ab,
        sprt_conversion_daily,
    )

    empty = spark.createDataFrame([], "u long, arm string, x double, y double")
    one_arm = spark.createDataFrame(
        [(1, "A", 2.0, 1.0), (2, "A", 3.0, 2.0)],
        "u long, arm string, x double, y double",
    )
    assert cuped_adjusted_ab(empty, "arm", "x", "y", "A", "B").count() == 0
    assert cuped_adjusted_ab(one_arm, "arm", "x", "y", "A", "B").count() == 0
    # constant covariate: var(X) = 0 -> theta and every adjusted readout NULL
    const_x = spark.createDataFrame(
        [(1, "A", 5.0, 1.0), (2, "A", 5.0, 2.0),
         (3, "B", 5.0, 4.0), (4, "B", 5.0, 8.0)],
        "u long, arm string, x double, y double",
    )
    r = cuped_adjusted_ab(const_x, "arm", "x", "y", "A", "B").collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["theta"] is None and r["t_cuped"] is None
    assert r["adj_mean_a"] is None and r["var_reduction_rho2"] is None

    empty_ev = spark.createDataFrame([], "ts timestamp, event_type string")
    assert (
        sprt_conversion_daily(
            empty_ev, "ts", F.col("event_type") == "x", p0=0.2, p1=0.25
        ).count()
        == 0
    )
    # all-success single day: llr positive, decision well-formed
    d = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(d, "buy")] * 5, "ts timestamp, event_type string"
    )
    rows = sprt_conversion_daily(
        ev, "ts", F.col("event_type") == "buy", p0=0.2, p1=0.25
    ).collect()
    assert len(rows) == 1 and rows[0]["k_cum"] == 5
    assert rows[0]["decision"] in ("h0", "h1", "continue")


def test_r13_dedup_audit_panel_degenerate(spark):
    """The audit panel on an empty / identical-doc corpus: sections stay
    consistent (identical docs form one cluster; ARI/NMI readouts NULL
    on the single-cluster partitions, the standalone posture)."""
    from es_ch_sync_spark.operators.dedup import dedup_audit_panel

    empty = spark.createDataFrame([], "doc_id long, text string")
    # empty corpus: the calibration/cluster_sizes censuses vanish, but the
    # scalar ARI/NMI sections still emit their 5+7 stacked rows (a global
    # aggregate yields one row on empty input — the oracle's ungrouped
    # sums do the same) with NULL values throughout
    er = dedup_audit_panel(empty).collect()
    assert len(er) == 12
    assert {r["section"] for r in er} == {"ari", "nmi"}
    assert all(r["value"] is None for r in er)
    ident = spark.createDataFrame(
        [(i, "same words in every doc") for i in range(6)],
        "doc_id long, text string",
    )
    rows = {
        (r["section"], r["k1"], r["k2"], r["metric"]): r["value"]
        for r in dedup_audit_panel(ident).collect()
    }
    # 6 identical docs -> one cluster of size 6, 15 candidate pairs all
    # at jaccard 1.0 with all 8 signature components matching
    assert rows[("cluster_sizes", 6, None, "n_clusters")] == 1.0
    assert rows[("cluster_sizes", 6, None, "n_removable")] == 5.0
    assert rows[("calibration", 8, 9, "n_pairs")] == 15.0
    assert rows[("ari", None, None, "n_items")] == 6.0
    # both partitions are the single all-in-one cluster: agreement is
    # undefined (NULL), not 1 — the ARI/NMI degenerate contract
    assert rows[("ari", None, None, "ari")] is None
    assert rows[("nmi", None, None, "v_measure")] is None


def test_r13_stats_batch_degenerate(spark):
    """Empty/one-sided inputs for the r13 stats batch: zero rows or NULL
    readouts, never a division error."""
    import datetime

    from es_ch_sync_spark.operators.analytics import (
        cramer_von_mises_ab,
        diff_in_diff,
        hodges_lehmann_daily,
        ljung_box,
        mantel_haenszel,
        mix_jsd_daily,
    )

    d0 = datetime.date(2024, 1, 1)
    # ljung_box: empty and constant series
    empty_daily = spark.createDataFrame([], "g string, day date, y long")
    assert ljung_box(empty_daily, "g", "day", "y").count() == 0
    const = spark.createDataFrame(
        [("a", d0 + datetime.timedelta(days=i), 5) for i in range(10)],
        "g string, day date, y long",
    )
    # constant series: zero variance -> every acf NULL -> group drops out
    assert ljung_box(const, "g", "day", "y").count() == 0

    # mantel_haenszel: empty -> one all-NULL-moment row is avoided by the
    # N>1 stratum filter emitting zero input rows -> global agg emits one
    # row with n_strata 0 and NULL statistics
    ej = spark.createDataFrame([], "s string, e boolean, o boolean")
    r = mantel_haenszel(ej, "s", "e", "o").collect()[0]
    assert r["n_strata"] == 0 and r["or_mh"] is None and r["chi2_cmh"] is None
    # all-exposed stratum: b = c = 0 -> sbc = 0 -> OR undefined (NULL)
    allexp = spark.createDataFrame(
        [("s1", True, True), ("s1", True, False)] * 3,
        "s string, e boolean, o boolean",
    )
    r2 = mantel_haenszel(allexp, "s", "e", "o").collect()[0]
    assert r2["or_mh"] is None

    # cramer_von_mises: one-arm pool -> zero rows (MW contract)
    one_arm = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "arm string, value double"
    )
    assert cramer_von_mises_ab(one_arm, "arm", "value", "a", "b").count() == 0

    # hodges_lehmann: one side empty -> zero pairs -> zero rows
    daily_one = spark.createDataFrame(
        [("a", d0, 5)], "arm string, day date, y long"
    )
    assert (
        hodges_lehmann_daily(daily_one, "arm", "day", "y", "a", "b").count()
        == 0
    )

    # diff_in_diff: a missing cell voids the 4-cell cross join
    three_cells = spark.createDataFrame(
        [("A", False, 1.0), ("A", True, 2.0), ("B", False, 3.0)],
        "arm string, post boolean, value double",
    )
    assert diff_in_diff(
        three_cells, "arm", "post", "value", "A", "B"
    ).count() == 0
    # n=1 cells: row survives but SE/t are NULL
    four_single = spark.createDataFrame(
        [("A", False, 1.0), ("A", True, 2.0),
         ("B", False, 3.0), ("B", True, 7.0)],
        "arm string, post boolean, value double",
    )
    r3 = diff_in_diff(
        four_single, "arm", "post", "value", "A", "B"
    ).collect()[0]
    assert r3["did"] == 3.0 and r3["t_did"] is None

    # mix_jsd_daily: empty stream -> zero rows; single day -> NULL jsd
    empty_ev = spark.createDataFrame([], "ts timestamp, et string")
    assert mix_jsd_daily(empty_ev, "ts", "et").count() == 0
    one_day = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), "x")] * 4,
        "ts timestamp, et string",
    )
    rows = mix_jsd_daily(one_day, "ts", "et").collect()
    assert len(rows) == 1 and rows[0]["jsd_nats"] is None


def test_r13_batch3_degenerate(spark):
    """Friedman/Grubbs/Page-Hinkley/effective-rank degenerate inputs:
    empty or NULL readouts, never a division error."""
    import datetime

    from es_ch_sync_spark.operators.analytics import (
        friedman_daily,
        grubbs_daily,
        page_hinkley_daily,
    )
    from es_ch_sync_spark.operators.features import embedding_effective_rank

    d0 = datetime.date(2024, 1, 1)
    empty = spark.createDataFrame([], "b date, t string, y long")
    r = friedman_daily(empty, "b", "t", "y").collect()[0]
    assert r["n_blocks"] is None or r["chi2_f"] is None
    # one treatment: k = 1 -> chi2 NULL (df 0)
    one_t = spark.createDataFrame(
        [(d0 + datetime.timedelta(days=i), "a", 5 + i) for i in range(4)],
        "b date, t string, y long",
    )
    r1 = friedman_daily(one_t, "b", "t", "y").collect()[0]
    assert r1["k_treatments"] == 1 and r1["chi2_f"] is None

    # constant series: zero variance -> Grubbs G NULL; single day -> NULL
    const = spark.createDataFrame(
        [("a", d0 + datetime.timedelta(days=i), 5) for i in range(6)],
        "g string, day date, y long",
    )
    rg = grubbs_daily(const, "g", "day", "y").collect()[0]
    assert rg["g_stat"] is None
    single = spark.createDataFrame([("a", d0, 5)], "g string, day date, y long")
    assert grubbs_daily(single, "g", "day", "y").collect()[0]["g_stat"] is None

    # Page-Hinkley on a constant series: every term 0, no alarm
    rows = page_hinkley_daily(const, "g", "day", "y", lam=1.0).collect()
    assert all(r["ph_stat"] == 0.0 and not r["alarm"] for r in rows)

    # effective rank: a rank-one corpus reads PR = 1 exactly
    one_dir = spark.createDataFrame(
        [(i, [2.0] + [0.0] * 7) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    er = embedding_effective_rank(one_dir, dim=8).collect()[0]
    assert er["effective_rank"] == 1.0 and er["trace"] == 40.0
    emptye = spark.createDataFrame([], "vec_id long, embedding array<float>")
    er2 = embedding_effective_rank(emptye, dim=8).collect()[0]
    assert er2["effective_rank"] is None


def test_r13_phase2_degenerate(spark):
    """Centroid drift, Qini, and modularity degenerate inputs."""
    from es_ch_sync_spark.operators.analytics import qini_uplift_deciles
    from es_ch_sync_spark.operators.features import label_centroid_drift
    from es_ch_sync_spark.operators.graph import community_modularity

    # single-group corpus: its centroid IS the corpus centroid -> cos 1
    one = spark.createDataFrame(
        [(i, 7, [1.0, 2.0, 3.0, 4.0]) for i in range(5)],
        "vec_id long, label int, embedding array<float>",
    )
    r = label_centroid_drift(one, "label", dim=4).collect()[0]
    assert r["centroid_cos"] == 1.0 and r["n_vecs"] == 5
    # zero vectors: both norms 0 -> NULL, not a division error
    zeros = spark.createDataFrame(
        [(i, 1, [0.0, 0.0]) for i in range(3)],
        "vec_id long, label int, embedding array<float>",
    )
    assert label_centroid_drift(zeros, "label", dim=2).collect()[0][
        "centroid_cos"
    ] is None

    # qini: no control units at any depth -> qini NULL everywhere
    all_t = spark.createDataFrame(
        [(i, True, i % 2 == 0) for i in range(10)],
        "score long, treated boolean, converted boolean",
    )
    rows = qini_uplift_deciles(all_t, "score", "treated", "converted").collect()
    assert rows and all(r["qini"] is None for r in rows)
    empty = spark.createDataFrame(
        [], "score long, treated boolean, converted boolean"
    )
    assert (
        qini_uplift_deciles(empty, "score", "treated", "converted").count()
        == 0
    )

    # modularity: a single clique labeled as one community -> every edge
    # intra, Q = 1 - 1/1... for one community Q = e/m - (2m/(2m))^2 = 0
    edges = spark.createDataFrame(
        [(a, b) for a in "xyz" for b in "xyz" if a != b],
        "src string, dst string",
    )
    labels = spark.createDataFrame(
        [("x", "x"), ("y", "x"), ("z", "x")], "id string, label string"
    )
    rm = community_modularity(edges, labels).collect()[0]
    assert rm["n_communities"] == 1 and rm["intra_edges"] == rm["n_edges"]
    assert rm["modularity"] == 0.0
    # empty graph: one all-NULL row, never a division error
    eedges = spark.createDataFrame([], "src string, dst string")
    elabels = spark.createDataFrame([], "id string, label string")
    rme = community_modularity(eedges, elabels).collect()[0]
    assert rme["n_edges"] == 0 and rme["modularity"] is None


def test_r13_phase3_degenerate(spark):
    """temperature_mixture, split leakage inputs, and DeLong one-class
    degenerates."""
    from es_ch_sync_spark.operators.analytics import delong_auc_compare
    from es_ch_sync_spark.operators.sampling import (
        kcenter_coreset,
        temperature_mixture,
    )

    # single-source corpus: p = 1, epochs = 1 exactly
    one_src = spark.createDataFrame(
        [(i, "some words here", "s0") for i in range(4)],
        "doc_id long, text string, source string",
    )
    r = temperature_mixture(one_src, alpha=0.7).collect()[0]
    assert r["p_temperature"] == 1.0 and r["epochs_at_corpus_budget"] == 1.0
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert temperature_mixture(empty).count() == 0

    # alpha = 1 reproduces natural shares exactly on equal-length docs
    two = spark.createDataFrame(
        [(1, "a b c", "s0"), (2, "a b c", "s0"), (3, "a b c", "s1")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in temperature_mixture(two, alpha=1.0).collect()}
    assert rows["s0"]["p_temperature"] == rows["s0"]["natural_share"]

    # DeLong: one-class labels -> zero rows (m or n is 0)
    onec = spark.createDataFrame(
        [(i, i, True) for i in range(6)], "sa long, sb long, y boolean"
    )
    assert delong_auc_compare(onec, "sa", "sb", "y").count() == 0
    # identical scorers: auc_a == auc_b and var 0 -> z NULL
    import numpy as np

    rng = np.random.default_rng(7)
    same = spark.createDataFrame(
        [(int(v), int(v), bool(b)) for v, b in zip(rng.integers(0, 9, 20), rng.integers(0, 2, 20))],
        "sa long, sb long, y boolean",
    )
    rs = delong_auc_compare(same, "sa", "sb", "y").collect()
    if rs:
        assert rs[0]["auc_a"] == rs[0]["auc_b"] and rs[0]["z_delong"] is None

    # kcenter with k > n: selection stops at... k rows requested but only
    # n points exist — the argmax keeps returning md=0 duplicates of the
    # last distinct point; pin that it never crashes and emits k rows
    tiny = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = kcenter_coreset(tiny, k=4)
    assert out.count() == 4


def test_duplicate_span_census_degenerate_and_brute(spark):
    """r14: duplicate_span_census — degenerate corpora plus an exact
    hand-computed pin (two docs sharing one 6-token verbatim run, k=4:
    one maximal span per doc, 6 tokens each)."""
    from es_ch_sync_spark.operators.dedup import duplicate_span_census

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert duplicate_span_census(empty, k=4).count() == 0

    # single doc: no gram can repeat across docs (and none repeats within)
    one = _docs(spark, [(0, "alpha beta gamma delta epsilon zeta eta")])
    assert duplicate_span_census(one, k=4).count() == 0

    # identical docs: every doc is one full-length span
    ident = _docs(spark, [(i, "same words in every doc here") for i in range(5)])
    rows = duplicate_span_census(ident, k=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["span_tokens"] == 6 and r["n_spans"] == 5 and r["n_docs"] == 5
    assert r["dup_tokens"] == 30

    # brute-force pin: shared 6-token run embedded at different offsets,
    # k=4 → run of 3 duplicated grams → span of 3 + 4 - 1 = 6 tokens
    two = _docs(
        spark,
        [
            (1, "x1 x2 common run of six shared tokens y1"),
            (2, "z1 common run of six shared tokens z2 z3 z4"),
        ],
    )
    rows = duplicate_span_census(two, k=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["span_tokens"] == 6 and r["n_spans"] == 2 and r["n_docs"] == 2
    assert r["dup_tokens"] == 12
