"""Crawl change-detection (mtslake/freshness.py) unit tests."""

from datetime import datetime

import pytest

from mtslake.freshness import change_flags, change_rollup, change_stats

US = 1_000_000


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.utcfromtimestamp(t), x) for u, t, x in rows],
        "url string, warc_ts timestamp, text string",
    )


def test_change_flags_hand_case(spark):
    df = _pages(spark, [
        ("a", 0, "v1"),
        ("a", 900, "v1"),      # unchanged
        ("a", 1800, "v2"),     # changed
        ("a", 3600, "v2"),     # unchanged
        ("b", 0, "x"),         # single snapshot, anchor only
    ])
    got = {(r["url"], r["snap_rank"]): (r["changed"], r["gap_us"])
           for r in change_flags(df).collect()}
    assert got == {
        ("a", 1): (False, None),
        ("a", 2): (False, 900 * US),
        ("a", 3): (True, 900 * US),
        ("a", 4): (False, 1800 * US),
        ("b", 1): (False, None),
    }


def test_change_flags_duplicate_ts_deterministic(spark):
    """Colliding warc_ts (the datagen duplicate-ts fixture): the
    md5(text) tiebreak pins ONE order, so repeated runs agree."""
    df = _pages(spark, [
        ("a", 0, "m"), ("a", 900, "zz"), ("a", 900, "aa"), ("a", 1800, "zz"),
    ])
    runs = [tuple(
        (r["snap_rank"], r["text"], r["changed"])
        for r in sorted(change_flags(df).collect(),
                        key=lambda r: r["snap_rank"])
    ) for _ in range(2)]
    assert runs[0] == runs[1]
    # md5('aa') < md5('zz') decides rank 2 vs 3 deterministically
    import hashlib
    first = min("aa", "zz", key=lambda s: hashlib.md5(s.encode()).hexdigest())
    assert runs[0][1][1] == first
    # n_changes is order-dependent under ties but stable: 3 transitions
    # m->aa->zz->zz or m->zz->aa->zz
    n_changes = sum(1 for _, _, c in runs[0] if c)
    assert n_changes in (2, 3)


def test_change_stats_values(spark):
    df = _pages(spark, [
        ("a", 0, "v1"), ("a", 1000, "v2"), ("a", 3000, "v2"),
        ("a", 4000, "v3"),
        ("b", 0, "x"),
    ])
    got = {r["url"]: r for r in change_stats(df).collect()}
    a = got["a"]
    assert (a["n_snapshots"], a["n_changes"]) == (4, 2)
    assert a["span_us"] == 4000 * 1_000_000   # exact long, == sum of gaps
    assert got["b"]["span_us"] == 0
    assert a["change_ratio"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["mean_gap_s"] == pytest.approx(4000 / 3, abs=1e-6)
    assert a["est_change_interval_s"] == pytest.approx(2000.0, abs=1e-6)
    b = got["b"]
    assert (b["n_snapshots"], b["n_changes"]) == (1, 0)
    assert b["change_ratio"] is None
    assert b["mean_gap_s"] is None
    assert b["est_change_interval_s"] is None


def test_change_rollup_buckets(spark):
    df = _pages(spark, [
        ("a", 0, "v1"), ("a", 900, "v2"), ("a", 3600, "v2"),
        ("a", 4500, "v3"),
    ])
    got = {(r["url"], r["bucket_us"]): (r["n_snapshots"], r["n_changes"])
           for r in change_rollup(df, 3600 * US).collect()}
    assert got == {("a", 0): (2, 1), ("a", 3600 * US): (2, 1)}


# ---------------------------------------------------------------------------
# series.anomaly_flags (exact k-sigma integer algebra)
# ---------------------------------------------------------------------------

def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "url_prefix string, lang string, bucket_us long, cnt long")


def test_anomaly_flags_spike_and_warmup(spark):
    import numpy as np
    from mtslake.series import anomaly_flags

    # counts 100±small noise, one 10x spike, one dip
    base = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100]
    cnts = base * 3
    cnts[17] = 1000   # spike
    cnts[28] = 2      # dip (outside the spike's 8-bucket shadow, whose
                      # inflated variance legitimately masks deviations)
    rows = [("p", "en", i * 10, c) for i, c in enumerate(cnts)]
    out = anomaly_flags(_tier(spark, rows), tier_us=10, n_buckets=8,
                        k=3, min_points=5).collect()
    got = {r["bucket_us"] // 10: r for r in out}
    # warm-up: fewer than min_points baseline rows -> never flagged
    for i in range(5):
        assert not got[i]["is_anomaly"] and got[i]["base_n"] == i
    assert got[17]["is_anomaly"] and got[17]["direction"] == 1
    assert got[28]["is_anomaly"] and got[28]["direction"] == -1
    # spike does not poison its own baseline row, but inflates the
    # variance of the 8 FOLLOWING baselines; verify flags against an
    # independent numpy replay of the same strictly-preceding window
    for i, c in enumerate(cnts):
        win = np.array(cnts[max(0, i - 8):i], dtype=np.int64)
        n = len(win)
        exp = n >= 5 and (n * c - win.sum()) ** 2 > 9 * (
            n * (win ** 2).sum() - win.sum() ** 2)
        assert got[i]["is_anomaly"] == exp, i


def test_anomaly_flags_zero_variance_degenerate(spark):
    from mtslake.series import anomaly_flags

    rows = [("p", "en", i, 50) for i in range(10)] + [("p", "en", 10, 51)]
    out = {r["bucket_us"]: r for r in anomaly_flags(
        _tier(spark, rows), tier_us=1, n_buckets=10, k=3, min_points=3
    ).collect()}
    # sigma = 0: ANY deviation is infinitely many sigmas -> flagged
    assert out[10]["is_anomaly"] and out[10]["direction"] == 1
    assert not out[9]["is_anomaly"]
    assert out[9]["base_mean"] == 50.0


def test_anomaly_flags_sparse_holes_not_smoothed(spark):
    from mtslake.series import anomaly_flags

    # gap wider than the window: baseline resets (RANGE, not ROWS)
    rows = [("p", "en", i, 100) for i in range(8)] + [
        ("p", "en", 1000, 900)]
    out = {r["bucket_us"]: r for r in anomaly_flags(
        _tier(spark, rows), tier_us=1, n_buckets=8, k=3, min_points=3
    ).collect()}
    assert out[1000]["base_n"] == 0 and not out[1000]["is_anomaly"]


# ---------------------------------------------------------------------------
# urlops.extract_anchors / anchor_terms
# ---------------------------------------------------------------------------

def test_extract_anchors_and_terms(spark):
    from mtslake.urlops import anchor_terms, extract_anchors

    html = (b'<html><a href="http://b.com/x" class="z">Big Cats</a>'
            b'<a href="http://b.com/y">big dogs</a>'
            b'<a href="/rel">skipped host</a>'
            b'<a href="http://c.com/z"></a></html>')
    df = spark.createDataFrame(
        [("http://a.com/", bytearray(html))], "url string, html binary")
    got = sorted((r["link_pos"], r["link"], r["anchor"])
                 for r in extract_anchors(df).collect())
    assert got == [
        (0, "http://b.com/x", "Big Cats"),
        (1, "http://b.com/y", "big dogs"),
        (2, "/rel", "skipped host"),
        (3, "http://c.com/z", ""),
    ]
    terms = {(r["dst_host"], r["term"]): (r["cnt"], r["rank"])
             for r in anchor_terms(extract_anchors(df), k=2).collect()}
    # relative link dropped (no host), empty anchor dropped,
    # lowercased; rank ties break term-asc
    assert terms == {("b.com", "big"): (2, 1), ("b.com", "cats"): (1, 2)}


# ---------------------------------------------------------------------------
# series.counter_rate (Prometheus reset rule)
# ---------------------------------------------------------------------------

def test_counter_rate_reset_rule(spark):
    from mtslake.series import counter_rate

    rows = [
        ("a", 0, 10),          # dropped (no predecessor)
        ("a", 2_000_000, 70),   # +60 over 2s -> 30/s
        ("a", 4_000_000, 5),    # RESET: increase = 5, 2.5/s
        ("a", 9_000_000, 5),    # flat: 0/s
        ("b", 0, 100),
        ("b", 1_000_000, 100),  # flat counter, 0/s
    ]
    df = spark.createDataFrame(rows, "url string, ts_us long, counter long")
    got = {(r["url"], r["ts_us"]): (r["increase"], r["rate_per_s"])
           for r in counter_rate(df, value_col="counter").collect()}
    assert got == {
        ("a", 2_000_000): (60, 30.0),
        ("a", 4_000_000): (5, 2.5),
        ("a", 9_000_000): (0, 0.0),
        ("b", 1_000_000): (0, 0.0),
    }


def test_counter_rate_duplicate_ts_null_rate(spark):
    from mtslake.series import counter_rate

    df = spark.createDataFrame(
        [("a", 0, 1, 0), ("a", 5, 3, 1), ("a", 5, 9, 2)],
        "url string, ts_us long, counter long, seq long")
    got = sorted(
        ((r["ts_us"], r["counter"], r["increase"], r["rate_per_s"])
         for r in counter_rate(df, value_col="counter",
                               tiebreak="seq").collect()),
    )
    # zero time delta: increase still exact, rate null (try_divide);
    # +2 over 5 us = 400k/s
    assert got == [(5, 3, 2, 400000.0), (5, 9, 6, None)]


def test_ewma_smooth_recursion_and_keys(spark):
    """EWMA: y0=x0, yi=0.5*xi+0.5*y(i-1) per key, order by the order
    column regardless of input order; matches a scalar replay
    bit-for-bit; alpha=1 is the identity, alpha->0 clings to x0."""
    from mtslake.series import ewma_smooth

    rows = [("a", "en", 3, 8.0), ("a", "en", 1, 2.0), ("a", "en", 2, 4.0),
            ("b", "en", 1, 10.0), ("b", "en", 2, 0.0)]
    df = spark.createDataFrame(
        rows, "url_prefix string, lang string, bucket_us long, cnt double")
    got = {(r["url_prefix"], r["bucket_us"]): r["ewma"]
           for r in ewma_smooth(df, alpha=0.5, value_col="cnt").collect()}
    # scalar replay
    exp = {}
    for key in ("a", "b"):
        acc = None
        for b, x in sorted((r[2], r[3]) for r in rows if r[0] == key):
            acc = x if acc is None else 0.5 * x + 0.5 * acc
            exp[(key, b)] = acc
    assert got == exp
    assert got[("a", 3)] == 0.5 * 8.0 + 0.5 * (0.5 * 4.0 + 0.5 * 2.0)

    ident = {(r["url_prefix"], r["bucket_us"]): r["ewma"]
             for r in ewma_smooth(df, alpha=1.0, value_col="cnt").collect()}
    assert ident == {(r[0], r[2]): r[3] for r in rows}


def test_snapshot_drift_unigram_hand_case(spark):
    """Known token sets: drift is 1 - |∩|/|∪| of consecutive distinct
    token sets; first snapshot per url emits null pair columns."""
    from mtslake.freshness import snapshot_drift

    df = _pages(spark, [
        ("a", 0, "x y z"),
        ("a", 900, "x y q"),      # inter {x,y}=2, union {x,y,z,q}=4
        ("a", 1800, "x y q"),     # identical: 3/3
        ("b", 0, "solo"),
    ])
    got = {(r["url"], r["snap_rank"]):
           (r["n_shingles"], r["inter_sz"], r["union_sz"], r["drift"])
           for r in snapshot_drift(df, k=1).collect()}
    assert got == {
        ("a", 1): (3, None, None, None),
        ("a", 2): (3, 2, 4, 0.5),
        ("a", 3): (3, 3, 3, 0.0),
        ("b", 1): (1, None, None, None),
    }


def test_snapshot_drift_bigram_and_short_text(spark):
    """k=2 shingles: word ORDER matters (same bag, different order →
    positive drift); texts shorter than k shingle to the empty set."""
    from mtslake.freshness import snapshot_drift

    df = _pages(spark, [
        ("a", 0, "x y z"),        # bigrams {x y, y z}
        ("a", 900, "z y x"),      # bigrams {z y, y x}: disjoint
        ("c", 0, "one"),          # < k tokens -> empty set
        ("c", 900, "one"),
    ])
    got = {(r["url"], r["snap_rank"]):
           (r["n_shingles"], r["inter_sz"], r["union_sz"], r["drift"])
           for r in snapshot_drift(df, k=2).collect()}
    assert got[("a", 2)] == (2, 0, 4, 1.0)
    assert got[("c", 1)][0] == 0
    # empty-vs-empty union is 0 -> try_divide null -> null drift, not 0/0
    assert got[("c", 2)] == (0, 0, 0, None)


def test_drift_stats_pooled_sums(spark):
    """Pooled drift comes from the exact long sums, not a mean of
    per-pair ratios: two pairs (2/4, 3/3) pool to 1 - 5/7."""
    from mtslake.freshness import drift_stats

    df = _pages(spark, [
        ("a", 0, "x y z"),
        ("a", 900, "x y q"),
        ("a", 1800, "x y q"),
        ("b", 0, "solo"),
    ])
    got = {r["url"]: (r["n_pairs"], r["sum_inter"], r["sum_union"],
                      r["pooled_drift"])
           for r in drift_stats(df, k=1).collect()}
    assert got["a"] == (2, 5, 7, round(1 - 5 / 7, 6))
    assert got["b"] == (0, None, None, None)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "k string, value double")


def test_exact_quantiles_selection_rule(spark):
    """Discrete rule: smallest value whose cume_dist reaches q.
    [1,2,3,4]: cd = .25/.5/.75/1 -> p50=2 (the LOWER median), p90=4."""
    from mtslake.series import exact_quantiles

    df = _vals(spark, [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)])
    r = exact_quantiles(
        df, ["k"], "value", {"p25": 0.25, "p50": 0.5, "p90": 0.9}
    ).collect()[0]
    assert (r["n"], r["p25"], r["p50"], r["p90"]) == (4, 1.0, 2.0, 4.0)


def test_exact_quantiles_ties_and_nulls(spark):
    """Tied values share one cume_dist (count of rows <= v over n);
    NULLs are excluded from both n and the distribution."""
    from mtslake.series import exact_quantiles

    df = _vals(spark, [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 2.0), ("a", 9.0),
        ("a", None),
    ])
    # cd: 1->.2, 2->.8 (all three), 9->1.0
    r = exact_quantiles(
        df, ["k"], "value", {"p50": 0.5, "p85": 0.85, "p100": 1.0}
    ).collect()[0]
    assert (r["n"], r["p50"], r["p85"], r["p100"]) == (5, 2.0, 9.0, 9.0)


def test_exact_quantiles_rejects_bad_q(spark):
    from mtslake.series import exact_quantiles

    df = _vals(spark, [("a", 1.0)])
    with pytest.raises(ValueError):
        exact_quantiles(df, ["k"], "value", {"p0": 0.0})


def test_exact_quantiles_single_shuffle_plan(spark):
    """The cume_dist window and the groupBy share the partition key,
    so the whole operator costs ONE Exchange."""
    from mtslake.series import exact_quantiles

    df = _vals(spark, [("a", 1.0), ("b", 2.0)])
    plan = exact_quantiles(
        df, ["k"], "value", {"p50": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_approx_percentile_audited_against_exact(spark):
    """The 100-TB dashboard path (approx_percentile, mergeable sketch,
    map-side partials) must land within its rank-error bound of the
    exact discrete operator: with accuracy A the sketch's rank error
    is <= n/A, so at A >= n it must select within one position of the
    exact discrete quantile."""
    import pyspark.sql.functions as F_
    from mtslake.series import exact_quantiles

    rows = [("a", float((i * 37) % 101)) for i in range(101)]
    df = _vals(spark, rows)
    exact = exact_quantiles(
        df, ["k"], "value", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    ).collect()[0]
    approx = df.groupBy("k").agg(
        F_.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("ap")
    ).collect()[0]["ap"]
    ordered = sorted(v for _, v in rows)
    for got, want in zip(approx, (exact["p50"], exact["p90"], exact["p99"])):
        i, j = ordered.index(got), ordered.index(want)
        assert abs(i - j) <= 1, (got, want)


def test_corr_stats_matches_numpy(spark):
    """r equals numpy's corrcoef on a hand dataset; component sums are
    the exact decimals."""
    import numpy as np
    from mtslake.series import corr_stats

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 1.0, 4.0, 3.0, 6.0]
    df = spark.createDataFrame(
        [("a", x, y) for x, y in zip(xs, ys)],
        "k string, x double, y double",
    )
    [row] = corr_stats(df, ["k"], "x", "y").collect()
    assert row["n"] == 5
    assert float(row["sx"]) == sum(xs)
    assert float(row["sxy"]) == sum(x * y for x, y in zip(xs, ys))
    assert row["r"] == pytest.approx(np.corrcoef(xs, ys)[0, 1], abs=1e-12)


def test_corr_stats_merges_like_a_tier(spark):
    """The component sums are MERGEABLE: stats over two halves add to
    the stats over the whole — the property that lets correlation
    ride the rollup tier cascade."""
    from decimal import Decimal

    from mtslake.series import corr_stats

    rows = [("a", float(i), float(i * i % 7)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    half1 = spark.createDataFrame(rows[:5], "k string, x double, y double")
    half2 = spark.createDataFrame(rows[5:], "k string, x double, y double")
    [w] = corr_stats(df, ["k"], "x", "y").collect()
    [a] = corr_stats(half1, ["k"], "x", "y").collect()
    [b] = corr_stats(half2, ["k"], "x", "y").collect()
    for c in ("sx", "sy", "sxx", "syy", "sxy"):
        assert Decimal(str(a[c])) + Decimal(str(b[c])) == Decimal(str(w[c]))
    assert a["n"] + b["n"] == w["n"]


def test_corr_stats_null_pairs_and_degenerate(spark):
    """Pairwise-complete: rows with either channel NULL are excluded;
    a zero-variance key yields r NULL (try_divide), never a crash."""
    from mtslake.series import corr_stats

    df = spark.createDataFrame(
        [("a", 1.0, None), ("a", None, 2.0), ("a", 3.0, 4.0),
         ("b", 2.0, 1.0), ("b", 2.0, 5.0)],
        "k string, x double, y double",
    )
    got = {r["k"]: r for r in corr_stats(df, ["k"], "x", "y").collect()}
    assert got["a"]["n"] == 1          # only the complete pair
    assert got["b"]["r"] is None       # x variance 0 -> sqrt(0) divisor


def test_corr_stats_large_constant_channel_is_null_not_nan(spark):
    """Regression: for a LARGE constant channel the double-evaluated
    variance term n*sxx - sx^2 rounds slightly NEGATIVE (observed
    -65536.0 at n=28, x~8.6e8), so sqrt() leaked r = NaN — which
    passes isNotNull() and poisons downstream sorts. Degeneracy is
    now detected exactly (min==max on the quantized decimals)."""
    import math
    from mtslake.series import corr_stats

    x0 = 855225580.1932975
    rows = [("k", x0, float((i * 7) % 13)) for i in range(28)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    [row] = corr_stats(df, ["k"], "x", "y").collect()
    assert row["r"] is None
    # and never NaN on the near-degenerate flipped orientation either
    [row2] = corr_stats(df, ["k"], "y", "x").collect()
    assert row2["r"] is None or not math.isnan(row2["r"])


def test_ohlc_selection_and_duplicate_ts(spark):
    """open/close pick first/last by ts with the (ts, value) struct
    tiebreak: at a duplicated opening instant the SMALLER value opens;
    at a duplicated closing instant the LARGER value closes."""
    from mtslake.series import ohlc

    df = spark.createDataFrame(
        [("a", 10, 5.0), ("a", 10, 3.0),     # open tie -> 3.0
         ("a", 50, 1.0),
         ("a", 90, 7.0), ("a", 90, 9.0),     # close tie -> 9.0
         ("b", 5, 2.0)],
        "k string, ts_us long, value double",
    )
    got = {r["k"]: (r["n"], r["open"], r["high"], r["low"], r["close"])
           for r in ohlc(df, ["k"]).collect()}
    assert got["a"] == (5, 3.0, 9.0, 1.0, 9.0)
    assert got["b"] == (1, 2.0, 2.0, 2.0, 2.0)


def test_ohlc_nulls_excluded_and_partial_agg(spark):
    """NULL values never reach the ordering struct; the aggregation is
    map-side partial (struct min/max combine like any min/max)."""
    from mtslake.series import ohlc

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 4.0), ("a", 3, None)],
        "k string, ts_us long, value double",
    )
    [row] = ohlc(df, ["k"]).collect()
    assert (row["n"], row["open"], row["close"]) == (1, 4.0, 4.0)
    # struct min/max is not hash-aggregable, so Spark plans
    # SortAggregate — but still with a map-side partial phase and a
    # single exchange
    plan = ohlc(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "partial_min(struct" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_refresh_change_stats_equals_full_rebuild(spark, tmp_path):
    """Incremental refresh after a snapshot batch must equal a full
    rebuild EXACTLY, while rewriting only the touched hash buckets
    (untouched bucket directories keep their files byte-for-byte)."""
    import os

    from mtslake.freshness import (change_stats, refresh_change_stats,
                                   write_change_stats)

    p1 = _pages(spark, [
        (f"u{i}", 100 * i + j, f"doc {i} v{j // 2}")
        for i in range(30) for j in range(4)
    ])
    stats_path = str(tmp_path / "stats")
    write_change_stats(p1, stats_path, n_buckets=8)

    # batch touches 3 urls: two with new versions, one brand-new
    batch = _pages(spark, [
        ("u3", 1000, "doc 3 v9"), ("u7", 1001, "doc 7 v9"),
        ("brand-new", 5, "hello"),
    ])
    all_pages = p1.unionByName(batch)

    before = {}
    for d in os.listdir(stats_path):
        if d.startswith("_bkt="):
            full = os.path.join(stats_path, d)
            before[d] = sorted(
                (f, os.path.getmtime(os.path.join(full, f)))
                for f in os.listdir(full) if f.endswith(".parquet")
            )

    info = refresh_change_stats(spark, all_pages, batch, stats_path,
                                n_buckets=8)
    assert info["touched_urls"] == 3

    got = {r["url"]: (r["n_snapshots"], r["n_changes"])
           for r in spark.read.parquet(stats_path).collect()}
    want = {r["url"]: (r["n_snapshots"], r["n_changes"])
            for r in change_stats(all_pages).collect()}
    assert got == want

    from mtslake.freshness import _stat_bucket
    from pyspark.sql import functions as F_
    touched_bkts = {
        r[0] for r in batch.select(_stat_bucket("url", 8)).distinct()
        .collect()
    }
    for d, files in before.items():
        bkt = int(d.split("=")[1])
        if bkt not in touched_bkts:
            full = os.path.join(stats_path, d)
            after = sorted(
                (f, os.path.getmtime(os.path.join(full, f)))
                for f in os.listdir(full) if f.endswith(".parquet")
            )
            assert after == files, f"untouched bucket {d} was rewritten"


def test_topk_with_other_conserves_totals(spark):
    """Per bucket: top rows + __other__ row sum to the exact event
    count; __other__ folds exactly the non-top keys."""
    from mtslake.series import topk_with_other

    rows = []
    for i, n in enumerate([10, 8, 5, 3, 2, 1]):  # 6 keys, one bucket
        rows += [(f"k{i}", 0)] * n
    rows += [("solo", 86_400_000_000)]           # second bucket: 1 key
    df = spark.createDataFrame(rows, "url string, ts_us long")
    out = topk_with_other(df, 86_400_000_000, k=2)
    got = {(r["bucket_us"], r["key"]): (r["cnt"], r["rank"], r["n_keys"])
           for r in out.collect()}
    assert got[(0, "k0")] == (10, 1, 1)
    assert got[(0, "k1")] == (8, 2, 1)
    assert got[(0, "__other__")] == (5 + 3 + 2 + 1, 3, 4)
    # bucket with fewer keys than k: no __other__ row
    assert got[(86_400_000_000, "solo")] == (1, 1, 1)
    assert (86_400_000_000, "__other__") not in got
    # conservation
    tot = {b: sum(c for (bb, _), (c, _, _) in got.items() if bb == b)
           for b in (0, 86_400_000_000)}
    assert tot == {0: 29, 86_400_000_000: 1}


def test_counter_resets_hand_case(spark):
    """Resets detected by counter < prev, attributed to the bucket of
    the first post-reset sample; n_deltas counts pairs per bucket."""
    from mtslake.series import counter_resets

    H = 3_600_000_000
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", H // 2, 20.0),      # growth
         ("a", H + 1, 3.0),                        # reset, bucket 1
         ("a", H + 2, 8.0),                        # growth
         ("a", 2 * H, 1.0),                        # reset, bucket 2
         ("b", 0, 5.0)],                           # single sample: no pair
        "url string, ts_us long, value double",
    )
    got = {(r["url"], r["bucket_us"] // H): (r["n_resets"], r["n_deltas"])
           for r in counter_resets(df, H).collect()}
    assert got == {
        ("a", 0): (0, 1),
        ("a", 1): (1, 2),
        ("a", 2): (1, 1),
    }


def test_holt_smooth_matches_reference_recursion(spark):
    """Engine output equals a direct Python fold of Holt's equations;
    forecast is the PRIOR (level + trend); alpha=1, beta=0 degenerates
    to identity level with zero trend."""
    from mtslake.series import holt_smooth

    vals = [10.0, 12.0, 15.0, 11.0, 20.0, 22.0]
    df = spark.createDataFrame(
        [("p", "en", i, int(v)) for i, v in enumerate(vals)],
        "url_prefix string, lang string, bucket_us long, cnt long",
    )
    got = sorted(
        (r["bucket_us"], r["level"], r["trend"], r["forecast"])
        for r in holt_smooth(df, alpha=0.5, beta=0.5).collect()
    )
    lev, tr = vals[0], 0.0
    for i, x in enumerate(vals):
        if i == 0:
            assert got[i][1:] == (lev, tr, None)
            continue
        fc = lev + tr
        new_lev = 0.5 * x + 0.5 * (lev + tr)
        tr = 0.5 * (new_lev - lev) + 0.5 * tr
        lev = new_lev
        assert got[i][1:] == (lev, tr, fc), i

    ident = holt_smooth(df, alpha=1.0, beta=0.0).collect()
    assert all(r["level"] == float(r["cnt"]) and r["trend"] == 0.0
               for r in ident)


def test_regr_components_matches_numpy(spark):
    """slope/intercept equal numpy's polyfit on a hand dataset;
    component sums are the exact integers/decimals; degenerate
    (single-instant) keys yield NULL slope."""
    import numpy as np
    from mtslake.series import regr_components

    ts = [0, 10, 20, 30, 40]
    ys = [1.0, 3.0, 2.0, 5.0, 4.0]
    rows = [("a", t, y) for t, y in zip(ts, ys)] + [
        ("b", 7, 1.0), ("b", 7, 9.0)]          # all at one instant
    df = spark.createDataFrame(rows, "k string, ts_us long, value double")
    got = {r["k"]: r for r in
           regr_components(df, ["k"], "ts_us", "value").collect()}
    a = got["a"]
    assert a["n"] == 5 and float(a["st"]) == sum(ts)
    assert float(a["sty"]) == sum(t * y for t, y in zip(ts, ys))
    m, c = np.polyfit(ts, ys, 1)
    assert a["slope"] == pytest.approx(m, rel=1e-12)
    assert a["intercept"] == pytest.approx(c, rel=1e-12)
    assert got["b"]["slope"] is None           # zero time variance


def test_regr_components_merge_across_halves(spark):
    """Components are mergeable: sums over two halves add to the
    whole — the tier-cascade property shared with corr_stats."""
    from decimal import Decimal
    from mtslake.series import regr_components

    rows = [("a", i * 3, float((i * 7) % 11)) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, ts_us long, value double")
    h1 = spark.createDataFrame(rows[:6], "k string, ts_us long, value double")
    h2 = spark.createDataFrame(rows[6:], "k string, ts_us long, value double")
    [w] = regr_components(df, ["k"], "ts_us", "value").collect()
    [x] = regr_components(h1, ["k"], "ts_us", "value").collect()
    [y] = regr_components(h2, ["k"], "ts_us", "value").collect()
    for c in ("st", "sy", "stt", "sty"):
        assert Decimal(str(x[c])) + Decimal(str(y[c])) == Decimal(str(w[c]))


def test_regr_components_large_single_instant_is_null(spark):
    """Regression: with every observation at one LARGE t offset the
    double-evaluated denominator n*stt - st^2 rounds to a small
    NONZERO (observed 2^31 at n=41, t~8.4e10), so try_divide emitted
    a bogus slope (up to ~1.5e-5, or IEEE -0.0 — the oracle-hash
    hazard) instead of the documented NULL. Degeneracy is now
    detected exactly (min==max on the decimal offsets)."""
    from mtslake.series import regr_components

    t0 = 83_924_131_519
    rows = [("k", t0, float((i * 5) % 9)) for i in range(41)]
    df = spark.createDataFrame(rows, "k string, ts_us long, value double")
    [row] = regr_components(df, ["k"], "ts_us", "value").collect()
    assert row["slope"] is None
    assert row["intercept"] is None


def test_divide_sensitive_ops_survive_ansi_mode(spark):
    """Spark 4 environments may run ANSI-on, where a bare divide-by-
    zero hard-fails the job: every ratio-emitting operator here uses
    try_divide (or guards), so the suite's semantics must hold under
    BOTH modes. Exercise the divide paths with adversarial inputs
    under ansi.enabled=true."""
    from mtslake.sessions import uptime
    from mtslake.series import corr_stats, exact_quantiles, rate

    prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        dup = spark.createDataFrame(
            [("a", 5, 1.0), ("a", 5, 2.0)],   # zero time delta
            "url string, ts_us long, value double",
        )
        rows = rate(dup, tiebreak="value").collect()
        assert len(rows) == 1 and rows[0]["rate"] is None
        zv = spark.createDataFrame(
            [("k", 1.0, 2.0), ("k", 1.0, 3.0)],  # zero x variance
            "k string, x double, y double",
        )
        assert corr_stats(zv, ["k"], "x", "y").collect()[0]["r"] is None
        one = spark.createDataFrame([("a", 0)], "url string, ts_us long")
        [r] = uptime(one, 60, "1h").collect()
        assert r["uptime_us"] == 60
        [qr] = exact_quantiles(
            spark.createDataFrame([("a", 1.0)], "k string, value double"),
            ["k"], "value", {"p50": 0.5},
        ).collect()
        assert qr["p50"] == 1.0
    finally:
        # restore the session's PRIOR mode, not a hardcoded one:
        # pinning "false" here flipped the shared session's default
        # (Spark 4 runs ANSI-on) for every later test — which is how
        # the legacy sizeOfNull divergence in snapshot_drift was found
        spark.conf.set("spark.sql.ansi.enabled", prior)


def _mk_tier(spark, xs, key="a"):
    H = 3_600_000_000
    return spark.createDataFrame(
        [(key, "en", i * H, int(x)) for i, x in enumerate(xs)],
        "url_prefix string, lang string, bucket_us long, cnt long",
    )


def test_cusum_matches_reference_recursion(spark):
    """The window-algebra closed form (G_t − running min) must equal
    N·(classic Page recursion S_t = max(0, S_{t-1} + (x_t − μ)))."""
    from mtslake.series import cusum_flags

    xs = [10, 11, 9, 10, 30, 31, 29, 32, 30, 31]  # level shift at t=4
    out = (
        cusum_flags(_mk_tier(spark, xs), h_mult=1, min_points=2)
        .orderBy("bucket_us")
        .collect()
    )
    n, mean = len(xs), sum(xs) / len(xs)
    s = 0.0
    for i, r in enumerate(out):
        s = max(0.0, s + (xs[i] - mean))
        assert int(r["cusum_pos"]) == round(n * s), f"t={i}"
    # the shift is flagged only after enough excess accumulates, and
    # the alarm stays up once the regime persists
    assert not out[0]["shift_up"] and out[-1]["shift_up"]


def test_cusum_stationary_and_downshift(spark):
    from mtslake.series import cusum_flags

    flat = cusum_flags(_mk_tier(spark, [5] * 8), h_mult=1, min_points=2)
    rows = flat.collect()
    assert all(int(r["cusum_pos"]) == 0 and int(r["cusum_neg"]) == 0
               for r in rows)
    assert not any(r["shift_up"] or r["shift_down"] for r in rows)
    down = cusum_flags(
        _mk_tier(spark, [30, 31, 29, 30, 5, 6, 4, 5, 6, 5]),
        h_mult=1, min_points=2,
    ).orderBy("bucket_us").collect()
    assert down[-1]["shift_down"] and not down[-1]["shift_up"]
    assert not down[0]["shift_down"]


def test_acf_stats_matches_numpy_and_skips_holes(spark):
    import numpy as np

    from mtslake.series import acf_stats

    H = 3_600_000_000
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [("a", "en", i * H, x) for i, x in enumerate(xs)]
    del rows[7]  # hole: bucket 7 missing -> pairs (6,7) and (7,8) drop
    tier = spark.createDataFrame(
        rows, "url_prefix string, lang string, bucket_us long, cnt long"
    )
    [r] = acf_stats(tier, H, lag=1).collect()
    pairs = [
        (xs[i], xs[i + 1])
        for i in range(len(xs) - 1)
        if i != 7 and i + 1 != 7
    ]
    assert r["n"] == len(pairs)
    x = np.array([p[0] for p in pairs], dtype=float)
    y = np.array([p[1] for p in pairs], dtype=float)
    assert abs(r["r"] - np.corrcoef(x, y)[0, 1]) < 1e-12
    assert float(r["sx"]) == x.sum() and float(r["sxy"]) == (x * y).sum()


def test_mad_flags_hand_case_and_masking(spark):
    from mtslake.series import mad_flags

    # one gross outlier in a noisy baseline: MAD flags it alone
    xs = [10, 12, 8, 11, 9, 13, 7, 10, 11, 1000]
    out = (
        mad_flags(_mk_tier(spark, xs), k=5, min_points=5)
        .orderBy("bucket_us")
        .collect()
    )
    # discrete selection: med = 10 (cd 0.5), mad = 1 (5 of 10 devs <= 1)
    assert out[0]["med"] == 10 and out[0]["mad"] == 1
    assert out[-1]["is_outlier"] and out[-1]["direction"] == 1
    assert sum(r["is_outlier"] for r in out) == 1
    # degenerate mad = 0 (over half the buckets AT the median): any
    # deviating bucket flags — the documented anomaly_flags sigma=0
    # analogue
    deg = mad_flags(
        _mk_tier(spark, [5, 5, 5, 5, 5, 5, 7]), k=5, min_points=5
    ).orderBy("bucket_us").collect()
    assert deg[-1]["mad"] == 0 and deg[-1]["is_outlier"]
    assert sum(r["is_outlier"] for r in deg) == 1


def test_lm_bigram_hand_case(spark):
    from mtslake.textops import lm_coverage_score, train_bigram_lm
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),        # train
            (2, "the cat ran"),        # train
            (3, "the dog sat"),        # train
            (4, "the cat sat"),        # held out: all pairs known
            (5, "a zebra"),            # held out: OOV bigram
            (6, "word"),               # single token: no pairs
        ],
        "doc_id long, text string",
    )
    lm = train_bigram_lm(docs, train_filter=F.col("doc_id") <= 3)
    model = {r["bigram"]: (r["c_bigram"], r["c_head"]) for r in lm.collect()}
    # hand counts over docs 1-3
    assert model["the cat"] == (2, 3)   # 'the' heads 3 bigrams
    assert model["cat sat"] == (1, 2)   # 'cat' heads 2
    assert model["dog sat"] == (1, 1)
    sc = {r["doc_id"]: r for r in lm_coverage_score(docs, lm).collect()}
    assert sc[4]["n_pairs"] == 2 and sc[4]["n_hits"] == 2
    assert sc[4]["sum_c_bigram"] == 2 + 1 and sc[4]["sum_c_head"] == 3 + 2
    assert sc[5]["n_pairs"] == 1 and sc[5]["n_hits"] == 0
    assert sc[5]["sum_c_bigram"] == 0 and sc[5]["ll_score"] is None
    assert sc[6]["n_pairs"] == 0 and sc[6]["n_hits"] == 0
    import math
    want = math.log(2 / 3) + math.log(1 / 2)
    assert abs(sc[4]["ll_score"] - want) < 1e-12


def test_value_changes_hand_case(spark):
    """changes() attribution: a flap counts at the LATER observation's
    bucket; first observation counts 0; nulls excluded; cross-bucket
    changes attribute to the new bucket."""
    from mtslake.series import value_changes

    H = 100
    rows = [
        ("a", 10, 1.0), ("a", 20, 1.0),    # no change
        ("a", 30, 2.0),                     # change in bucket 0
        ("a", 110, 1.0),                    # change in bucket 1 (later obs)
        ("a", 120, None),                   # excluded
        ("a", 130, 1.0),                    # vs 110 -> no change
        ("b", 50, 9.9),                     # single obs: 0 changes
    ]
    df = spark.createDataFrame(rows, "url string, ts_us long, value double")
    got = {(r["url"], r["bucket_us"]): (r["n_obs"], r["n_changes"])
           for r in value_changes(df, H).collect()}
    assert got == {
        ("a", 0): (3, 1),
        ("a", 100): (2, 1),
        ("b", 0): (1, 0),
    }
