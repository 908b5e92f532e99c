"""As-of join vs a hand-computed and a pandas merge_asof oracle."""

import pandas as pd
from pyspark.sql import functions as F

from mtslake.asof import asof_join


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 35), ("b", 5), ("b", 50)],
        "url string, ts_us long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 30, 2.0), ("b", 40, 3.0)],
        "url string, ts_us long, px double",
    )
    out = {
        (r["url"], r["ts_us"]): (r["px_r"], r["ts_us_r"])
        for r in asof_join(left, right).collect()
    }
    assert out == {
        ("a", 10): (1.0, 10),   # equal ts counts ('at or before')
        ("a", 20): (1.0, 10),
        ("a", 35): (2.0, 30),
        ("b", 5): (None, None),  # nothing before -> null
        ("b", 50): (3.0, 40),
    }


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([("a", 100)], "url string, ts_us long")
    right = spark.createDataFrame(
        [("a", 10, 7.0)], "url string, ts_us long, px double"
    )
    out = asof_join(left, right, tolerance_us=50).collect()[0]
    assert out["px_r"] is None  # match is 90us stale > 50us tolerance
    out2 = asof_join(left, right, tolerance_us=1000).collect()[0]
    assert out2["px_r"] == 7.0


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    lts = np.sort(rng.integers(0, 10_000, 300))
    rts = np.sort(rng.integers(0, 10_000, 100))
    lpdf = pd.DataFrame({"url": "k", "ts_us": lts})
    rpdf = pd.DataFrame({"url": "k", "ts_us": rts,
                         "px": rng.normal(size=len(rts))})
    # pandas merge_asof with duplicate left keys is fine; ensure unique
    # right ts to keep the oracle deterministic
    rpdf = rpdf.drop_duplicates("ts_us")
    exp = pd.merge_asof(lpdf, rpdf, on="ts_us", by="url", direction="backward")
    got = (
        asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf))
        .orderBy("ts_us")
        .toPandas()
    )
    # compare px sequences (NaN == NaN)
    import numpy.testing as npt

    npt.assert_array_equal(
        exp["px"].to_numpy(), got["px_r"].to_numpy(dtype=float)
    )


def test_asof_join_randomized_vs_merge_asof(spark):
    """Seeded randomized oracle: many keys, duplicate timestamps on the
    left, irregular right-side gaps — must match pandas.merge_asof
    (direction='backward', allow_exact_matches=True) per key."""
    import numpy as np

    rng = np.random.default_rng(7)
    lrows, rrows = [], []
    for k in range(20):
        key = f"k{k}"
        lts = np.sort(rng.integers(0, 10_000, rng.integers(5, 60)))
        if len(lts) > 3:  # force duplicate left timestamps
            lts[1] = lts[2]
        rts = np.sort(
            rng.choice(np.arange(0, 10_000), rng.integers(0, 20),
                       replace=False)
        )
        lrows += [(key, int(t)) for t in lts]
        rrows += [(key, int(t), float(t) * 0.5 + k) for t in rts]
    left = spark.createDataFrame(lrows, "url string, ts_us long")
    right = spark.createDataFrame(rrows, "url string, ts_us long, px double")

    got = asof_join(left, right).toPandas()

    lp = pd.DataFrame(lrows, columns=["url", "ts_us"]).sort_values(
        ["ts_us", "url"], kind="mergesort", ignore_index=True)
    rp = pd.DataFrame(rrows, columns=["url", "ts_us", "px"]).sort_values(
        ["ts_us", "url"], kind="mergesort", ignore_index=True)
    exp = pd.merge_asof(
        lp, rp, on="ts_us", by="url", direction="backward",
        allow_exact_matches=True, suffixes=("", "_r"),
    )

    def canon(df, pxcol):
        return sorted(
            (r["url"], int(r["ts_us"]),
             None if pd.isna(r[pxcol]) else float(r[pxcol]))
            for _, r in df.iterrows()
        )

    assert canon(got, "px_r") == canon(exp, "px")


def test_asof_forward_and_nearest_hand_case(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 35), ("b", 5), ("b", 50)],
        "url string, ts_us long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 30, 2.0), ("b", 40, 3.0)],
        "url string, ts_us long, px double",
    )
    fwd = {
        (r["url"], r["ts_us"]): (r["px_r"], r["ts_us_r"])
        for r in asof_join(left, right, direction="forward").collect()
    }
    assert fwd == {
        ("a", 10): (1.0, 10),     # equal ts counts ('at or after')
        ("a", 20): (2.0, 30),
        ("a", 35): (None, None),  # nothing after -> null
        ("b", 5): (3.0, 40),
        ("b", 50): (None, None),
    }
    near = {
        (r["url"], r["ts_us"]): (r["px_r"], r["ts_us_r"])
        for r in asof_join(left, right, direction="nearest").collect()
    }
    assert near == {
        ("a", 10): (1.0, 10),
        ("a", 20): (1.0, 10),     # tie |20-10| == |20-30| -> backward
        ("a", 35): (2.0, 30),
        ("b", 5): (3.0, 40),
        ("b", 50): (3.0, 40),
    }


def test_asof_directions_match_pandas(spark):
    """Randomized cross-check of all three directions (and tolerance)
    against pandas.merge_asof; timestamps are made tie-free so the
    nearest comparison is engine-independent."""
    import random

    rng = random.Random(77)
    lts = sorted(rng.sample(range(0, 20000, 2), 120))     # even ts
    rts = sorted(rng.sample(range(1, 20001, 2), 60))      # odd ts
    left = spark.createDataFrame([("k", t) for t in lts],
                                 "url string, ts_us long")
    right = spark.createDataFrame([("k", t, float(t % 97)) for t in rts],
                                  "url string, ts_us long, px double")
    lpd = pd.DataFrame({"url": "k", "ts_us": lts})
    rpd = pd.DataFrame({"url": "k", "ts_us": rts,
                        "px": [float(t % 97) for t in rts]})
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 500):
            got = {
                r["ts_us"]: r["px_r"]
                for r in asof_join(left, right, direction=direction,
                                   tolerance_us=tol).collect()
            }
            want_df = pd.merge_asof(
                lpd, rpd, on="ts_us", by="url", direction=direction,
                tolerance=tol,
            )
            want = {
                int(t): (None if pd.isna(p) else float(p))
                for t, p in zip(want_df["ts_us"], want_df["px"])
            }
            assert got == want, (direction, tol)


def test_interval_join_equals_naive_range_join(spark):
    """Bucketed range join == naive key-join + range filter, on a
    randomized fixture with multi-bucket intervals, boundary events
    (ts == start kept, ts == end dropped), zero-length intervals, and
    overlapping intervals per key (pair multiplicity must match)."""
    import random

    from mtslake.asof import interval_join

    rng = random.Random(7)
    B = 100
    evs = [(f"k{rng.randrange(4)}", rng.randrange(0, 3000))
           for _ in range(300)]
    ivs = []
    for _ in range(40):
        s = rng.randrange(0, 2900)
        ivs.append((f"k{rng.randrange(4)}", s,
                    s + rng.choice([0, 1, 37, 250, 900])))
    # explicit boundary probes
    evs += [("kb", 500), ("kb", 700)]
    ivs += [("kb", 500, 700)]
    ev = spark.createDataFrame(evs, "url string, ts_us long")
    iv = spark.createDataFrame(ivs, "url string, start_us long, end_us long")
    got = sorted(
        tuple(r) for r in interval_join(ev, iv, bucket_us=B).collect()
    )
    exp = sorted(
        tuple(r)
        for r in ev.join(iv, on="url")
        .where((F.col("ts_us") >= F.col("start_us"))
               & (F.col("ts_us") < F.col("end_us")))
        .select("url", "ts_us", "start_us", "end_us")
        .collect()
    )
    # same multiset of pairs (exactly-once per qualifying pair)
    g2 = sorted((r[0], r[1], r[2], r[3]) for r in got)
    assert g2 == exp
    assert (("kb", 500, 500, 700) in g2) and ("kb", 700, 500, 700) not in g2


def test_interval_join_is_equi_join_on_bucket(spark):
    """The physical plan must join on (key, bucket) — hash or
    sort-merge equi-join, never BroadcastNestedLoop/cartesian."""
    from mtslake.asof import interval_join

    ev = spark.createDataFrame([("a", 5)], "url string, ts_us long")
    iv = spark.createDataFrame(
        [("a", 0, 10)], "url string, start_us long, end_us long")
    plan = interval_join(ev, iv, bucket_us=10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_asof_join_duplicate_right_ts_is_deterministic(spark):
    """Regression: duplicate right rows at one (key, ts) had no
    tiebreak in the fill window, so the joined payload depended on the
    physical partition layout (different value after a repartition).
    Ties now break on the right payload columns — the GREATEST payload
    row wins in every direction, stable across layouts."""
    from mtslake.asof import asof_join

    left = spark.createDataFrame(
        [("u", 150)], "url string, ts_us long")
    right_rows = [("u", 100, 1.0), ("u", 100, 2.0)]
    for nparts in (1, 3, 7):
        right = spark.createDataFrame(
            right_rows, "url string, ts_us long, value double"
        ).repartition(nparts)
        for direction in ("backward", "nearest"):
            [row] = asof_join(left, right, key="url", ts="ts_us",
                              direction=direction).collect()
            assert row["value_r"] == 2.0, (nparts, direction)
        fwd_right = spark.createDataFrame(
            [("u", 200, 3.0), ("u", 200, 4.0)],
            "url string, ts_us long, value double").repartition(nparts)
        [row] = asof_join(left, fwd_right, key="url", ts="ts_us",
                          direction="forward").collect()
        assert row["value_r"] == 4.0, nparts
