"""As-of join vs a hand-computed and a pandas merge_asof oracle."""

import pandas as pd

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
