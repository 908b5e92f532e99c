"""Sessionization + deterministic hash-split sampling."""

import pytest
from pyspark.sql import functions as F

from mtslake.sessions import hash_split, session_stats, sessionize

M = 60 * 1_000_000  # one minute in us


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: two sessions (gap of 45 min between e3 and e4)
        (1, 1, 0), (1, 2, 10 * M), (1, 3, 20 * M),
        (1, 4, 65 * M), (1, 5, 70 * M),
        # user 2: one event = one session
        (2, 6, 0),
        # user 3: exactly-30min gap is NOT a boundary (> gap, not >=)
        (3, 7, 0), (3, 8, 30 * M),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_us long")
    out = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in sessionize(df, tiebreak="event_id").collect()
    }
    assert out == {
        (1, 1): 1, (1, 2): 1, (1, 3): 1, (1, 4): 2, (1, 5): 2,
        (2, 6): 1,
        (3, 7): 1, (3, 8): 1,
    }
    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_us"])
        for r in session_stats(df, tiebreak="event_id").collect()
    }
    assert stats == {
        (1, 1): (3, 20 * M), (1, 2): (2, 5 * M),
        (2, 1): (1, 0), (3, 1): (2, 30 * M),
    }


def test_hash_split_deterministic_and_complete(spark):
    from mtslake.hashing import spark_xxhash64_longs

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, weights={"train": 80, "val": 10, "test": 10})
    rows = out.collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert sum(counts.values()) == 5000
    # roughly proportional (hash-uniform)
    assert 0.75 < counts["train"] / 5000 < 0.85
    # python reimplementation agrees exactly
    for r in rows[:200]:
        b = spark_xxhash64_longs(r["doc_id"], 0) % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r["split"] == want
    # stable across evaluations
    again = {r["doc_id"]: r["split"] for r in hash_split(
        df, weights={"train": 80, "val": 10, "test": 10}).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_sessionize_matches_python_reference(spark):
    """Property-style check on an adversarial stream: random gaps
    around the boundary, colliding timestamps, many keys — the Spark
    windows must agree with a direct Python fold."""
    import random

    rng = random.Random(1234)
    rows = []
    eid = 0
    for user in range(25):
        t = 0
        for _ in range(rng.randint(1, 40)):
            # gaps clustered around the 30-minute boundary, plus ties
            t += rng.choice([0, 1, 29 * M, 30 * M, 30 * M + 1, 2 * 30 * M])
            rows.append((user, eid, t))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_us long")
    got = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in sessionize(df, tiebreak="event_id").collect()
    }

    by_user = {}
    for user, e, t in rows:
        by_user.setdefault(user, []).append((t, e))
    want = {}
    for user, evs in by_user.items():
        seq = 0
        prev = None
        for t, e in sorted(evs):
            if prev is None or t - prev > 30 * M:
                seq += 1
            want[(user, e)] = seq
            prev = t
    assert got == want


def test_sessionize_single_shuffle(spark):
    """Both windows and the final aggregation share the key
    partitioning — the plan must contain exactly ONE hash exchange on
    the key (plus nothing else)."""
    df = spark.createDataFrame(
        [(1, 1, 0), (1, 2, 10)], "user_id long, event_id long, ts_us long"
    )
    out = session_stats(df, tiebreak="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_two_phase_sessionize_equals_single_window(spark):
    """The hot-key-safe two-phase path must agree with the single-window
    path EXACTLY — randomized gaps straddling the 30-minute boundary,
    colliding timestamps, sessions spanning many blocks, gaps longer
    than a block (merge across non-adjacent blocks), and one hot key
    with far more events than any block holds."""
    import random

    rng = random.Random(987)
    rows = []
    eid = 0
    for user in range(20):
        t = rng.randint(0, 5 * M)
        for _ in range(rng.randint(1, 60)):
            t += rng.choice(
                [0, 1, 5 * M, 29 * M, 30 * M, 30 * M + 1, 3 * 60 * M]
            )
            rows.append((user, eid, t))
            eid += 1
    # hot key: 2000 events, mixture of tiny and boundary gaps
    t = 0
    for _ in range(2000):
        t += rng.choice([1, 2 * M, 30 * M + 1])
        rows.append((999, eid, t))
        eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_us long")

    single = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in sessionize(df, tiebreak="event_id").collect()
    }
    # block = 1 hour: sessions and even single gaps regularly span blocks
    for block_us in (60 * M, 7 * M):
        two = {
            (r["user_id"], r["event_id"]): r["session_seq"]
            for r in sessionize(
                df, tiebreak="event_id", block_us=block_us
            ).collect()
        }
        assert two == single, f"two-phase diverged at block_us={block_us}"


def test_two_phase_spreads_hot_key_over_blocks(spark):
    """The events-side heavy lifting must partition on (key, block),
    never on the key alone — the point of the two-phase variant: no
    single-task sort of a celebrity key."""
    df = spark.createDataFrame(
        [(1, i, i * M) for i in range(50)],
        "user_id long, event_id long, ts_us long",
    )
    out = sessionize(df, tiebreak="event_id", block_us=60 * M)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # local window exchange carries both key and block
    assert "hashpartitioning(user_id" in plan
    blk_lines = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "_blk" in ln
    ]
    assert blk_lines, plan


HOUR_US = 3_600_000_000


def _pings(spark, rows):
    return spark.createDataFrame(rows, "url string, ts_us long")


def test_uptime_union_of_overlapping_leases(spark):
    """Pings 10 min apart under a 30-min lease merge into ONE island
    covering [first, last + lease) — not three summed leases."""
    from mtslake.sessions import uptime

    m = 60_000_000
    df = _pings(spark, [("a", 0), ("a", 10 * m), ("a", 20 * m)])
    [row] = uptime(df, lease_us=30 * m, tier="1h").collect()
    assert row["bucket_us"] == 0
    assert row["uptime_us"] == 50 * m          # [0, 20m + 30m)
    assert row["n_islands"] == 1
    assert row["uptime_ratio"] == pytest.approx(50 / 60)


def test_uptime_separate_islands_and_gap(spark):
    """A ping more than one lease after its predecessor starts a new
    island; the dead gap contributes nothing."""
    from mtslake.sessions import uptime

    m = 60_000_000
    df = _pings(spark, [("a", 0), ("a", 45 * m)])   # gap 45m > 30m lease
    got = {r["bucket_us"] // HOUR_US: (r["uptime_us"], r["n_islands"])
           for r in uptime(df, lease_us=30 * m, tier="1h").collect()}
    # islands [0, 30m) and [45m, 75m): bucket 0 gets 30m + 15m from
    # TWO islands; the second island spills 15m into bucket 1
    assert got[0] == (45 * m, 2)
    assert got[1] == (15 * m, 1)


def test_uptime_island_straddles_buckets(spark):
    """A lease crossing the bucket boundary splits its μs exactly
    across both buckets."""
    from mtslake.sessions import uptime

    m = 60_000_000
    df = _pings(spark, [("a", 50 * m)])             # lease -> [50m, 80m)
    got = {r["bucket_us"] // HOUR_US: (r["uptime_us"], r["n_islands"])
           for r in uptime(df, lease_us=30 * m, tier="1h").collect()}
    assert got[0] == (10 * m, 1)
    assert got[1] == (20 * m, 1)


def test_uptime_two_phase_matches_single_window(spark):
    """block_us (the hot-key-safe sessionize path) must produce the
    identical uptime surface."""
    from mtslake.sessions import uptime

    m = 60_000_000
    rows = [("a", i * 7 * m) for i in range(40)] + [("b", 3 * m)]
    df = _pings(spark, rows)
    one = sorted(map(tuple, uptime(df, 10 * m, "1h")
                 .select("url", "bucket_us", "uptime_us", "n_islands")
                 .collect()))
    two = sorted(map(tuple, uptime(df, 10 * m, "1h", block_us=2 * HOUR_US)
                 .select("url", "bucket_us", "uptime_us", "n_islands")
                 .collect()))
    assert one == two


def test_downtime_gaps_hand_case(spark):
    """Three islands -> two gaps, each strictly between one island's
    lease horizon and the next island's first ping."""
    from mtslake.sessions import downtime_gaps

    m = 60_000_000
    df = _pings(spark, [
        ("a", 0),             # island 1: [0, 10m)
        ("a", 25 * m),        # island 2: [25m, 35m)
        ("a", 100 * m),       # island 3: [100m, 110m)
    ])
    got = sorted(
        (r["gap_start_us"], r["gap_end_us"], r["gap_us"], r["rank"])
        for r in downtime_gaps(df, lease_us=10 * m).collect()
    )
    assert got == [
        (10 * m, 25 * m, 15 * m, 2),
        (35 * m, 100 * m, 65 * m, 1),
    ]


def test_downtime_gaps_topk_and_tie_rank(spark):
    """k keeps the longest gaps; equal lengths rank by earlier start."""
    from mtslake.sessions import downtime_gaps

    m = 60_000_000
    df = _pings(spark, [
        ("a", 0), ("a", 20 * m), ("a", 40 * m), ("a", 100 * m),
    ])
    # lease 5m -> islands at 0,20m,40m,100m; gaps 15m, 15m, 55m
    out = {r["rank"]: (r["gap_start_us"], r["gap_us"])
           for r in downtime_gaps(df, lease_us=5 * m, k=2).collect()}
    assert len(out) == 2
    assert out[1] == (45 * m, 55 * m)
    assert out[2] == (5 * m, 15 * m)   # tie: earlier start outranks


def test_downtime_gaps_complement_of_uptime(spark):
    """Over each key's observed horizon [first ping, last island end),
    uptime + downtime must account for every microsecond."""
    from mtslake.sessions import downtime_gaps, uptime

    m = 60_000_000
    rows = [("a", i * 17 * m) for i in range(20)] + \
           [("b", j * 53 * m) for j in range(7)]
    df = _pings(spark, rows)
    lease = 10 * m
    up = uptime(df, lease, "1d")
    up_tot = {r["url"]: r["u"] for r in
              up.groupBy("url").agg(F.sum("uptime_us").alias("u")).collect()}
    gap_tot = {r["url"]: r["g"] for r in
               downtime_gaps(df, lease).groupBy("url")
               .agg(F.sum("gap_us").alias("g")).collect()}
    span = {k: max(t for u, t in rows if u == k)
            - min(t for u, t in rows if u == k) + lease
            for k in ("a", "b")}
    for k in ("a", "b"):
        assert up_tot[k] + gap_tot.get(k, 0) == span[k]


def test_weighted_sample_properties(spark):
    """Determinism, monotonicity in the weight, and edge weights."""
    from mtslake.sessions import weighted_sample

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    lo = df.withColumn("w", F.lit(0.3))
    hi = df.withColumn("w", F.lit(0.7))
    kept_lo = {r["doc_id"] for r in
               weighted_sample(lo, "w").select("doc_id").collect()}
    kept_hi = {r["doc_id"] for r in
               weighted_sample(hi, "w").select("doc_id").collect()}
    # deterministic across evaluations
    again = {r["doc_id"] for r in
             weighted_sample(lo, "w").select("doc_id").collect()}
    assert again == kept_lo
    # monotone: raising the weight never evicts a kept row
    assert kept_lo <= kept_hi
    # rates roughly proportional (hash-uniform)
    assert 0.25 < len(kept_lo) / 4000 < 0.35
    assert 0.65 < len(kept_hi) / 4000 < 0.75
    # edge weights
    zero = df.withColumn("w", F.lit(0.0))
    one = df.withColumn("w", F.lit(1.0))
    assert weighted_sample(zero, "w").count() == 0
    assert weighted_sample(one, "w").count() == 4000
    # NULL weight drops the row
    nw = df.withColumn("w", F.lit(None).cast("double"))
    assert weighted_sample(nw, "w").count() == 0


def test_funnel_hand_case(spark):
    """Strict ordering (a same-μs pair never converts), horizon
    cutoff, greedy-earliest chain, depth accounting, and the
    guards."""
    import pytest as _pytest
    from mtslake.sessions import funnel

    rows = [
        # u1: full chain 10 -> 20 -> 30
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click at the SAME us as view -> strict > blocks it;
        #     later click converts, purchase BEFORE click ignored
        (2, "view", 10), (2, "click", 10), (2, "purchase", 15),
        (2, "click", 40),
        # u3: purchase outside the horizon from t1
        (3, "view", 0), (3, "click", 50), (3, "purchase", 2_000),
        # u4: never entered (no view)
        (4, "click", 5), (4, "purchase", 6),
        # u1 extra later events must not move the greedy chain
        (1, "click", 25), (1, "purchase", 29),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long")
    got = {r["user_id"]: r for r in funnel(
        ev, ["view", "click", "purchase"], within_us=1_000
    ).collect()}
    # greedy: first click after 10 is 20; first purchase after 20 is 29
    assert got[1]["t_1"] == 10
    assert (got[1]["t_2"], got[1]["t_3"], got[1]["depth"]) == (20, 29, 3)
    assert (got[2]["t_2"], got[2]["t_3"], got[2]["depth"]) == (40, None, 2)
    assert (got[3]["t_2"], got[3]["t_3"], got[3]["depth"]) == (50, None, 2)
    assert 4 not in got
    with _pytest.raises(ValueError):
        funnel(ev, ["view"])
    with _pytest.raises(ValueError):
        funnel(ev, ["view", "view"])


def test_cohort_retention_hand_case(spark):
    from mtslake.sessions import cohort_retention

    D = 100
    rows = [
        (1, 0), (1, 5), (1, 2 * D + 1),     # cohort 0: active d0, d2
        (2, 10), (2, D + 3),                # cohort 0: active d0, d1
        (3, D + 1), (3, 3 * D),             # cohort 1: active d0, d2
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {(r["cohort_us"], r["offset"]):
           (r["n_active"], r["n_cohort"], r["ret_frac"])
           for r in cohort_retention(ev, D).collect()}
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (0, 2): (1, 2, 0.5),
        (D, 0): (1, 1, 1.0),
        (D, 2): (1, 1, 1.0),
    }


def test_stratified_sample_exact_counts_and_determinism(spark):
    from mtslake.sessions import stratified_sample

    rows = [(i, "L%d" % (i % 3), "s%d" % (i % 2)) for i in range(200)]
    rows += [(1000, "rare", "s0")]          # stratum smaller than n
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = stratified_sample(df, ["lang", "source"], 5)
    counts = {(r["lang"], r["source"]): r["n"]
              for r in out.groupBy("lang", "source")
              .agg(F.count("*").alias("n")).collect()}
    for (lang, srcn), n in counts.items():
        assert n == (1 if lang == "rare" else 5)
    assert len(counts) == 7
    # pure function of (id, seed): re-run identical, seed changes it
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         stratified_sample(df, ["lang", "source"], 5).collect()}
    assert a == b
    c = {r["doc_id"] for r in
         stratified_sample(df, ["lang", "source"], 5, seed=9).collect()}
    assert c != a
