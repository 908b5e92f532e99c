"""Graded-fixture vitality: each contract fixture must actually
EXERCISE the branch its docstring sells — the failure mode here is a
query that hashes green while the interesting code path never runs
(an inert fixture graded ts_anomaly_24h's flag as constant-FALSE for a
round: the trailing baseline never reached the old min_points=12 on
any shipped SF, so a broken k-sigma comparison would still have
passed). These asserts pin non-degeneracy at the smoke SF so a fixture
or parameter change that re-inerts a branch fails CI, not the judge.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def q():
    return entry.queries()


def test_anomaly_flags_fire(spark, sf_dir, q):
    df = q["ts_anomaly_24h"](spark, sf_dir)
    n = df.agg(F.sum(F.col("is_anomaly").cast("int"))).first()[0]
    assert n and n > 0, "k-sigma branch inert: no anomaly ever flags"


def test_changes_has_both_branches(spark, sf_dir, q):
    df = q["ts_changes_1h"](spark, sf_dir)
    tot = df.agg(F.sum("n_changes").alias("c"),
                 F.sum("n_obs").alias("o")).first()
    assert 0 < tot["c"] < tot["o"] - 1, (
        "flap fixture degenerate: need SOME changes and SOME "
        f"unchanged pairs, got changes={tot['c']} obs={tot['o']}")


def test_dedup_exact_has_multi_copy_groups(spark, sf_dir, q):
    df = q["doc_dedup_exact"](spark, sf_dir)
    dups = df.filter(F.col("n_copies") > 1)
    assert dups.count() > 0, "no duplicate texts: survivor rule inert"
    # the canonical rule is live: every winner is the ORIGINAL id,
    # below the planted re-key offset
    assert dups.filter(F.col("keep_doc_id") >= 1_000_000).count() == 0


def test_cusum_alarms_fire(spark, sf_dir, q):
    df = q["ts_cusum_1h"](spark, sf_dir)
    ups = df.agg(F.sum(F.col("shift_up").cast("int"))).first()[0]
    assert ups and ups > 0, "CUSUM alarm threshold never crossed"


def test_counter_fixture_has_resets(spark, sf_dir, q):
    df = q["ts_counter_resets_1h"](spark, sf_dir)
    n = df.agg(F.sum("n_resets")).first()[0]
    assert n and n > 0, "no counter restarts planted"


def test_minhash_fixture_has_near_dup_pairs(spark, sf_dir, q):
    assert q["doc_minhash_lsh"](spark, sf_dir).count() > 0, (
        "no Jaccard>=threshold pairs: the dedup family grades nothing")


def test_ohlc_fixture_has_duplicate_instants(spark, sf_dir, q):
    """The raw events have ZERO duplicate (user, ts) pairs at any SF,
    so ohlc's struct tiebreak would grade nothing without the planted
    same-instant twins; assert the plant is alive AND that some
    bucket's open is actually decided by it (the twin value -v-1 wins
    the open tie at a duplicated bucket-opening instant)."""
    df = q["ts_ohlc_1h"](spark, sf_dir)
    # twins exist: some bucket has n > the raw per-bucket count AND a
    # planted (strictly smaller) open — open == -high-1 at a bucket
    # whose opening instant is duplicated and whose high is the raw twin
    tied_open = df.filter(F.col("open") == -F.col("high") - 1.0).count()
    assert tied_open > 0, "no bucket's open decided by a planted tie"


def test_changes_fixture_has_duplicate_instants(spark, sf_dir):
    """ts_changes_1h's event_id tiebreak is only graded if some
    (url, ts) instant is actually duplicated — the raw events never
    are, so the fixture plants same-instant twins (user_id % 41)."""
    ev = entry._events(spark, sf_dir)
    n = ev.filter(F.col("user_id") % 41 == 0).count()
    assert n > 0, "no twin-eligible events: tiebreak ungraded"
