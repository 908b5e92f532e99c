"""Salted two-stage rollup ≡ unsalted rollup, bit-for-bit (hot-domain
skew handling, north_rule — exactness guaranteed by decimal sums)."""

from mtslake import rollup
from mtslake.datagen import generate_pages
from mtslake.series import pages_to_series


def test_salted_equals_unsalted(spark):
    pages = generate_pages(spark, n_urls=20, snapshots_per_url=96,
                           n_hot=2, hot_factor=50)  # heavy skew fixture
    series = pages_to_series(pages)
    plain = {tuple(r) for r in rollup.rollup_from_series(series, "1h").collect()}
    salted = {
        tuple(r)
        for r in rollup.rollup_from_series(series, "1h", salt=8).collect()
    }
    assert plain == salted
