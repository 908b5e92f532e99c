"""Config merge semantics (≙ defaults ← ~/.mtscomp ← kwargs,
mtscomp.py:186-209: non-None values win)."""

from mtslake.config import DEFAULT, EngineConfig, US_PER_DAY


def test_defaults():
    assert DEFAULT.chunk_duration_us == US_PER_DAY
    assert DEFAULT.tiers == ("1m", "1h", "1d")
    assert DEFAULT.check_after_compress and DEFAULT.check_after_decompress


def test_override_non_none_wins():
    c = DEFAULT.with_overrides(chunk_duration_us=3_600_000_000)
    assert c.chunk_duration_us == 3_600_000_000
    assert c.tiers == DEFAULT.tiers


def test_override_none_ignored():
    c = DEFAULT.with_overrides(chunk_duration_us=None, shuffle_partitions=None)
    assert c == DEFAULT


def test_frozen():
    import dataclasses
    import pytest

    with pytest.raises(dataclasses.FrozenInstanceError):
        DEFAULT.chunk_duration_us = 1  # type: ignore[misc]
