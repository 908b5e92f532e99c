"""Engine configuration.

Mirrors the reference's layered defaults (DEFAULT_CONFIG,
mtscomp.py:46-57, merged with ``~/.mtscomp`` and kwargs in
mtscomp.py:186-209) as a plain dataclass + kwargs override — Spark-side
knobs travel via ``spark.conf`` / ``spark-submit --conf``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

US_PER_SECOND = 1_000_000
US_PER_MINUTE = 60 * US_PER_SECOND
US_PER_HOUR = 60 * US_PER_MINUTE
US_PER_DAY = 24 * US_PER_HOUR


@dataclass(frozen=True)
class EngineConfig:
    # chunking (≙ chunk_duration=1., sample_rate-driven chunk_size,
    # mtscomp.py:51,324-339). Web snapshots are sparse/irregular, so the
    # chunk unit is wall-clock time, default 1 day of events per chunk.
    chunk_duration_us: int = US_PER_DAY
    # entropy stage (≙ compression_algorithm='zlib', comp_level=-1,
    # mtscomp.py:49-50) is fixed zlib inside codec.py
    check_after_compress: bool = True  # ≙ mtscomp.py:56
    check_after_decompress: bool = True  # ≙ mtscomp.py:57
    # rollup tiers (north_rule: 1m/1h/1d continuous aggregates)
    tiers: tuple[str, ...] = ("1m", "1h", "1d")
    # retention horizon per tier, μs (raw -> 1h -> 1d downsampling)
    retention_us: dict = field(
        default_factory=lambda: {
            "raw": 30 * US_PER_DAY,
            "1m": 90 * US_PER_DAY,
            "1h": 365 * US_PER_DAY,
            "1d": 10 * 365 * US_PER_DAY,
        }
    )
    # skew: urls whose chunk exceeds this many points get salted encode groups
    hot_chunk_points: int = 250_000
    shuffle_partitions: int = 32

    def with_overrides(self, **kwargs) -> "EngineConfig":
        """kwargs-over-defaults merge (≙ read_config + kwargs merge,
        mtscomp.py:186-209 — non-None values win)."""
        clean = {k: v for k, v in kwargs.items() if v is not None}
        return replace(self, **clean)


DEFAULT = EngineConfig()

TIER_US = {
    "1m": US_PER_MINUTE,
    "1h": US_PER_HOUR,
    "1d": US_PER_DAY,
}
