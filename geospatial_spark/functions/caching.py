"""Session-lifetime cache registry for operator-internal persists.

Operators that persist an intermediate (pip_join shuffle mode, dedup_minhash
shingles) register it here; long-lived callers (bench loops, pipelines,
notebooks) call ``release_all()`` between workloads so executor storage
never accumulates dead blocks.  A single query run through the driver
contract leaves at most a few MB cached — the registry exists for the
repeated-invocation case flagged in round-1 advice."""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for later bulk release."""
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _TRACKED.clear()
    return n
