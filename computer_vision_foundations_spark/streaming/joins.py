"""Watermarked stream-stream joins.

Structured Streaming can join two unbounded streams only if it can
bound the state it keeps for each side; the bound comes from
watermarks plus a time-range predicate tying the two event-time
columns together. This module packages the correct incantation —
the part everyone gets wrong is that BOTH sides need a watermark and
the range predicate must be expressed on raw event-time columns so
the state store can evict rows the other side can no longer match.

State size ~ input-rate × (watermark delay + join window); at 100 TB
day-scale windows this is the dominant memory consumer — keep the
join window as tight as the semantics allow and the watermark delay
at the real out-of-orderness, not a guess with headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Join streaming ``left`` and ``right`` rows sharing key ``on``
    with ``right_ts`` in ``[left_ts - lower, left_ts + upper]``
    (interval strings, e.g. ``'10 minutes'``; ``'0 seconds'`` pins a
    side). Both inputs get ``watermark`` on their event-time column;
    outer joins emit unmatched rows only after the watermark closes
    the possibility of a match — exactly-once across restarts via the
    sink checkpoint as usual."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= F.expr(f"{left_ts} - INTERVAL {lower}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how).drop(rw[on])
