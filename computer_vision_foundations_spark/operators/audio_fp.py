"""Audio fingerprinting: energy-landmark constellation near-dup pairs.

Audio dedup at corpus scale works like Shazam's constellation scheme
(Wang 2003): reduce each clip to sparse LANDMARKS (local maxima of a
short-time feature), hash small groups of nearby landmarks into
fingerprints, and match clips by counting shared fingerprints with an
equi-join — never by comparing waveforms. The landmark feature here is
the per-window integer ENERGY of the real WAV decode
(``functions/media.wav_window_stats`` — the codec twin of the
image/GIF chains): energies are exact integers, so peak picking,
gap encoding and the log2-magnitude bucket (``length(bin(e))``) are
bit-reproducible across engines and the whole chain replays in the
DuckDB oracle. A fingerprint is

    md5(dt1 || '_' || dt2 || '_' || m0 || '_' || m1 || '_' || m2)

over three consecutive energy peaks (gaps between them plus each
peak's integer log2-magnitude bucket) — translation-invariant (gaps,
not positions) exactly like the published delta-time hashing.

Scale shape: the pair generator is the same banded-join discipline as
MinHash/SimHash (``operators/dedup.py``): fingerprints are narrow
(id, 16-byte md5) rows, candidate pairs come from a fingerprint
equi-join, and a frequency cap (``max_fp_freq``) drops degenerate
fingerprints BEFORE the join so a hot hash can't form a quadratic
bucket. Waveforms never shuffle; two keyed shuffles of landmark rows
(the per-clip lag/lead windows share one partitioning) plus the
capped join are the whole budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["audio_energy_landmarks", "audio_fingerprint_pairs"]


def audio_energy_landmarks(
    windows: DataFrame,
    id_col: str = "doc_id",
    widx_col: str = "widx",
    energy_col: str = "energy",
) -> DataFrame:
    """``(id, widx, fp)`` — one fingerprint per energy-peak triple.

    A peak is a window whose energy strictly exceeds the previous
    window's and is ≥ the next (ties break toward the earlier peak);
    boundary windows never peak. Each peak with two successors emits
    ``fp = md5(dt1_dt2_m0_m1_m2)`` where dt1/dt2 are the gaps to the
    next two peaks and m0/m1/m2 = ``length(bin(energy))`` of the three
    peaks (the exact integer log2 bucket)."""
    w = Window.partitionBy(id_col).orderBy(widx_col)
    e = F.col(energy_col)
    nb = windows.select(
        id_col,
        widx_col,
        energy_col,
        F.lag(energy_col).over(w).alias("_pe"),
        F.lead(energy_col).over(w).alias("_ne"),
    )
    peaks = nb.where(
        F.col("_pe").isNotNull()
        & F.col("_ne").isNotNull()
        & (e > F.col("_pe"))
        & (e >= F.col("_ne"))
    ).select(id_col, widx_col, energy_col)
    tr = peaks.select(
        id_col,
        widx_col,
        energy_col,
        F.lead(widx_col, 1).over(w).alias("_w1"),
        F.lead(widx_col, 2).over(w).alias("_w2"),
        F.lead(energy_col, 1).over(w).alias("_e1"),
        F.lead(energy_col, 2).over(w).alias("_e2"),
    ).where(F.col("_w2").isNotNull())

    def _mag(c):
        return F.length(F.bin(c.cast("long"))).cast("long")

    fp = F.md5(
        F.concat_ws(
            "_",
            (F.col("_w1") - F.col(widx_col)).cast("long"),
            (F.col("_w2") - F.col("_w1")).cast("long"),
            _mag(F.col(energy_col)),
            _mag(F.col("_e1")),
            _mag(F.col("_e2")),
        )
    )
    return tr.select(id_col, widx_col, fp.alias("fp"))


def audio_fingerprint_pairs(
    landmarks: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    min_matches: int = 2,
    max_fp_freq: int | None = 64,
) -> DataFrame:
    """``(id_a, id_b, n_matches)`` with ``id_a < id_b`` — clip pairs
    sharing at least ``min_matches`` DISTINCT fingerprints (a
    fingerprint repeating inside a clip — periodic audio — counts
    once, so n_matches is a set-overlap count, never multiplicative).
    Fingerprints held by more than ``max_fp_freq`` clips are dropped
    before the join (skew cap, ON by default like every pair
    generator here); pass ``None`` only for oracle-exact
    small-corpus checks."""
    lm = landmarks.select(id_col, fp_col).distinct()
    if max_fp_freq is not None:
        freq = (
            lm.groupBy(fp_col)
            .count()
            .where(F.col("count") <= max_fp_freq)
            .select(fp_col)
        )
        lm = lm.join(freq, fp_col)
    a = lm.select(
        F.col(id_col).alias("id_a"), F.col(fp_col).alias("fp")
    )
    b = lm.select(
        F.col(id_col).alias("id_b"), F.col(fp_col).alias("fp")
    )
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .where(F.col("n_matches") >= min_matches)
    )
