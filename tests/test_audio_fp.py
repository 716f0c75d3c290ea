import pytest

from computer_vision_foundations_spark.operators.audio_fp import (
    audio_energy_landmarks,
    audio_fingerprint_pairs,
)


def _windows(spark, clips):
    rows = [
        (cid, i, e)
        for cid, energies in clips.items()
        for i, e in enumerate(energies)
    ]
    return spark.createDataFrame(rows, ["doc_id", "widx", "energy"])


def test_peak_picking_and_triples(spark):
    # energies: peaks at widx 1 (5>1, 5>=2), 3 (9>2, 9>=0), 5 (7>0, 7>=3)
    win = _windows(spark, {1: [1, 5, 2, 9, 0, 7, 3]})
    lm = audio_energy_landmarks(win).collect()
    # three peaks -> exactly one triple, anchored at the first peak
    assert len(lm) == 1 and lm[0]["widx"] == 1


def test_boundary_windows_never_peak(spark):
    # monotone rise: last window is max but has no successor
    win = _windows(spark, {1: [1, 2, 3, 4, 5]})
    assert audio_energy_landmarks(win).count() == 0


def test_tie_breaks_toward_earlier_peak(spark):
    # plateau 5,5: first 5 has prev 1 (strict >) and next 5 (>=) -> peak;
    # second 5 fails strict > against previous 5
    win = _windows(spark, {1: [1, 5, 5, 1, 8, 2, 9, 3]})
    lm = audio_energy_landmarks(win).collect()
    peak_starts = sorted(r["widx"] for r in lm)
    assert peak_starts == [1]  # triple (1, 4, 6)


def test_identical_clips_pair(spark):
    pattern = [1, 5, 2, 9, 0, 7, 3, 8, 1, 6, 0]  # several peaks
    win = _windows(spark, {1: pattern, 2: pattern, 3: [0] * 11})
    lm = audio_energy_landmarks(win)
    pairs = audio_fingerprint_pairs(lm, min_matches=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    n_lm = lm.where("doc_id = 1").count()
    assert pairs[0]["n_matches"] >= min(2, n_lm)


def test_frequency_cap_drops_degenerate_fingerprints(spark):
    pattern = [1, 5, 2, 9, 0, 7, 3]
    clips = {i: pattern for i in range(1, 7)}  # 6 identical clips
    lm = audio_energy_landmarks(_windows(spark, clips))
    # each clip emits 1 landmark; fp frequency = 6 > cap 5 -> no pairs
    assert audio_fingerprint_pairs(lm, min_matches=1, max_fp_freq=5).count() == 0
    uncapped = audio_fingerprint_pairs(lm, min_matches=1, max_fp_freq=None)
    assert uncapped.count() == 15  # all C(6,2) pairs
