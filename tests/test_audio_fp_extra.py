"""Review-fix pins for audio_fp: distinct-fingerprint match counting."""

from computer_vision_foundations_spark.operators.audio_fp import (
    audio_fingerprint_pairs,
)


def test_repeated_fingerprint_counts_once(spark):
    # clips 1 and 2 share ONE distinct fingerprint, but clip 1 holds it
    # twice (periodic audio): the join must not inflate 2x1 -> 2 matches
    rows = [
        (1, 0, "fpX"), (1, 7, "fpX"),   # same fp at two positions
        (2, 3, "fpX"),
        (1, 2, "fpY"), (2, 9, "fpZ"),   # unshared
    ]
    lm = spark.createDataFrame(rows, ["doc_id", "widx", "fp"])
    assert (
        audio_fingerprint_pairs(lm, min_matches=2, max_fp_freq=None).count()
        == 0
    )
    one = audio_fingerprint_pairs(lm, min_matches=1, max_fp_freq=None).collect()
    assert len(one) == 1 and one[0]["n_matches"] == 1


def test_cap_counts_clips_not_occurrences(spark):
    # fp held by 2 clips but 4 landmark rows: cap of 2 must keep it
    rows = [
        (1, 0, "fpX"), (1, 5, "fpX"),
        (2, 1, "fpX"), (2, 8, "fpX"),
    ]
    lm = spark.createDataFrame(rows, ["doc_id", "widx", "fp"])
    assert (
        audio_fingerprint_pairs(lm, min_matches=1, max_fp_freq=2).count() == 1
    )
