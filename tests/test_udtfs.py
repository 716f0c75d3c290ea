"""Python UDTF surface: SQL registration, LATERAL join, edge cases."""

from computer_vision_foundations_spark.functions.udtfs import register_udtfs


def test_split_sentences_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Hello there. How are you? Fine!"), (2, ""), (3, None)],
        ["doc_id", "text"],
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    ).collect()
    got = {(r.doc_id, r.sent_idx): (r.sentence, r.n_words) for r in rows}
    assert got == {
        (1, 0): ("Hello there.", 2),
        (1, 1): ("How are you?", 3),
        (1, 2): ("Fine!", 1),
    }
