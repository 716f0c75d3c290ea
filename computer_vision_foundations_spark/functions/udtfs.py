"""Python UDTFs (Spark >= 3.5 table functions).

The reference's UDF surface stops at scalar UDFs (SURVEY §2.8: "no
UDTF"); this engine completes the trio — scalar pandas UDFs
(functions/image.py), grouped/stateful pandas ops (streaming/
stateful.py), and table functions here — because a training-data
pipeline keeps needing one-row-to-many expansions with real logic
(sentence segmentation, record exploding) that pure ``explode(...)``
expressions cannot express.

UDTF ``eval`` logic is per-row Python, but ``useArrow=True`` moves
the worker transport to Arrow record batches (Spark 4's
arrow-optimized UDTF path — the plan shows an Arrow, not pickled,
Python node), so rows cross the JVM/Python boundary in columnar
batches. The hot-path equivalents still stay as array expressions
(chunk_documents) or Arrow-batched pandas UDFs (winnow_udf); reach
for a UDTF when LATERAL-join ergonomics or stateful row fan-out is
the point.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

__all__ = ["SplitSentences", "register_udtfs"]

_SENT_RE = re.compile(r"(?<=[.!?]) +")


@udtf(
    returnType="sent_idx: int, sentence: string, n_words: int",
    useArrow=True,
)
class SplitSentences:
    """``split_sentences(text)``: one output row per sentence
    (split at sentence-final punctuation + space), with its index
    and word count. Empty/null text yields no rows."""

    def eval(self, text: str):  # noqa: D102 — contract in class doc
        if not text:
            return
        idx = 0
        for part in _SENT_RE.split(text):
            part = part.strip()
            if part:
                yield idx, part, len(part.split(" "))
                idx += 1


def register_udtfs(spark) -> None:
    """Register every engine UDTF for SQL use (``SELECT * FROM
    split_sentences(...)`` / LATERAL joins)."""
    spark.udtf.register("split_sentences", SplitSentences)
