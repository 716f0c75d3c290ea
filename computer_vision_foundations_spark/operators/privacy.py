"""Privacy auditing: k-anonymity over quasi-identifier combinations.

Training corpora carry governance obligations before they carry
tokens: a release is k-ANONYMOUS over a set of quasi-identifier (QI)
columns when every observed QI combination is shared by at least k
rows (Sweeney 2002) — smaller equivalence classes re-identify. The
audit is a pure relational aggregate, which is exactly why it belongs
in the engine: at 100 TB it is one hash aggregate over the QI
projection, and the at-risk row set is a semi-join against the small
violating-class table.

Reference parity: the reference's corpus carries per-image metadata
(camera make/model, timestamps — `02_Data Ingest.py` EXIF struct)
that IS a quasi-identifier set; auditing class sizes before release
is the standard pre-publication step.

Scale shape: one hash aggregate over narrow QI columns (map-side
partials); ``suppression_candidates`` joins the violating classes
back — the violating table is at most (k−1)·|violations| rows and
usually broadcastable; payloads never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_report", "suppression_candidates"]


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per-equivalence-class audit: ``qi_cols + (class_size,
    at_risk)`` — one row per observed QI combination, ``at_risk``
    when the class holds fewer than ``k`` rows."""
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size")
    ).select(
        *qi_cols,
        "class_size",
        (F.col("class_size") < k).alias("at_risk"),
    )


def suppression_candidates(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """The rows that must be suppressed (or generalized) to reach
    k-anonymity: every row whose QI class is smaller than ``k`` —
    ``(id, qi_cols...)``. Violating classes are broadcast (≤ (k−1)
    rows each), so the corpus is filtered map-side. The join is
    null-safe: a NULL QI value forms an equivalence class like any
    other (groupBy semantics), so its rows must match their violating
    class too — plain equality would silently exempt them."""
    bad = (
        k_anonymity_report(df, qi_cols, k)
        .where("at_risk")
        .select(*[F.col(c).alias(f"_b_{c}") for c in qi_cols])
    )
    cond = None
    for c in qi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_b_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(F.broadcast(bad), cond, "left_semi").select(
        id_col, *qi_cols
    )
