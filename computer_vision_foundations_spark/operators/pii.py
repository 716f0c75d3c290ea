"""PII detection and redaction over text columns.

The curation stage every production training-data pipeline runs
before anything else ships: find personally-identifying strings
(emails, phone numbers, IPv4 addresses), count them per document for
routing/audit, and mask them in place. The reference has no explicit
PII stage (its corpus is camera imagery); this module supplies the
text-pipeline counterpart the brief's §"training-data pipeline"
scope requires.

Engine-portability contract: the patterns below are written in the
COMMON subset of Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, non-capturing groups, ASCII word
boundaries; NO backreferences or lookaround (RE2 has neither). Both
engines therefore match the exact same spans, which is what makes the
operator differentially testable (za31).

Spark-first shape: one narrow projection per document —
``regexp_count`` ×3 + chained ``regexp_replace`` ×3, all JVM-side
whole-stage codegen; no UDF, no shuffle. At 100 TB this runs at scan
speed and the only data movement is whatever downstream asks for.

Redaction order is FIXED (email → phone → IPv4) and the placeholder
tokens contain no digits or '@', so a later pass can never re-match
text introduced by an earlier one; the oracle applies the identical
order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EMAIL_RE",
    "PHONE_RE",
    "IPV4_RE",
    "pii_scan",
    "pii_redact_col",
    "pii_oracle_sql",
]

# Shared Java/RE2 subset — see module docstring.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international-ish grouped digits: 2-3-3-4 with '-' or '.' separators
# (the TPC-H c_phone shape '25-989-741-2988' is the test fixture)
PHONE_RE = r"\b\d{2,3}[-.]\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_MASKS = (
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
)


def pii_redact_col(text: Column) -> Column:
    """Masked copy of ``text`` — fixed email → phone → IPv4 order."""
    out = text
    for pat, mask in _MASKS:
        out = F.regexp_replace(out, pat, mask)
    return out


def pii_scan(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """``(id, n_emails, n_phones, n_ipv4, red_md5)`` per document.

    ``red_md5`` is the md5 of the redacted text: comparing the hash
    differentially proves the masked STRING is byte-identical across
    engines without shipping document bodies through the gate (the
    same bodies-stay-narrow discipline as the dedup family).

    NULL text propagates NULL counts and hash on BOTH engines
    (regexp_count/regexp_replace/md5 are all NULL-strict in Spark and
    DuckDB alike), so the differential contract holds with no guard.
    """
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ipv4"),
        F.md5(pii_redact_col(t).cast("binary")).alias("red_md5"),
    )


def pii_oracle_sql(src_sql: str) -> str:
    """DuckDB twin over any source yielding ``(id, txt)``: identical
    patterns, identical mask order ('g' = global, matching Spark's
    replace-all default)."""
    red = "txt"
    for pat, mask in _MASKS:
        red = f"regexp_replace({red}, '{pat}', '{mask}', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(txt, '{pat}')) AS INT) AS {name}"
        for pat, name in (
            (EMAIL_RE, "n_emails"),
            (PHONE_RE, "n_phones"),
            (IPV4_RE, "n_ipv4"),
        )
    )
    return f"""
    SELECT id,
           {counts},
           md5({red}) AS red_md5
    FROM ({src_sql})
    """
