"""Stats-based Delta data skipping: decide, per live file, whether a
predicate COULD match any of its rows — from the per-file stats the
writer records in each ``add`` action (``numRecords`` / ``minValues``
/ ``maxValues`` / ``nullCount``) plus the file's exact
``partitionValues``.

This is the read-side half of the protocol's "Per-file Statistics"
(delta.io PROTOCOL.md) and the optimization that dominates selective
reads at 100 TB: partition pruning removes directories, file skipping
removes individual files WITHIN surviving partitions before the scan
is even planned — the parquet footers of skipped files are never
opened, and on object stores never fetched. Catalyst's row-group
pushdown still applies afterwards to the files that remain.

Soundness contract (the only correctness requirement): ``
matching_files`` returns a SUPERSET of the files containing matching
rows. The caller re-applies the predicate as a residual filter, so
over-keeping costs time, never answers. Everything unknown keeps the
file: unparseable predicate shapes, columns without recorded bounds,
non-finite bounds (the writer already omits them), deleted-row
effects (DV-carrying files keep physical-row stats — bounds stay
valid supersets).

Three-valued-logic notes baked into the leaf rules:

- a comparison with NULL is never TRUE → matches nothing;
- ``x NOT IN (..., NULL)`` is never TRUE → matches nothing;
- NULL literals inside ``IN`` lists can't add matches → dropped;
- an all-null file (``nullCount == numRecords``) fails every
  comparison and ``IS NOT NULL``;
- ``NOT`` is pushed down at parse time (De Morgan + operator
  inversion), so evaluation stays purely existential — rows where the
  inverted leaf is NULL match neither side, which only over-keeps.

Spark orders NaN greatest; the writer drops non-finite bounds, so a
missing float bound already means "unbounded on that side" here.
"""

from __future__ import annotations

import datetime as _dt
import json
import re

from pyspark.sql import types as T

__all__ = ["matching_files", "parse_predicate"]

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><=|>=|!=|<>|==|=|<|>)
      | (?P<punct>[(),])
      | (?P<ident>`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "and",
    "or",
    "not",
    "in",
    "is",
    "null",
    "between",
    "true",
    "false",
    "date",
    "timestamp",
}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"unparseable predicate at: {s[pos:]!r}")
            break
        pos = m.end()
        if m.lastgroup == "ident":
            word = m.group("ident")
            if word.lower() in _KEYWORDS:
                out.append(("kw", word.lower()))
            else:
                out.append(("ident", word.strip("`")))
        else:
            out.append((m.lastgroup, m.group(m.lastgroup)))
    return out


class _Parser:
    """Recursive-descent parser for the skippable predicate subset;
    NOT is pushed to the leaves so the evaluator never negates."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        return v

    def parse(self):
        node = self.or_expr(False)
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def or_expr(self, neg: bool):
        parts = [self.and_expr(neg)]
        while self.peek() == ("kw", "or"):
            self.next()
            parts.append(self.and_expr(neg))
        if len(parts) == 1:
            return parts[0]
        # NOT(a OR b) == NOT a AND NOT b — children already negated
        return ("and" if neg else "or", parts)

    def and_expr(self, neg: bool):
        parts = [self.not_expr(neg)]
        while self.peek() == ("kw", "and"):
            self.next()
            parts.append(self.not_expr(neg))
        if len(parts) == 1:
            return parts[0]
        return ("or" if neg else "and", parts)

    def not_expr(self, neg: bool):
        if self.peek() == ("kw", "not"):
            self.next()
            return self.not_expr(not neg)
        return self.primary(neg)

    def primary(self, neg: bool):
        k, v = self.peek()
        if (k, v) == ("punct", "("):
            self.next()
            node = self.or_expr(neg)
            self.expect("punct", ")")
            return node
        if k in ("num", "str") or (k == "kw" and v in ("date", "timestamp")):
            # literal-first comparison: lit op col  ->  col flip(op) lit
            lit = self.literal()
            op = self.expect("op")
            col = self.expect("ident")
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            return self.cmp(col, flip.get(op, op), lit, neg)
        col = self.expect("ident")
        k, v = self.peek()
        if k == "op":
            self.next()
            return self.cmp(col, v, self.literal(), neg)
        if (k, v) == ("kw", "is"):
            self.next()
            isnot = self.peek() == ("kw", "not")
            if isnot:
                self.next()
            self.expect("kw", "null")
            want_null = isnot if neg else not isnot
            return ("null" if want_null else "notnull", col)
        if (k, v) == ("kw", "not"):
            self.next()
            k2, v2 = self.peek()
            if (k2, v2) == ("kw", "in"):
                self.next()
                return ("in" if neg else "notin", col, self.lit_list())
            if (k2, v2) == ("kw", "between"):
                self.next()
                lo = self.literal()
                self.expect("kw", "and")
                hi = self.literal()
                return self.between(col, lo, hi, not neg)
            raise ValueError(f"unsupported NOT form after {col!r}")
        if (k, v) == ("kw", "in"):
            self.next()
            return ("notin" if neg else "in", col, self.lit_list())
        if (k, v) == ("kw", "between"):
            self.next()
            lo = self.literal()
            self.expect("kw", "and")
            hi = self.literal()
            return self.between(col, lo, hi, neg)
        raise ValueError(f"unsupported predicate at column {col!r}")

    def cmp(self, col, op, lit, neg: bool):
        op = {"==": "=", "<>": "!="}.get(op, op)
        if neg:
            op = {
                "=": "!=",
                "!=": "=",
                "<": ">=",
                "<=": ">",
                ">": "<=",
                ">=": "<",
            }[op]
        return ("cmp", op, col, lit)

    def between(self, col, lo, hi, neg: bool):
        if neg:
            # NOT BETWEEN == col < lo OR col > hi
            return ("or", [("cmp", "<", col, lo), ("cmp", ">", col, hi)])
        return ("and", [("cmp", ">=", col, lo), ("cmp", "<=", col, hi)])

    def lit_list(self):
        self.expect("punct", "(")
        lits = [self.literal()]
        while self.peek() == ("punct", ","):
            self.next()
            lits.append(self.literal())
        self.expect("punct", ")")
        return lits

    def literal(self):
        k, v = self.next()
        if k == "num":
            return float(v) if ("." in v or "e" in v.lower()) else int(v)
        if k == "str":
            return v[1:-1].replace("''", "'")
        if k == "kw" and v in ("date", "timestamp"):
            k2, v2 = self.next()
            if k2 != "str":
                raise ValueError(f"{v.upper()} literal needs a string")
            return v2[1:-1]
        if k == "kw" and v == "true":
            return True
        if k == "kw" and v == "false":
            return False
        if k == "kw" and v == "null":
            return None
        raise ValueError(f"unsupported literal {v!r}")


def parse_predicate(where: str):
    """Parse ``where`` into the skippable AST. Raises ValueError on
    shapes outside the subset — callers treat that as 'keep all'."""
    return _Parser(_tokenize(where)).parse()


def _parse_ts(s: str) -> _dt.datetime:
    s = s.strip().replace("T", " ").rstrip("Z")
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"bad timestamp literal {s!r}")


def _coerce(lit, dtype: T.DataType):
    """Coerce a parsed literal to the column's comparison domain;
    raises on shapes we can't compare (caller keeps the file)."""
    if lit is None:
        return None
    if isinstance(lit, bool) and not isinstance(dtype, T.BooleanType):
        raise ValueError("boolean literal against non-boolean column")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        # EXACT integers: a float() collapse would equate longs beyond
        # 2^53 and make != / NOT IN skips unsound
        if isinstance(lit, int):
            return lit
        if isinstance(lit, str):
            return int(lit)
        return float(lit)  # fractional literal: int vs float compares exact
    if isinstance(dtype, T.DecimalType):
        import decimal

        return decimal.Decimal(str(lit))
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(lit)
    if isinstance(dtype, T.StringType):
        return lit if isinstance(lit, str) else str(lit)
    if isinstance(dtype, T.DateType):
        if isinstance(lit, str):
            return _dt.date.fromisoformat(lit.strip()[:10])
        raise ValueError("date column needs a string literal")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(lit, str):
            return _parse_ts(lit)
        raise ValueError("timestamp column needs a string literal")
    if isinstance(dtype, T.BooleanType):
        if isinstance(lit, bool):
            return lit
        raise ValueError("boolean column needs TRUE/FALSE")
    raise ValueError(f"unsupported column type {dtype.simpleString()}")


def _coerce_bound(v, dtype: T.DataType):
    """Coerce a stats-JSON bound value into the same domain."""
    return _coerce(v, dtype)


_CMP = {
    "=": lambda x, lo, hi: (lo is None or lo <= x) and (hi is None or x <= hi),
    "!=": lambda x, lo, hi: not (lo is not None and lo == hi == x),
    "<": lambda x, lo, hi: lo is None or lo < x,
    "<=": lambda x, lo, hi: lo is None or lo <= x,
    ">": lambda x, lo, hi: hi is None or hi > x,
    ">=": lambda x, lo, hi: hi is None or hi >= x,
}

_EXACT = {
    "=": lambda v, x: v == x,
    "!=": lambda v, x: v != x,
    "<": lambda v, x: v < x,
    "<=": lambda v, x: v <= x,
    ">": lambda v, x: v > x,
    ">=": lambda v, x: v >= x,
}


class _FileView:
    """One file's skippable facts: exact partition values + stats."""

    __slots__ = ("pv", "stats", "types", "phys_of", "pcols")

    def __init__(self, pv, stats_json, types, phys_of, pcols):
        self.pv = pv
        self.types = types
        self.phys_of = phys_of
        self.pcols = pcols
        self.stats = None
        if stats_json:
            try:
                self.stats = json.loads(stats_json)
            except (ValueError, TypeError):
                self.stats = None

    def could_match(self, node) -> bool:
        kind = node[0]
        if kind == "and":
            return all(self.could_match(c) for c in node[1])
        if kind == "or":
            return any(self.could_match(c) for c in node[1])
        if kind == "true":
            return True
        col = node[2] if kind == "cmp" else node[1]
        dtype = self.types.get(col)
        if dtype is None:
            return True  # unknown column: residual filter decides
        phys = self.phys_of.get(col, col)
        if col in self.pcols:
            return self._on_partition(node, self.pv.get(phys), dtype)
        return self._on_stats(node, phys, dtype)

    # -- partition columns: the value is EXACT (protocol string) -----
    def _on_partition(self, node, raw, dtype) -> bool:
        kind = node[0]
        if raw is None:
            return kind == "null"
        if kind == "null":
            return False
        if kind == "notnull":
            return True
        try:
            v = _coerce(raw, dtype)
        except (ValueError, TypeError):
            return True
        if kind == "cmp":
            try:
                x = _coerce(node[3], dtype)
            except (ValueError, TypeError):
                return True
            if x is None:
                return False  # comparison with NULL is never TRUE
            return _EXACT[node[1]](v, x)
        lits = []
        for lit in node[2]:
            if lit is None:
                if kind == "notin":
                    return False  # NOT IN (..., NULL) is never TRUE
                continue
            try:
                lits.append(_coerce(lit, dtype))
            except (ValueError, TypeError):
                return True
        if kind == "in":
            return v in lits
        return v not in lits  # notin

    # -- data columns: bounds + null counts ---------------------------
    def _on_stats(self, node, phys, dtype) -> bool:
        st = self.stats
        if not st:
            return True
        n = st.get("numRecords")
        nc = (st.get("nullCount") or {}).get(phys)
        all_null = n is not None and nc is not None and nc == n
        kind = node[0]
        if kind == "null":
            return nc is None or nc > 0
        if kind == "notnull":
            return not all_null
        if all_null:
            return False  # no comparison/IN is TRUE on all-NULL
        try:
            lo = _coerce_bound((st.get("minValues") or {}).get(phys), dtype)
            hi = _coerce_bound((st.get("maxValues") or {}).get(phys), dtype)
        except (ValueError, TypeError):
            return True
        if kind == "cmp":
            try:
                x = _coerce(node[3], dtype)
            except (ValueError, TypeError):
                return True
            if x is None:
                return False
            return _CMP[node[1]](x, lo, hi)
        lits = []
        for lit in node[2]:
            if lit is None:
                if kind == "notin":
                    return False
                continue
            try:
                lits.append(_coerce(lit, dtype))
            except (ValueError, TypeError):
                return True
        if kind == "in":
            return any(_CMP["="](x, lo, hi) for x in lits)
        # notin: only skippable when the file is single-valued on a
        # listed value (then no non-null row differs, nulls never match)
        return not (lo is not None and lo == hi and lo in lits)


def matching_files(snap, where: str) -> set[str]:
    """Relative paths of ``snap``'s live files that COULD contain a
    row matching ``where`` — a sound superset; the caller re-applies
    ``where`` as a residual filter. Unsupported predicate shapes keep
    everything (len == len(snap.files))."""
    try:
        node = parse_predicate(where)
    except ValueError:
        return set(snap.files)
    types = {f.name: f.dataType for f in snap.schema.fields}
    meta_phys = {}
    for f in snap.schema.fields:
        meta = f.metadata or {}
        meta_phys[f.name] = meta.get(
            "delta.columnMapping.physicalName", f.name
        )
    pcols = set(snap.partition_columns)
    stats = snap.stats or {}
    kept: set[str] = set()
    for rel, pv in snap.files.items():
        view = _FileView(pv, stats.get(rel), types, meta_phys, pcols)
        if view.could_match(node):
            kept.add(rel)
    return kept
