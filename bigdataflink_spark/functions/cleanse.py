"""Column-expression cleanse/coercion library (SURVEY.md §2.2, §2.8).

Reproduces the reference's per-field coercion semantics bit-exactly,
as pure Catalyst ``Column`` expressions (JVM-side, whole-stage codegen
— never Python UDFs):

* ``to_int_safe``   — reference ``_to_int`` (`int(float(x))`:
  truncates decimals, None/"" → NULL, parse failure → NULL);
  /root/reference/flink/stream_to_star.py:61-67.
* ``to_float_safe`` — reference ``_to_float`` (`float(x)`, NULL on
  failure); stream_to_star.py:70-76.
* ``parse_date_multi`` — reference ``_parse_date`` cascade
  %m/%d/%Y → %Y-%m-%d → %d.%m.%Y, NULL on total failure;
  stream_to_star.py:50-58.
* ``clean_text``    — strip + empty→NULL; stream_to_star.py:104-109.
* ``concat_name``   — "first last" stripped, empty→NULL;
  stream_to_star.py:104-106,132-134.
* ``coalesce_first`` — first non-null across candidate source column
  names; stream_to_star.py:100,128,154,248.
* ``default_zero``  — fact-measure default (qty or 0);
  stream_to_star.py:252-253.
* ``date_parts``    — y/m/d extraction; stream_to_star.py:243.
* ``to_json_row`` / ``from_json_map`` — producer/consumer JSON
  round-trip; csv_to_kafka.py:19, stream_to_star.py:81.

All functions accept either a column name or a ``Column``.
"""

from __future__ import annotations

import unicodedata as _ud
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructType


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


@lru_cache(maxsize=1)
def _py_float_charmaps() -> tuple[str, str, str]:
    """Character maps reproducing CPython's float() pre-parse transform.

    CPython (PyFloat_FromString) first maps every Unicode decimal digit
    (category Nd) to its ASCII digit and every *non-ASCII* whitespace
    char to ' ', then strips ASCII whitespace [\\t\\n\\v\\f\\r ] only —
    so '\\x1c'-'\\x1f' (isspace() but ASCII) still make float() raise.
    Returns (nd_from, nd_to, ws) for two F.translate passes.
    """
    nd_from: list[str] = []
    nd_to: list[str] = []
    ws: list[str] = ["\t", "\n", "\x0b", "\x0c", "\r"]
    for cp in range(0x110000):
        ch = chr(cp)
        if _ud.category(ch) == "Nd":
            nd_from.append(ch)
            nd_to.append(str(_ud.decimal(ch)))
        elif cp > 0x7F and ch.isspace():
            ws.append(ch)
    return "".join(nd_from), "".join(nd_to), "".join(ws)


# Exact CPython float() grammar (post-transform): optional sign, then
# inf/infinity/nan (case-insensitive) or a decimal literal where '_' may
# only sit between digits; exponent applies to decimals only.
_PY_FLOAT_RE = (
    r"^[+-]?((?i:inf(inity)?|nan)"
    r"|((\d(_?\d)*)?\.\d(_?\d)*|\d(_?\d)*\.?)([eE][+-]?\d(_?\d)*)?)$"
)


def _py_float_literal(c: str | Column) -> Column:
    """Normalize a string to a Spark-castable float literal, NULL when
    CPython ``float()`` would raise.

    Spark's bare cast is far laxer than Python's float(): it trims ALL
    chars <= 0x20 (Python rejects '0\\x1f'), accepts Java-isms like
    '1d' / hex floats, but misses Unicode digits ('١٢٣'), non-ASCII
    spaces ('1\\xa0') and underscores ('1_0') that Python accepts. So:
    translate digits/spaces the way CPython does, trim, validate against
    the exact Python grammar, and drop the digit-group underscores.
    """
    nd_from, nd_to, ws = _py_float_charmaps()
    s = F.translate(F.translate(_col(c), nd_from, nd_to), ws, " " * len(ws))
    s = F.trim(s)
    return F.when(s.rlike(_PY_FLOAT_RE), F.regexp_replace(s, "_", ""))


def to_int_safe(c: str | Column) -> Column:
    """``int(float(x))`` semantics: "4.9" → 4, "" → NULL, "abc" → NULL.

    Parses with float()-parity (see _py_float_literal); floor/ceil
    reproduces Python int()'s truncation toward zero.
    """
    d = to_float_safe(c)
    # "nan"/"inf" parse as doubles, but the reference's int() raises on
    # non-finite values → NULL. Spark's non-ANSI cast would instead
    # yield 0 / Long.MaxValue — null them out explicitly.
    finite = F.when(
        ~(F.isnan(d) | (F.abs(d) == F.lit(float("inf")))), d
    )
    truncated = F.when(finite < 0, F.ceil(finite)).otherwise(F.floor(finite))
    return truncated.cast("long")


def to_float_safe(c: str | Column) -> Column:
    """``float(x)`` with NULL on failure ("" included) — bit-parity with
    the reference's bare ``float(x)`` (stream_to_star.py:70-76), i.e.
    CPython semantics, not Spark cast semantics."""
    return _py_float_literal(c).try_cast("double")


def parse_date_multi(c: str | Column) -> Column:
    """Try M/d/yyyy, then yyyy-MM-dd, then d.M.yyyy; NULL if none parse."""
    col = _col(c)
    return F.coalesce(
        F.try_to_date(col, "M/d/yyyy"),
        F.try_to_date(col, "yyyy-MM-dd"),
        F.try_to_date(col, "d.M.yyyy"),
    )


def clean_text(c: str | Column) -> Column:
    """strip(); empty string → NULL."""
    return F.nullif(F.trim(_col(c)), F.lit(""))


def concat_name(first: str | Column, last: str | Column) -> Column:
    """``f"{first} {last}".strip() or None`` — NULL-safe concat.

    concat_ws skips NULL inputs (like the reference's ``or ""``
    fallback), trim collapses the lone-separator case, empty → NULL.
    """
    return clean_text(F.concat_ws(" ", _col(first), _col(last)))


def coalesce_first(*candidates: str | Column) -> Column:
    """First non-null among candidate source columns (field probing)."""
    return F.coalesce(*[_col(c) for c in candidates])


def default_zero(c: str | Column) -> Column:
    """NULL → 0 measure default."""
    return F.coalesce(_col(c), F.lit(0))


def date_parts(c: str | Column) -> list[Column]:
    """[year, month, day] of a date column."""
    col = _col(c)
    return [
        F.year(col).alias("year"),
        F.month(col).alias("month"),
        F.dayofmonth(col).alias("day"),
    ]


def to_json_row(*cols: str) -> Column:
    """Serialize a whole row (or chosen columns) to a JSON string."""
    return F.to_json(F.struct(*cols)) if cols else F.to_json(F.struct("*"))


def from_json_map(c: str | Column, schema: StructType | None = None) -> Column:
    """JSON string → typed struct (or string map when schema unknown)."""
    target = schema if schema is not None else MapType(StringType(), StringType())
    return F.from_json(_col(c), target)
