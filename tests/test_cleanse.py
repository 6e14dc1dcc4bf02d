"""Coercion edge cases from FIXTURES.md §3 — must be bit-exact with the
reference's Python semantics (stream_to_star.py:50-76)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdataflink_spark.functions import cleanse as C


def _eval(spark, col, rows, schema="x string"):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_to_int_safe_matches_python_int_float(spark):
    cases = ["4.0", "4.9", "-2.7", "", "abc", None, "1e3", "7"]

    def pint(x):
        try:
            return int(float(x))
        except (TypeError, ValueError):
            return None

    got = _eval(spark, C.to_int_safe("x"), [(c,) for c in cases])
    assert got == [pint(c) for c in cases]


def test_to_float_safe(spark):
    cases = ["3.5", "", "bad", None, "1e3", "-0.25"]

    def pfloat(x):
        try:
            return float(x)
        except (TypeError, ValueError):
            return None

    got = _eval(spark, C.to_float_safe("x"), [(c,) for c in cases])
    assert got == [pfloat(c) for c in cases]


def test_parse_date_multi_three_formats(spark):
    d = datetime.date(2021, 5, 14)
    cases = {
        "5/14/2021": d,
        "05/14/2021": d,
        "2021-05-14": d,
        "14.05.2021": d,
        "31/12/2021": None,  # matches no format -> NULL
        "": None,
        None: None,
    }
    got = _eval(spark, C.parse_date_multi("x"), [(k,) for k in cases])
    assert got == list(cases.values())


def test_clean_text_and_concat_name(spark):
    got = _eval(spark, C.clean_text("x"), [("  x  ",), ("   ",), ("",), (None,)])
    assert got == ["x", None, None, None]

    df = spark.createDataFrame(
        [("a", "b"), ("", "only"), ("first", None), (None, None)], "f string, l string"
    )
    got = [r[0] for r in df.select(C.concat_name("f", "l")).collect()]
    assert got == ["a b", "only", "first", None]


def test_default_zero_and_coalesce(spark):
    df = spark.createDataFrame([(None, None, "z"), (1, "a", "b")], "q int, a string, b string")
    rows = df.select(
        C.default_zero("q").alias("q"), C.coalesce_first("a", "b").alias("ab")
    ).collect()
    assert [(r.q, r.ab) for r in rows] == [(0, "z"), (1, "a")]


def test_json_round_trip(spark):
    df = spark.createDataFrame([(1, "x")], "id int, s string")
    j = df.select(C.to_json_row().alias("v"))
    back = j.select(C.from_json_map("v").alias("m")).select(F.col("m")["id"], F.col("m")["s"])
    assert back.collect()[0][0:2] == ("1", "x")
