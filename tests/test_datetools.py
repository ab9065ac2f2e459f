"""DateTools analog (document/DateTools.java) — sortable-string
round-trips, resolution truncation, and string-range filtering."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lucene_spark import datetools as DT

TS = [
    dt.datetime(2024, 1, 5, 13, 45, 27, 123000),
    dt.datetime(2024, 1, 5, 23, 59, 59, 999000),
    dt.datetime(2024, 2, 29, 0, 0, 0),
    dt.datetime(1999, 12, 31, 23, 0, 1),
]


def _df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TS)], ["i", "ts"])


def test_date_to_string_resolutions(spark):
    df = _df(spark)
    got = df.select(
        "i",
        DT.date_to_string(F.col("ts"), "year").alias("y"),
        DT.date_to_string(F.col("ts"), "day").alias("d"),
        DT.date_to_string(F.col("ts"), "second").alias("s"),
        DT.date_to_string(F.col("ts"), "millisecond").alias("ms"),
    ).collect()
    by_i = {r["i"]: r for r in got}
    assert by_i[0]["y"] == "2024"
    assert by_i[0]["d"] == "20240105"
    assert by_i[0]["s"] == "20240105134527"
    assert by_i[0]["ms"] == "20240105134527123"
    assert by_i[2]["d"] == "20240229"  # leap day
    assert by_i[3]["d"] == "19991231"
    # sortable: string order == time order
    days = [r["ms"] for r in sorted(got, key=lambda r: TS[r["i"]])]
    assert days == sorted(days)


def test_string_round_trip_and_round(spark):
    df = _df(spark)
    rt = df.select(
        "i",
        DT.string_to_date(
            DT.date_to_string(F.col("ts"), "day"), "day"
        ).alias("back"),
        DT.round_date(F.col("ts"), "day").alias("rounded"),
    ).collect()
    for r in rt:
        assert r["back"] == r["rounded"]
        want = TS[r["i"]].replace(hour=0, minute=0, second=0, microsecond=0)
        assert r["rounded"] == want


def test_string_range_is_date_range(spark):
    df = _df(spark)
    day = DT.date_to_string(F.col("ts"), "day")
    got = {
        r["i"]
        for r in df.filter(day.between("20240101", "20240131")).collect()
    }
    assert got == {0, 1}
