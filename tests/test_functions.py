"""Unit tests for the scalar layer: hash keys (F1/F2 NULL propagation),
both genre-parse variants (F4/F5 equivalence), numeric parses."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from imdb_metacritic_data_warehouse_spark.functions import (
    explode_genres_json,
    explode_genres_split,
    hash_key,
    parse_digits_to_long,
    parse_duration_minutes,
    parse_year,
    strip_parens,
)


def test_hash_key_matches_postgres_md5(spark):
    df = spark.createDataFrame([("The Matrix", 136)], "movie_nm string, dur int")
    out = df.select(hash_key("movie_nm", "dur").alias("k")).collect()[0].k
    assert out == hashlib.md5(b"The Matrix136").hexdigest()


def test_hash_key_null_propagates(spark):
    df = spark.createDataFrame([("x", None), (None, 1), ("y", 2)], "a string, b int")
    keys = [r.k for r in df.select(hash_key("a", "b").alias("k")).collect()]
    assert keys[0] is None and keys[1] is None and keys[2] is not None


def test_genre_parse_variants_agree(spark):
    rows = [
        ("['Action', 'Sci-Fi']",),
        ("['Drama']",),
        ("[]",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "genres string")
    split_out = df.select(
        F.explode(explode_genres_split(F.col("genres"))).alias("g")
    ).collect()
    json_out = df.select(
        F.explode(explode_genres_json(F.col("genres"))).alias("g")
    ).collect()
    assert sorted(r.g for r in split_out) == sorted(r.g for r in json_out)
    assert sorted(r.g for r in split_out) == ["Action", "Drama", "Sci-Fi"]


def test_numeric_parses(spark):
    df = spark.createDataFrame(
        [("$63,000,000", "2 hours 16 minutes", "I. 1999: part", "(uncredited)")],
        "b string, d string, y string, p string",
    )
    r = df.select(
        parse_digits_to_long(F.col("b")).alias("b"),
        parse_duration_minutes(F.col("d")).alias("d"),
        parse_year(F.col("y")).alias("y"),
        strip_parens(F.col("p")).alias("p"),
    ).collect()[0]
    assert (r.b, r.d, r.y, r.p) == (63000000, 136, 1999, "uncredited")


def test_empty_budget_casts_null_not_crash(spark):
    # the reference would crash on ''::bigint; we document NULL (SURVEY §7.4)
    df = spark.createDataFrame([("",), ("185000000",)], "budget string")
    vals = [r.v for r in df.select(F.col("budget").cast("bigint").alias("v")).collect()]
    assert vals == [None, 185000000]
