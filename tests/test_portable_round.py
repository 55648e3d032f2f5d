"""Cross-engine fuzz of the portable rounding contract: pround must
produce IDENTICAL doubles in Spark and DuckDB for adversarial inputs
(exact .5 boundaries, money-like 2-decimal values, ULP neighbors,
negatives) — the class of values where native round() diverges.
"""

from __future__ import annotations

import math
import random

import duckdb

from spark_nifi_kafka_connected_device_stream_spark.functions.portable import (
    duck_pround,
    pround,
)


def _adversarial_values() -> list[float]:
    rng = random.Random(42)
    vals = []
    # exact cent boundaries and half-cent boundaries
    for _ in range(300):
        cents = rng.randint(-10_000_000, 10_000_000)
        vals.append(cents / 100.0)
        vals.append(cents / 100.0 + 0.005)
        vals.append(cents / 100.0 - 0.005)
    # ULP neighbors of boundaries
    for _ in range(200):
        x = rng.randint(0, 1_000_000) / 100.0 + 0.005
        vals.append(math.nextafter(x, math.inf))
        vals.append(math.nextafter(x, -math.inf))
    # products of 2-decimal money values (the q1/charge shape)
    for _ in range(300):
        a = rng.randint(100, 10_000_000) / 100.0
        b = 1.0 - rng.randint(0, 10) / 100.0
        c = 1.0 + rng.randint(0, 8) / 100.0
        vals.append(a * b * c)
    # plain randoms
    vals += [rng.uniform(-1e6, 1e6) for _ in range(200)]
    return vals


def test_pround_matches_duckdb_exactly(spark):
    import pyspark.sql.functions as F

    vals = _adversarial_values()
    for n in (2, 4, 6):
        sdf = spark.createDataFrame([(v,) for v in vals], "x double").select(
            pround(F.col("x"), n).alias("r")
        )
        spark_out = [r["r"] for r in sdf.collect()]
        duck_out = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {duck_pround('x', n)} FROM (SELECT unnest(?) AS x)", params=[vals]
            ).fetchall()
        ]
        assert len(spark_out) == len(duck_out)
        diffs = [
            (v, s, d)
            for v, s, d in zip(vals, spark_out, duck_out)
            if (s != d and not (s is None and d is None))
        ]
        assert not diffs, f"n={n}: {len(diffs)} diverging values, first: {diffs[:3]}"


def test_tokenize_normalize_matches_duckdb_exactly(spark):
    """Cross-engine fuzz of the tokenization contract: normalize_text +
    tokens (the base of every text/dedup operator) must produce
    IDENTICAL token arrays in Spark and DuckDB for adversarial strings
    — space runs, leading/trailing space, tabs/newlines (NOT collapsed
    by design: the contract collapses ' ' only), punctuation glued to
    words, unicode letters, case mixes, and empties."""
    import random
    import string

    import pyspark.sql.functions as F

    from spark_nifi_kafka_connected_device_stream_spark.functions.textfns import (
        normalize_text,
        tokens,
    )

    rng = random.Random(7)
    pieces = (
        list(string.ascii_letters)
        + ["  ", " ", "   ", ".", ",", "!", "-", "_", "é", "ß", "漢", "'"]
        + ["word", "WORD", "Wórd", "a.b", "x,y", ""]
    )
    vals = ["", " ", "   ", "\t", "a\tb", "a\nb"]
    for _ in range(500):
        vals.append("".join(rng.choice(pieces) for _ in range(rng.randint(0, 30))))

    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, text string"
    ).select("i", tokens(normalize_text(F.col("text"))).alias("tk"))
    got = {r["i"]: list(r["tk"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(vals)))
        + ") AS v(i, text)",
        vals,
    )
    duck = {
        i: tk
        for i, tk in con.execute(
            "SELECT i, list_filter(string_split(trim(regexp_replace("
            "lower(text), ' +', ' ', 'g')), ' '), t -> t <> '') FROM t"
        ).fetchall()
    }
    assert got == duck
