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


def test_pround_saturation_bound(spark):
    """Pin the documented pround magnitude bound (portable.py:26-31):
    Spark's floor(double) goes through BIGINT and SATURATES at ±(2^63-1)
    while DuckDB's floor stays double — so parity holds below
    |x|·10^n < 2^63 and breaks above, with Spark emitting the saturated
    constant.  If the implementation ever changes (e.g. to a
    decimal-based floor), this test forces the docstring to follow."""
    import pyspark.sql.functions as F

    n = 2  # scale 100 → bound |x| < 2^63/100 ≈ 9.2233720368547758e16
    below = [9.0e16, 9.2e16, -9.2e16]          # inside the bound: exact
    above = [9.3e16, 1.0e17, -1.0e17, 1.0e20]  # past it: Spark saturates
    sat = float(2**63 - 1) / 100.0             # 9.223372036854776e16

    sdf = spark.createDataFrame(
        [(v,) for v in below + above], "x double"
    ).select("x", pround(F.col("x"), n).alias("r"))
    got = {r["x"]: r["r"] for r in sdf.collect()}

    for v in below:
        d = duckdb.sql(
            f"SELECT {duck_pround('x', n)} FROM (SELECT ? AS x)", params=[v]
        ).fetchone()[0]
        assert got[v] == d, f"below-bound divergence at {v}: spark={got[v]} duck={d}"
    for v in above:
        assert got[v] == (sat if v > 0 else -sat), (
            f"saturation contract changed at {v}: got {got[v]}, "
            f"expected ±{sat} — update portable.py's docstring bound"
        )
        d = duckdb.sql(
            f"SELECT {duck_pround('x', n)} FROM (SELECT ? AS x)", params=[v]
        ).fetchone()[0]
        assert got[v] != d, (
            f"past-bound value {v} unexpectedly MATCHES DuckDB — the "
            "documented saturation hazard no longer exists; update the "
            "portable.py docstring (and consider widening the contract)"
        )


def test_portable_md5_call_sites_are_single_column():
    """Enforce the portable_md5 contract (textfns.py docstring): the
    concatenation carries NO separator, so multi-column fingerprints
    over free text silently merge distinct records (('ab','c') ==
    ('a','bc')).  The docstring claims single-column use is the only
    in-repo use — this walks every call site in the package and tests
    with ast and FAILS if anyone passes 2+ arguments (or *args, which
    the analysis can't bound)."""
    import ast
    import pathlib

    import spark_nifi_kafka_connected_device_stream_spark as pkg

    roots = [
        pathlib.Path(pkg.__file__).parent,
        pathlib.Path(__file__).parent,
    ]
    offenders = []
    for root in roots:
        for py in root.rglob("*.py"):
            tree = ast.parse(py.read_text(), filename=str(py))
            for node in ast.walk(tree):
                if not isinstance(node, ast.Call):
                    continue
                fn = node.func
                name = fn.id if isinstance(fn, ast.Name) else (
                    fn.attr if isinstance(fn, ast.Attribute) else None
                )
                if name != "portable_md5":
                    continue
                starred = any(isinstance(a, ast.Starred) for a in node.args)
                if len(node.args) != 1 or starred or node.keywords:
                    offenders.append(f"{py}:{node.lineno}")
    assert not offenders, (
        "portable_md5 called with 2+ (or unbounded *) columns — the "
        "separator-free concatenation makes boundary collisions: use "
        "the delimiter pattern from the textfns.py docstring instead. "
        f"Sites: {offenders}"
    )


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


def test_pii_regex_matches_duckdb_exactly(spark):
    """Cross-engine fuzz of the PII patterns: Java regex (Spark) and
    RE2 (DuckDB) must agree on match COUNTS and on the REDACTED string
    for adversarial inputs — near-misses (no TLD, short id digits,
    uppercase local parts — the patterns are lowercase-only by
    contract), glued spans, span-at-start/end, and multiple spans."""
    import random

    import pyspark.sql.functions as F

    from spark_nifi_kafka_connected_device_stream_spark.operators.privacy import (
        _RE_EMAIL,
        _RE_IDTAG,
        _RE_PHONE,
    )

    rng = random.Random(13)
    spans = [
        "bob@mail-src1.example.com",
        "a@b.co",
        "x.y_z@host-9.example.org",
        "+1-555-0134",
        "ID-12345",
        "ID-999",
    ]
    near_misses = [
        "bob@mail",          # no TLD dot
        "@example.com",      # empty local part
        "BOB@EXAMPLE.COM",   # uppercase — outside the contract
        "+1-556-0134",       # wrong exchange
        "+1-555-013",        # 3 digits
        "ID-12",             # too few digits
        "id-12345",          # lowercase tag
        "user @example.com", # space splits the local part
    ]
    fillers = ["lorem", "ipsum", "data", " ", "  ", ".", ",", "--", "ID-", "@"]
    vals = []
    for _ in range(400):
        parts = []
        for _ in range(rng.randint(0, 12)):
            r = rng.random()
            if r < 0.25:
                parts.append(rng.choice(spans))
            elif r < 0.5:
                parts.append(rng.choice(near_misses))
            else:
                parts.append(rng.choice(fillers))
        vals.append(" ".join(parts))
    vals += ["", " ", "bob@mail-src1.example.com", "ID-123ID-456"]

    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, text string"
    ).select(
        "i",
        F.regexp_count("text", F.lit(_RE_EMAIL)).alias("ne"),
        F.regexp_count("text", F.lit(_RE_PHONE)).alias("np"),
        F.regexp_count("text", F.lit(_RE_IDTAG)).alias("ni"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", _RE_EMAIL, "[EMAIL]"),
                _RE_PHONE,
                "[PHONE]",
            ),
            _RE_IDTAG,
            "[ID]",
        ).alias("red"),
    )
    got = {r["i"]: (r["ne"], r["np"], r["ni"], r["red"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(vals)))
        + ") AS v(i, text)",
        vals,
    )
    duck = {
        i: (ne, np_, ni, red)
        for i, ne, np_, ni, red in con.execute(
            f"""
            SELECT i,
                   CAST(len(regexp_extract_all(text, '{_RE_EMAIL}')) AS INTEGER),
                   CAST(len(regexp_extract_all(text, '{_RE_PHONE}')) AS INTEGER),
                   CAST(len(regexp_extract_all(text, '{_RE_IDTAG}')) AS INTEGER),
                   regexp_replace(regexp_replace(regexp_replace(
                     text, '{_RE_EMAIL}', '[EMAIL]', 'g'),
                           '{_RE_PHONE}', '[PHONE]', 'g'),
                           '{_RE_IDTAG}', '[ID]',    'g')
            FROM t
            """
        ).fetchall()
    }
    diffs = {i: (got[i], duck[i]) for i in got if got[i] != duck[i]}
    assert not diffs, f"{len(diffs)} diverging rows, first: {list(diffs.items())[:3]}"


def test_ewma_recursion_matches_duckdb_exactly(spark):
    """Cross-engine fuzz of the EWMA recursion on synthetic series:
    the applyInPandas loop and the DuckDB recursive CTE must produce
    bit-identical doubles given bit-identical inputs — constant series,
    single points, sign flips, magnitude jumps (1e-2..1e6 cents), and
    many keys sharing the same hour labels."""
    import random

    from spark_nifi_kafka_connected_device_stream_spark.registry import all_specs

    rng = random.Random(29)
    rows = []
    for key in range(8):
        n = rng.choice([1, 2, 3, 50, 200])
        base = rng.choice([1, 100, 10_000, 100_000_000])
        for t in range(n):
            cents = rng.randint(-5 * base, 5 * base)
            if key == 0:
                cents = 4242  # constant series: ewma == x at every step
            hour = f"2024-01-{1 + t // 24:02d} {t % 24:02d}:00:00"
            rows.append((f"k{key}", hour, cents))

    import pandas as pd

    from spark_nifi_kafka_connected_device_stream_spark.operators.events_timeseries import (
        _ewma_group,
    )

    got = {}
    for key in sorted({r[0] for r in rows}):
        pdf = pd.DataFrame(
            [
                {"event_type": k, "hour": h, "x": c / 100.0}
                for (k, h, c) in rows
                if k == key
            ]
        )
        out = _ewma_group(pdf)
        for r in out.itertuples():
            got[(r.event_type, r.hour)] = r.ewma

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?, ?)" for _ in rows)
        + ") AS v(k, hour, cents)",
        [x for r in rows for x in r],
    )
    duck = {
        (k, h): e
        for k, h, e in con.execute(
            """
            WITH RECURSIVE seq AS (
              SELECT k, hour, cents / 100.0 AS x,
                     CAST(row_number() OVER (PARTITION BY k ORDER BY hour)
                          AS BIGINT) AS rn
              FROM s
            ), ew AS (
              SELECT k, hour, x, rn, x AS ewma FROM seq WHERE rn = 1
              UNION ALL
              SELECT q.k, q.hour, q.x, q.rn, 0.8 * e.ewma + 0.2 * q.x
              FROM ew e JOIN seq q ON q.k = e.k AND q.rn = e.rn + 1
            )
            SELECT k, hour, ewma FROM ew
            """
        ).fetchall()
    }
    assert got == duck  # bit-identical, no rounding applied


def test_weighted_median_udf_matches_definition():
    """Fuzz the grouped-agg weighted-median kernel against the brute
    definition (smallest x whose cumulative weight over ascending x
    reaches half the total) — duplicates merged, singletons, all-equal
    values, and weight ties landing exactly on the half boundary."""
    import random

    import pandas as pd

    from spark_nifi_kafka_connected_device_stream_spark.operators.udf_ops import (
        _weighted_median_udf,
    )

    kernel = _weighted_median_udf.func

    def brute(pairs):
        merged = {}
        for x, w in pairs:
            merged[x] = merged.get(x, 0) + w
        total = sum(merged.values())
        acc = 0
        for x in sorted(merged):
            acc += merged[x]
            if 2 * acc >= total:
                return x
        raise AssertionError("unreachable")

    rng = random.Random(71)
    cases = [
        [(5.0, 1.0)],
        [(1.0, 1.0), (2.0, 1.0)],          # tie: 2*1 >= 2 → lower = 1.0
        [(3.0, 2.0), (3.0, 5.0)],          # all-equal values
        [(1.0, 1.0), (2.0, 1.0), (3.0, 2.0)],  # boundary lands on 2.0
    ]
    for _ in range(300):
        n = rng.randint(1, 40)
        xs = [rng.choice([1.0, 2.5, 2.5, 7.0, rng.randint(1, 50) / 2.0]) for _ in range(n)]
        ws = [float(rng.randint(1, 9)) for _ in range(n)]
        cases.append(list(zip(xs, ws)))

    for pairs in cases:
        price = pd.Series([p for p, _ in pairs])
        qty = pd.Series([w for _, w in pairs])
        assert kernel(price, qty) == brute(pairs), pairs


def test_variant_extraction_matches_duckdb_json(spark):
    """Cross-engine fuzz of the VARIANT path (try_parse_json +
    try_variant_get) against DuckDB's json_valid + json_extract_string
    + try_cast on adversarial payloads: nesting, arrays, JSON nulls,
    absent keys, numeric strings (both engines cast-coerce), non-
    numeric strings (both engines null), int64-range values, unicode,
    and malformed JSON (whole row nulls out in both engines)."""
    import json as jsonlib
    import random

    import pyspark.sql.functions as F

    rng = random.Random(97)
    docs = []
    for _ in range(400):
        d = {}
        if rng.random() < 0.8:
            inner = {}
            if rng.random() < 0.7:
                inner["b"] = rng.choice(
                    [
                        rng.randint(-(2**40), 2**40),
                        str(rng.randint(0, 999)),
                        "xyz",
                        None,
                    ]
                )
            d["a"] = inner
        if rng.random() < 0.6:
            d["s"] = rng.choice(["hi", "", "é漢'", None, "line\nbreak"])
        if rng.random() < 0.5:
            d["arr"] = [rng.randint(0, 99) for _ in range(rng.randint(0, 3))]
        s = jsonlib.dumps(d)
        if rng.random() < 0.1:
            s = s[: rng.randint(0, max(1, len(s) - 1))]  # truncate → malformed
        docs.append(s)

    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, j string"
    ).select(
        "i",
        F.try_variant_get(F.try_parse_json("j"), "$.a.b", "long").alias("b"),
        F.try_variant_get(F.try_parse_json("j"), "$.s", "string").alias("s"),
        F.try_variant_get(F.try_parse_json("j"), "$.arr[0]", "long").alias("a0"),
    )
    got = {r["i"]: (r["b"], r["s"], r["a0"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(docs)))
        + ") AS v(i, j)",
        docs,
    )
    duck = {
        i: (b, s, a0)
        for i, b, s, a0 in con.execute(
            """
            SELECT i,
              CASE WHEN json_valid(j)
                   THEN try_cast(json_extract_string(j, '$.a.b') AS BIGINT) END,
              CASE WHEN json_valid(j)
                   THEN json_extract_string(j, '$.s') END,
              CASE WHEN json_valid(j)
                   THEN try_cast(json_extract_string(j, '$.arr[0]') AS BIGINT) END
            FROM t
            """
        ).fetchall()
    }
    diffs = {i: (got[i], duck[i], docs[i]) for i in got if got[i] != duck[i]}
    assert not diffs, f"{len(diffs)} diverging rows, first: {list(diffs.items())[:3]}"
