"""Portable text primitives.

These are the building blocks of the text-analysis / dedup operators
(SURVEY.md §2.8).  Every primitive is chosen to be *engine-portable*:
it has an exact ANSI-SQL/DuckDB equivalent so the dedup and text
operators can be oracle-checked value-for-value.  In particular all
hashing goes through `md5` (hex string) — identical output in Spark,
DuckDB, and Python — rather than engine-private hash functions
(`xxhash64`/`hash` differ between engines).

All expressions are built from `pyspark.sql.functions` (JVM-side,
codegen'd) — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """lowercase + collapse SPACE runs (' +' — tabs/newlines are kept,
    deliberately matching the DuckDB twin; the fixtures are single-line
    space-separated text) + trim.

    DuckDB oracle: ``trim(regexp_replace(lower(x), ' +', ' ', 'g'))``.
    """
    return F.trim(F.regexp_replace(F.lower(col), " +", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped.

    DuckDB oracle: ``list_filter(string_split(x, ' '), t -> t <> '')``.
    """
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-word shingles (space-joined), the dedup unit for MinHash / Jaccard.

    `transform(sequence(...))` keeps this a single JVM-side expression —
    no shuffle, no Python.  Docs shorter than n words yield [].

    DuckDB oracle:
    ``list_transform(generate_series(1, greatest(len(toks)-{n-1}, 0)),
      i -> array_to_string(toks[i:i+{n-1}], ' '))``
    """
    return F.when(F.size(tokens_col) >= n, F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - n),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i + 1, n)),
    )).otherwise(F.array().cast("array<string>"))


def portable_md5(*cols: Column | str) -> Column:
    """md5 hex of the concatenation — the engine-portable hash.

    DuckDB oracle: ``md5(a || b || ...)``.

    Boundary hazard for MULTI-column fingerprints: the concatenation
    carries no separator, so ('ab','c') and ('a','bc') collide —
    callers hashing 2+ free-text columns must insert a delimiter on
    BOTH engine sides (concat_ws in Spark, ||'\x1f'|| in the oracle)
    or distinct records silently merge.  Single-column use (the only
    in-repo use) is unaffected.
    """
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat(*[p.cast("string") for p in parts]).cast("binary"))


def bigram_pairs(tokens_col: Column) -> Column:
    """Adjacent-token pairs as an array of (w1, w2) structs — ONE
    guarded JVM expression shared by every bigram operator (LM logprob,
    holdout perplexity, Kneser-Ney, cross-entropy).

    The `greatest(size-1, 0)` guard is load-bearing: documents with
    fewer than 2 tokens must yield [] — an unguarded
    `sequence(1, size-1)` DESCENDS for size<2 (Spark's default step is
    -1 when start>stop) and indexes out of bounds, which under this
    build's default ANSI mode aborts the whole job (r12 review: the one
    hand-rolled copy that skipped the guard was a live crash on any
    empty/one-word doc).

    DuckDB oracle twin:
    ``list_transform(generate_series(1, greatest(len(tk)-1, 0)),
      i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))``
    (generate_series(1,0) is empty in DuckDB, so the guard is only
    needed on the Spark side; keeping it in the twin documents intent).
    """
    n = F.greatest(F.size(tokens_col) - 1, F.lit(0))
    return F.arrays_zip(
        F.slice(tokens_col, 1, n).alias("w1"),
        F.slice(tokens_col, 2, n).alias("w2"),
    )


# The DuckDB twin of `tokens(normalize_text(text))` — the canonical
# oracle-side tokenizer fragment.  Lives HERE (no registration side
# effects) so every operator module aliases ONE definition instead of
# carrying byte-identical private copies that can drift (r12 review).
DUCK_TOKENS = (
    "list_filter(string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), "
    "' '), t -> t <> '')"
)
