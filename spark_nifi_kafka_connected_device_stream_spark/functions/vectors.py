"""Vector math over `array<float>` embedding columns.

Used by the similarity-search operators (SURVEY.md §2.8).  Everything
is built from higher-order functions (`zip_with` + `aggregate`) so the
arithmetic runs JVM-side inside whole-stage codegen — no Python UDF,
no shuffle.  Elements are cast to double BEFORE any arithmetic so the
result is a left-to-right double fold, which the DuckDB oracle mirrors
with ``list_sum(list_transform(generate_series(1, len(a)), i ->
CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# DATA CONTRACT (r12 review): cosine expressions built from dot/l2_norm
# divide by ||a||*||b|| UNGUARDED — under this build's default ANSI
# mode a zero-norm vector aborts the query with DIVIDE_BY_ZERO, which
# is the intended posture (cosine is undefined for the zero vector;
# silently ranking it would corrupt top-k results).  Screen the corpus
# with operators/similarity.embedding_norm_stats first — see the
# similarity module docstring for the full contract.
#
# DATA CONTRACT (r16 review): NULL elements and length-mismatched
# pairs are likewise OUTSIDE the contract: Spark's fold NULL-poisons
# (acc + NULL = NULL → the row silently drops from any top-k) while
# DuckDB's list_sum SKIPS NULLs — the two engines would silently
# disagree.  embedding_dim_stats / embedding_norm_stats surface both
# defects (NULL dims and try_element_at on short vectors); screen
# before any similarity op, exactly like the zero-norm rule.
#
# PERF NOTE: cosine_similarity traverses both arrays three times (dot
# + two norms) — fine for bounded uses (the k-center coreset's K
# 1-row probes); in a pairwise HOT path precompute each side's norm
# once per VECTOR and divide the dot by the product, as every
# registered top-k operator does.
