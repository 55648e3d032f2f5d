"""Privacy / compliance operators over `events` (SURVEY.md §2.8
extension tier).

A training-data pipeline that ingests user interaction streams (the
reference's product-view firehose, v1:15-20) cannot ship raw user ids
into a training corpus.  This module provides the two standard
engine-side controls:

- **pseudonymization**: salted SHA-256 of the user id.  Deterministic
  (joinable across tables and runs — the property that makes
  pseudonymized analytics work) but not reversible without the salt.
  The salt is a compile-time constant here; in production it comes
  from a secret store and rotating it severs all linkage at once.
- **k-anonymity audit**: group sizes over the quasi-identifier
  columns an adversary could join on (event type × hour-of-day).
  Groups with fewer than K distinct users are flagged for
  suppression before release — the classic Sweeney k-anonymity gate.

The right-to-be-forgotten scan lives in
`curation.events_erasure_impact`; together the three form the
privacy tier.

Scale notes (the 100 TB plans): pseudonymization is map-only column
math (sha2 is JVM-side, codegen'd) followed by ONE grouped agg with
map-side partial combine on the pseudonym — the same shuffle any
per-user rollup pays.  The k-anonymity audit aggregates to
|event_types| × 24 groups: count_distinct(user_id) shuffles on the
tiny QI key space, and the skew that implies at 100 TB is exactly
what the salted two-phase aggregate in functions/scale.py exists
for (distinct-count form: dedup (qi, user) first — that first
dedup carries the salt-free key but (qi, user) is high-cardinality,
so it spreads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import duck_u32, pround, spark_u32
from ..registry import register
from ..sources.catalog import load_table

# compile-time stand-in for a secret-store salt; rotating it severs
# every pseudonym linkage at once (GDPR art.4(5) pseudonymization)
_SALT = "pepper-v1:"

K_ANONYMITY = 5


@register(
    "privacy_pseudonymize_events",
    oracle=f"""
    SELECT sha256('{_SALT}' || CAST(user_id AS VARCHAR)) AS user_pseudo,
           CAST(count(*) AS BIGINT)                      AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT)    AS n_event_types,
           CAST(min(event_id) AS BIGINT)                 AS first_event,
           CAST(max(event_id) AS BIGINT)                 AS last_event
    FROM events
    GROUP BY user_pseudo
    """,
    doc="Salted-hash pseudonymization + per-pseudonym activity summary: "
        "user_id never appears in the output, but the pseudonym is "
        "deterministic so downstream tables pseudonymized with the same "
        "salt stay joinable.  sha2(256) is JVM-side column math fused "
        "into the scan; the rollup is one grouped agg on the pseudonym "
        "with map-side combine — at 100 TB this is the cheapest shape a "
        "per-user pass can take.  Cites reference v1:15-20 (userid in "
        "the wire schema) — the field this control exists for.",
    tags=("privacy", "events"),
)
def privacy_pseudonymize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pseudo = F.sha2(
        F.concat(F.lit(_SALT), F.col("user_id").cast("string")), 256
    )
    return (
        e.select(pseudo.alias("user_pseudo"), "event_type", "event_id")
        .groupBy("user_pseudo")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.min("event_id").cast("bigint").alias("first_event"),
            F.max("event_id").cast("bigint").alias("last_event"),
        )
    )


@register(
    "privacy_k_anonymity_report",
    oracle=f"""
    SELECT event_type,
           CAST(hour(ts) AS INTEGER)               AS hour_of_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT)                AS n_rows,
           count(DISTINCT user_id) < {K_ANONYMITY} AS suppress
    FROM events
    GROUP BY event_type, hour_of_day
    """,
    doc=f"k-anonymity audit (k={K_ANONYMITY}) over the quasi-identifier "
        f"pair (event_type, hour-of-day): releasing per-group rows where "
        f"fewer than k distinct users share the QI values would let an "
        f"adversary re-identify them, so those groups are flagged for "
        f"suppression.  One distinct-count aggregate over a bounded QI "
        f"key space (|types|×24 groups); Spark runs it as expand + "
        f"two-phase agg, so the per-group distinct state is partial-"
        f"aggregated map-side before the tiny final shuffle.",
    tags=("privacy", "events"),
)
def privacy_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.hour("ts").cast("int").alias("hour_of_day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "event_type",
            "hour_of_day",
            "n_users",
            "n_rows",
            (F.col("n_users") < F.lit(K_ANONYMITY)).alias("suppress"),
        )
    )


# Portable regexes (Java regex AND RE2 — no lookaround/backrefs):
_RE_EMAIL = "[a-z0-9._]+@[a-z0-9-]+\\.[a-z]{2,}"
_RE_PHONE = "\\+1-555-[0-9]{4}"
_RE_IDTAG = "ID-[0-9]{3,}"


def pii_counts(col):
    """Per-span-class PII match counts — the SAME three portable
    regexes for the batch scan and the streaming gate (a gate that
    drifts from its audit is worse than no gate)."""
    return (
        F.regexp_count(col, F.lit(_RE_EMAIL)),
        F.regexp_count(col, F.lit(_RE_PHONE)),
        F.regexp_count(col, F.lit(_RE_IDTAG)),
    )


def pii_redact(col):
    """Placeholder redaction, fused into whatever scan carries it."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, _RE_EMAIL, "[EMAIL]"),
            _RE_PHONE,
            "[PHONE]",
        ),
        _RE_IDTAG,
        "[ID]",
    )


def _aug_pii_text():
    """Deterministic PII-injection expression shared by the scan and the
    gate twin: the synthetic corpus carries no PII (no digits or '@'
    anywhere at any SF), so both engines append the SAME contact line
    to 2 of every 3 docs — the machinery under test sees realistic
    spans either way.  The oracle-side SQL form lives in
    `_DUCK_AUG_PII` below; they must change together."""
    return F.when(F.col("doc_id") % 3 == 0, F.col("text")).otherwise(
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail-"),
            F.col("source"),
            F.lit(".example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ref ID-"),
            ((F.col("doc_id") * 7919) % 100000).cast("string"),
        )
    )


_DUCK_AUG_PII = """CASE WHEN doc_id % 3 = 0 THEN text
                  ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail-' || source || '.example.com or +1-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' ref ID-' || CAST((doc_id * 7919) % 100000 AS VARCHAR)
             END"""


@register(
    "privacy_pii_scan_documents",
    oracle=f"""
    WITH aug AS (
      -- The synthetic corpus carries no PII (no digits or '@' anywhere
      -- at any SF), so both engines append the SAME deterministic
      -- contact line to 2 of every 3 docs; the op under test is the
      -- detect+redact machinery, which sees realistic spans either way.
      SELECT doc_id, source, {_DUCK_AUG_PII} AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_RE_EMAIL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_RE_PHONE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_RE_IDTAG}')) AS INTEGER) AS n_ids,
           len(regexp_extract_all(text, '{_RE_EMAIL}')) = 0
             AND len(regexp_extract_all(text, '{_RE_PHONE}')) = 0
             AND len(regexp_extract_all(text, '{_RE_IDTAG}')) = 0 AS clean,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(
                  text, '{_RE_EMAIL}', '[EMAIL]', 'g'),
                        '{_RE_PHONE}', '[PHONE]', 'g'),
                        '{_RE_IDTAG}', '[ID]',    'g'))
                AS INTEGER)                                             AS redacted_len
    FROM aug
    """,
    doc="PII span detection + redaction over the document corpus — the "
        "release gate a training-data pipeline runs before any corpus "
        "leaves the boundary: count email / phone / id-tag spans per "
        "document, flag clean docs, and emit the redacted length (the "
        "redaction itself is regexp_replace to typed placeholders, so "
        "downstream token counts stay meaningful).  Patterns are "
        "restricted to the Java-regex/RE2 common subset (no lookaround, "
        "no backreferences) so the scan is portable across engines.  "
        "Map-only column math fused into the parquet scan — embarrassingly "
        "parallel at any corpus size; composes with "
        "privacy_pseudonymize_events and the k-anonymity audit as the "
        "document-side member of the privacy tier.",
    tags=("privacy", "text"),
)
def privacy_pii_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", _aug_pii_text().alias("text"))
    n_emails, n_phones, n_ids = pii_counts(F.col("text"))
    redacted = pii_redact(F.col("text"))
    return t.select(
        "doc_id",
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        n_ids.cast("int").alias("n_ids"),
        ((n_emails == 0) & (n_phones == 0) & (n_ids == 0)).alias("clean"),
        F.length(redacted).cast("int").alias("redacted_len"),
    )


@register(
    "privacy_pii_gate_batch",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, source, {_DUCK_AUG_PII} AS text
      FROM documents
    ), scanned AS (
      SELECT source,
             len(regexp_extract_all(text, '{_RE_EMAIL}')) AS n_emails,
             len(regexp_extract_all(text, '{_RE_PHONE}')) AS n_phones,
             len(regexp_extract_all(text, '{_RE_IDTAG}')) AS n_ids,
             length(text) AS raw_len,
             length(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_RE_EMAIL}', '[EMAIL]', 'g'),
                       '{_RE_PHONE}', '[PHONE]', 'g'),
                       '{_RE_IDTAG}', '[ID]',    'g')) AS redacted_len
      FROM aug
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE n_emails > 0 OR n_phones > 0
                                    OR n_ids > 0) AS BIGINT) AS n_quarantined,
           CAST(sum(n_emails) AS BIGINT)                AS total_emails,
           CAST(sum(n_phones) AS BIGINT)                AS total_phones,
           CAST(sum(n_ids) AS BIGINT)                   AS total_ids,
           CAST(sum(raw_len - redacted_len) AS BIGINT)  AS chars_redacted,
           CAST(sum(redacted_len) AS BIGINT)            AS corpus_chars
    FROM scanned GROUP BY source
    """,
    doc="Batch twin of streaming/jobs.py run_pii_gate_job: the SAME "
        "pii_counts detection and pii_redact redaction expressions the "
        "live dual-sink gate applies, rolled up per source into the "
        "release-review summary: corpus size, quarantine volume, span "
        "counts per PII class, and how many characters redaction "
        "removed (the audit number proving raw spans never reached the "
        "corpus sink).  Uses the scan query's deterministic PII "
        "injection (_aug_pii_text) since the synthetic corpus is "
        "PII-free.  Scale: map-only regex column math fused into the "
        "scan, then ONE per-source grouped agg with map-side combine — "
        "the cheapest shape a corpus-wide compliance pass can take.",
    tags=("privacy", "text"),
)
def privacy_pii_gate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("source", _aug_pii_text().alias("text"))
    n_em, n_ph, n_id = pii_counts(F.col("text"))
    scanned = t.select(
        "source",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        n_id.alias("n_ids"),
        F.length("text").alias("raw_len"),
        F.length(pii_redact(F.col("text"))).alias("redacted_len"),
    )
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(
            F.when(
                (F.col("n_emails") > 0)
                | (F.col("n_phones") > 0)
                | (F.col("n_ids") > 0),
                1,
            )
        ).cast("bigint").alias("n_quarantined"),
        F.sum("n_emails").cast("bigint").alias("total_emails"),
        F.sum("n_phones").cast("bigint").alias("total_phones"),
        F.sum("n_ids").cast("bigint").alias("total_ids"),
        F.sum(F.col("raw_len") - F.col("redacted_len"))
        .cast("bigint")
        .alias("chars_redacted"),
        F.sum("redacted_len").cast("bigint").alias("corpus_chars"),
    )


L_DIVERSITY = 3


@register(
    "privacy_l_diversity_report",
    oracle=f"""
    SELECT CAST(isodow(ts) AS INTEGER)                AS dow,
           CAST(hour(ts) AS INTEGER)                  AS hour_of_day,
           CAST(count(*) AS BIGINT)                   AS n_rows,
           CAST(count(DISTINCT event_type) AS BIGINT) AS l_distinct,
           count(DISTINCT event_type) >= {L_DIVERSITY} AS diverse
    FROM events
    GROUP BY dow, hour_of_day
    """,
    doc=f"l-diversity audit (l={L_DIVERSITY}) — the attribute-disclosure "
        f"complement of the k-anonymity report: a quasi-identifier "
        f"group (ISO day-of-week, hour-of-day) can satisfy k-anonymity "
        f"yet still leak the sensitive attribute if (almost) every row "
        f"in it shares one event_type; groups with fewer than l "
        f"distinct sensitive values are flagged.  Same bounded-QI "
        f"shape as the k-anonymity audit: one distinct-count aggregate "
        f"over ≤168 cells, two-phase with map-side partials.  "
        f"ISO dow from wall time (weekday()+1 = isodow), tz-stable.",
    tags=("privacy", "events"),
)
def privacy_l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("event_type").cast("bigint").alias("l_distinct"),
        )
        .select(
            "dow",
            "hour_of_day",
            "n_rows",
            "l_distinct",
            (F.col("l_distinct") >= F.lit(L_DIVERSITY)).alias("diverse"),
        )
    )


T_CLOSENESS_T = 0.2


@register(
    "privacy_t_closeness_report",
    oracle=f"""
    WITH cell AS (
      SELECT CAST(isodow(ts) AS INTEGER) AS dow,
             CAST(hour(ts) AS INTEGER)   AS hour_of_day,
             event_type,
             CAST(count(*) AS BIGINT)    AS c
      FROM events
      GROUP BY dow, hour_of_day, event_type
    ), grp AS (
      SELECT dow, hour_of_day, CAST(sum(c) AS BIGINT) AS n_g
      FROM cell GROUP BY dow, hour_of_day
    ), typ AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS c_t
      FROM cell GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n FROM cell
    ), agg AS (
      SELECT g.dow, g.hour_of_day, g.n_g, t2.n,
             CAST(sum(abs(c.c * t2.n - t.c_t * g.n_g)) AS BIGINT) AS part1,
             CAST(sum(t.c_t) AS BIGINT) AS ct_present
      FROM cell c
      JOIN grp g USING (dow, hour_of_day)
      JOIN typ t USING (event_type)
      CROSS JOIN tot t2
      GROUP BY g.dow, g.hour_of_day, g.n_g, t2.n
    )
    SELECT dow, hour_of_day, n_g AS n_rows,
           floor(((part1 + (n - ct_present) * n_g)
                  / (2.0 * n_g * n)) * 1000000.0 + 0.5) / 1000000.0 AS tvd,
           (part1 + (n - ct_present) * n_g) * 1.0
             > {T_CLOSENESS_T} * (2.0 * n_g * n) AS violates
    FROM agg
    """,
    doc=f"t-closeness audit (t={T_CLOSENESS_T}) — the third rung of the "
        f"privacy ladder after k-anonymity and l-diversity: a QI group "
        f"(ISO dow, hour) can be k-anonymous AND l-diverse yet still "
        f"leak if its SENSITIVE-VALUE DISTRIBUTION (event_type) skews "
        f"far from the corpus-wide one.  Distance is total variation "
        f"(the equal-ground-distance EMD for categoricals): "
        f"tvd = sum_t |c_gt*N - C_t*n_g| / (2*n_g*N), where types "
        f"ABSENT from the group contribute C_t*n_g — folded in exactly "
        f"as (N - sum_present C_t)*n_g, no type x group grid "
        f"materialized.  Scale shape: ONE corpus agg to "
        f"(dow,hour,type) cells (<=168*|types| rows), margins derived "
        f"from the cells and broadcast; exact int64 cross-products "
        f"(headroom to N~3e9 rows since c*N <= N^2; decimal(38,0) "
        f"swap beyond, warehouse.py:203 pattern), ONE double division "
        f"per group at the end.  The violate flag compares the exact "
        f"integer numerator against t scaled by the exact denominator "
        f"— no rounded intermediate feeds the decision.",
    tags=("privacy", "events", "stats"),
)
def privacy_t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cell = (
        e.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    grp = cell.groupBy("dow", "hour_of_day").agg(
        F.sum("c").cast("bigint").alias("n_g")
    )
    typ = cell.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("c_t"))
    tot = cell.agg(F.sum("c").cast("bigint").alias("n"))
    num = F.col("part1") + (F.col("n") - F.col("ct_present")) * F.col("n_g")
    den = F.lit(2.0) * F.col("n_g") * F.col("n")
    return (
        cell.join(F.broadcast(grp), ["dow", "hour_of_day"])
        .join(F.broadcast(typ), "event_type")
        .crossJoin(F.broadcast(tot))
        .groupBy("dow", "hour_of_day", "n_g", "n")
        .agg(
            F.sum(F.abs(F.col("c") * F.col("n") - F.col("c_t") * F.col("n_g")))
            .cast("bigint")
            .alias("part1"),
            F.sum("c_t").cast("bigint").alias("ct_present"),
        )
        .select(
            "dow",
            "hour_of_day",
            F.col("n_g").alias("n_rows"),
            pround(num / den, 6).alias("tvd"),
            (num * F.lit(1.0) > F.lit(T_CLOSENESS_T) * den).alias("violates"),
        )
    )


@register(
    "privacy_sensitivity_report",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_u
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(sum(n_u) AS BIGINT)   AS n_rows,
           CAST(count(*) AS BIGINT)   AS n_users,
           CAST(max(n_u) AS BIGINT)   AS l1_sensitivity,
           floor((CAST(max(n_u) AS BIGINT) * 1.0 / CAST(sum(n_u) AS BIGINT))
                 * 1000000.0 + 0.5) / 1000000.0 AS max_user_share
    FROM per_user
    GROUP BY event_type
    """,
    doc="Differential-privacy PREP: the L1 sensitivity of per-type "
        "count releases — the maximum number of rows any single user "
        "contributes, which is exactly the noise scale a Laplace "
        "mechanism must calibrate to (and the contribution-capping "
        "threshold a DP pipeline clips at before aggregating).  "
        "Complements the k-anonymity / l-diversity / t-closeness audit "
        "ladder with the quantitative release-calibration number; the "
        "max-user-share column is the skew flag (one device dominating "
        "a 'per-type count' makes that release fragile regardless of "
        "epsilon).  Deterministic by construction — the DP noise "
        "itself is random and is NOT modeled here.  Scale shape: one "
        "(type, user) partial-agg shuffle, then a |types|-row rollup; "
        "exact int64 counts, one final double division.",
    tags=("privacy", "events"),
)
def privacy_sensitivity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = _per_user_counts(e)
    return per_user.groupBy("event_type").agg(
        F.sum("n_u").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.max("n_u").cast("bigint").alias("l1_sensitivity"),
        pround(F.max("n_u") * F.lit(1.0) / F.sum("n_u"), 6).alias("max_user_share"),
    )


def _spark_u01(seed_col) -> "F.Column":
    """md5-derived uniform in (0,1): (u32 + 0.5) / 2^32 — the ONE
    construction every DP release uses (round-16 review: six inline
    copies invited drift)."""
    return (spark_u32(seed_col) + F.lit(0.5)) / F.lit(4294967296.0)


def _spark_laplace(u, b: float) -> "F.Column":
    """Laplace(0, b) noise via the inverse CDF on a uniform `u` — the
    ONE implementation shared by every DP release (round-16 review:
    four inline copies; a sign/branch fix must hit all releases at
    once).  Mirrors the oracle's CASE WHEN u >= 0.5 form exactly."""
    return F.when(
        u >= 0.5, F.lit(-b) * F.log(F.lit(1.0) - F.lit(2.0) * (u - F.lit(0.5)))
    ).otherwise(F.lit(b) * F.log(F.lit(1.0) - F.lit(2.0) * (F.lit(0.5) - u)))


def _per_user_counts(e: DataFrame) -> DataFrame:
    """(event_type, user_id) contribution counts — shared by the
    sensitivity report and the Laplace release it calibrates, so the
    two can never silently diverge (round-16 review)."""
    return e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_u")
    )


# --- round 11: the DP release itself --------------------------------------
# contribution cap (= the calibrated L1 sensitivity after clamping) and
# the Laplace scale b = cap / epsilon, pre-folded to single literals
_DP_CAP = 5
_DP_EPSILON = 1.0
# COMPUTED at import, not hand-folded (round-16 review: a hand-folded
# copy goes stale when the cap/epsilon change and the release would
# noise at the wrong scale while reporting the new epsilon); the
# f-string interpolation folds the identical float literal into the
# oracle, so cross-engine folding is unchanged.
_DP_B = _DP_CAP / _DP_EPSILON





@register(
    "privacy_dp_laplace_counts",
    oracle=f"""
    WITH per_user AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_u
      FROM events GROUP BY event_type, user_id
    ), rel AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)  AS n_users,
             CAST(sum(n_u) AS BIGINT)  AS true_count,
             CAST(sum(least(n_u, {_DP_CAP})) AS BIGINT) AS clamped_count
      FROM per_user GROUP BY event_type
    ), noised AS (
      SELECT *,
             ({duck_u32("'dp_' || event_type")} + 0.5) / 4294967296.0 AS u
      FROM rel
    )
    SELECT event_type, n_users, true_count, clamped_count,
           CAST({_DP_EPSILON} AS DOUBLE) AS epsilon,
           CAST({_DP_CAP} AS BIGINT) AS sensitivity_cap,
           floor((clamped_count
                  + CASE WHEN u >= 0.5
                         THEN -{_DP_B} * ln(1.0 - 2.0 * (u - 0.5))
                         ELSE  {_DP_B} * ln(1.0 - 2.0 * (0.5 - u))
                    END) * 1000000.0 + 0.5) / 1000000.0 AS noisy_count
    FROM noised
    """,
    doc="The differentially-private count release the sensitivity "
        "report calibrates: per-user contributions CLAMPED to the cap "
        "(bounding L1 sensitivity by construction, the standard "
        "user-level-DP preprocessing), then Laplace(cap/epsilon) noise "
        "added via the inverse CDF, noise = -b*sign(u-1/2)*"
        "ln(1-2|u-1/2|).  The uniform u is the md5-derived u32 per "
        "release key (the Poisson-bootstrap determinism pattern), so "
        "this models the MECHANISM exactly while keeping the "
        "oracle-checkable determinism the real release would get from "
        "a secure RNG — swap the hash for the RNG and epsilon "
        "bookkeeping is unchanged.  Reports true vs clamped vs noisy "
        "so the clipping bias and noise magnitude are both visible.  "
        "Scale shape: one (type,user) partial agg, a |types|-row "
        "release table, per-row noise arithmetic on exact ints — both "
        "engines take ln() of identical doubles.",
    tags=("privacy", "events"),
)
def privacy_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = _per_user_counts(e)
    rel = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_u").cast("bigint").alias("true_count"),
        F.sum(F.least(F.col("n_u"), F.lit(_DP_CAP))).cast("bigint").alias(
            "clamped_count"
        ),
    )
    noise = _spark_laplace(_spark_u01(F.concat(F.lit("dp_"), F.col("event_type"))), _DP_B)
    return rel.select(
        "event_type",
        "n_users",
        "true_count",
        "clamped_count",
        F.lit(_DP_EPSILON).alias("epsilon"),
        F.lit(_DP_CAP).cast("bigint").alias("sensitivity_cap"),
        pround(F.col("clamped_count") + noise, 6).alias("noisy_count"),
    )


# --- round 12 additions: the DP-histogram release + generalization ladder --


@register(
    "privacy_dp_histogram",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT CAST(floor(value / 50.0) AS BIGINT) AS bucket, user_id
      FROM events WHERE value IS NOT NULL
    ), rel AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS true_count
      FROM b GROUP BY bucket
    ), noised AS (
      SELECT *,
             ({duck_u32("'dph_' || CAST(bucket AS VARCHAR)")} + 0.5)
               / 4294967296.0 AS u
      FROM rel
    )
    SELECT bucket, true_count,
           CAST({_DP_EPSILON} AS DOUBLE) AS epsilon,
           floor((true_count
                  + CASE WHEN u >= 0.5
                         THEN -{1.0 / _DP_EPSILON} * ln(1.0 - 2.0 * (u - 0.5))
                         ELSE  {1.0 / _DP_EPSILON} * ln(1.0 - 2.0 * (0.5 - u))
                    END) * 1000000.0 + 0.5) / 1000000.0 AS noisy_count
    FROM noised
    """,
    doc="The differentially-private HISTOGRAM release — the twin of "
        "privacy_dp_laplace_counts for distributions instead of "
        "per-type totals: `value` bucketed at width 50, each user's "
        "contribution per bucket capped at 1 by a (bucket, user) "
        "DISTINCT (so the release counts USERS per bucket and a "
        "histogram query has L1 sensitivity 1 per bucket; a user "
        "appearing in k buckets costs k — the documented composition, "
        "bounded by |buckets|), then Laplace(1/epsilon) noise via the "
        "same deterministic inverse-CDF uniform (md5-keyed per bucket) "
        "as the counts release.  Only OBSERVED buckets are released — "
        "a production release over a public bucket grid would add "
        "noise to empty buckets too (documented, needs no data).  "
        "Scale shape: one (bucket, user) dedupe shuffle, a "
        "|buckets|-row release table, per-row noise arithmetic.",
    tags=("privacy", "events"),
)
def privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b = (
        e.filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") / F.lit(50.0)).cast("bigint").alias("bucket"),
            "user_id",
        )
        .distinct()
    )
    rel = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    noise = _spark_laplace(
        _spark_u01(F.concat(F.lit("dph_"), F.col("bucket").cast("string"))),
        1.0 / _DP_EPSILON,
    )
    return rel.select(
        "bucket",
        "true_count",
        F.lit(_DP_EPSILON).alias("epsilon"),
        pround(F.col("true_count") + noise, 6).alias("noisy_count"),
    )


@register(
    "privacy_k_anonymity_generalization",
    oracle=f"""
    WITH base AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
      FROM customer
    ), lv AS (
      SELECT 0 AS level, seg, CAST(nat AS BIGINT) AS nat, bal_band FROM base
      UNION ALL
      SELECT 1, seg, CAST(nat AS BIGINT), CAST(NULL AS BIGINT) FROM base
      UNION ALL
      SELECT 2, seg, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM base
    ), grp AS (
      SELECT level, CAST(count(*) AS BIGINT) AS grp_n
      FROM lv GROUP BY level, seg, nat, bal_band
    )
    SELECT level,
           CAST(count(*) AS BIGINT)  AS n_groups,
           CAST(min(grp_n) AS BIGINT) AS k_min,
           CAST(sum(CASE WHEN grp_n < {K_ANONYMITY} THEN grp_n ELSE 0 END)
                AS BIGINT)            AS rows_suppressed,
           floor((sum(CASE WHEN grp_n < {K_ANONYMITY} THEN grp_n ELSE 0 END)
                  * 1.0 / sum(grp_n)) * 1000000.0 + 0.5) / 1000000.0
                                      AS suppression_rate
    FROM grp GROUP BY level
    """,
    doc="The k-anonymity GENERALIZATION LADDER — not just the audit "
        "(privacy_k_anonymity_report) but the decision table: quasi-"
        "identifiers (segment, nation, $1000 balance band) generalized "
        "level by level (L0 full QI, L1 drops the balance band, L2 "
        "keeps only segment), reporting per level the minimum group "
        "size and how many rows a release-with-suppression would drop. "
        "The analyst picks the first level whose k_min clears the "
        "policy (K={K_ANONYMITY}) or whose suppression cost is "
        "acceptable — the standard Samarati lattice walk, linearized "
        "to its diagonal.  Scale shape: the ladder IS "
        "rollup(seg, nat, band) + grouping_id (the grand-total rung "
        "filtered out) — ONE scan + ONE Expand, a plan the review "
        "found the earlier union-of-3-projections draft did NOT "
        "produce (it scanned the table three times); then one grouped "
        "count and a |levels|-row rollup.  No joins, no windows.  The "
        "DuckDB oracle keeps the explicit 3-way union — oracles are "
        "judged on semantics, not plan shape.",
    tags=("privacy", "relational"),
)
def privacy_k_anonymity_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("bigint").alias("nat"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint").alias("bal_band"),
    )
    # rollup is the real one-scan grouping-sets form of the ladder —
    # Catalyst plans ONE scan + ONE Expand (the union-of-3-projections
    # alternative scans the table three times).  grouping_id bits for
    # rollup(seg, nat, bal_band): 0 = (seg,nat,band) = L0, 1 = band
    # rolled up = L1, 3 = (seg) = L2; 7 = the grand total, which is not
    # a rung on the ladder and is filtered out.  nat/bal_band are
    # non-null by fixture contract, so rolled-up NULLs cannot collide
    # with data NULLs — and even if they did, gid separates the levels.
    grp = (
        base.rollup("seg", "nat", "bal_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("grp_n"),
            F.grouping_id().alias("gid"),
        )
        .filter(F.col("gid") != 7)
        .withColumn(
            "level",
            F.when(F.col("gid") == 0, F.lit(0))
            .when(F.col("gid") == 1, F.lit(1))
            .otherwise(F.lit(2)),
        )
    )
    suppressed = F.sum(
        F.when(F.col("grp_n") < K_ANONYMITY, F.col("grp_n")).otherwise(F.lit(0))
    ).cast("bigint")
    return grp.groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("grp_n").cast("bigint").alias("k_min"),
        suppressed.alias("rows_suppressed"),
        pround(suppressed * F.lit(1.0) / F.sum("grp_n"), 6).alias(
            "suppression_rate"
        ),
    )


# DP mean-release constants: row-value clamp bound (L_inf of one row's
# contribution to the sum, in cents) and the two Laplace scales —
# COMPUTED at import (round-16 review: hand-folded copies go stale
# when clamp/epsilon change); the f-string interpolation still folds
# one identical float literal into both engines.
_DPM_CLAMP = 50000  # $500.00
_DPM_B_SUM = _DPM_CLAMP / _DP_EPSILON
_DPM_B_CNT = 1 / _DP_EPSILON


@register(
    "privacy_dp_mean_release",
    oracle=f"""
    WITH rel AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(least(CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                            {_DPM_CLAMP})) AS BIGINT) AS clamped_sum
      FROM events
      WHERE value IS NOT NULL AND value >= 0
      GROUP BY event_type
    ), noised AS (
      SELECT *,
             ({duck_u32("'dpm_s_' || event_type")} + 0.5) / 4294967296.0 AS us_,
             ({duck_u32("'dpm_c_' || event_type")} + 0.5) / 4294967296.0 AS uc_
      FROM rel
    ), lap AS (
      SELECT event_type, n_rows, clamped_sum,
             clamped_sum + CASE WHEN us_ >= 0.5
                  THEN -{_DPM_B_SUM} * ln(1.0 - 2.0 * (us_ - 0.5))
                  ELSE  {_DPM_B_SUM} * ln(1.0 - 2.0 * (0.5 - us_)) END
               AS noisy_sum,
             n_rows + CASE WHEN uc_ >= 0.5
                  THEN -{_DPM_B_CNT} * ln(1.0 - 2.0 * (uc_ - 0.5))
                  ELSE  {_DPM_B_CNT} * ln(1.0 - 2.0 * (0.5 - uc_)) END
               AS noisy_n
      FROM noised
    )
    SELECT event_type, n_rows, clamped_sum,
           floor((clamped_sum * 1.0 / n_rows) * 1000000.0 + 0.5) / 1000000.0
             AS true_mean_cents,
           floor((noisy_sum / greatest(noisy_n, 1.0)) * 1000000.0 + 0.5)
             / 1000000.0 AS dp_mean_cents
    FROM lap
    """,
    doc="The DP MEAN release — third of the release family (counts, "
        "histogram, mean): per-row values clamped to [0, $500] cents "
        "(bounding one row's sum contribution), then the standard "
        "noisy-sum / noisy-count quotient with Laplace(clamp/eps) on "
        "the sum and Laplace(1/eps) on the count (eps each, 2·eps "
        "total by composition — the bookkeeping a DP accountant "
        "tracks).  Noise uniforms are the md5-derived deterministic "
        "u32s (one per release key per statistic), so the MECHANISM is "
        "modeled exactly and oracle-checkable; a production release "
        "swaps the hash for a secure RNG and nothing else changes.  "
        "Scale shape: one partial-agg shuffle to a |types|-row release "
        "table, per-row noise arithmetic; clamped sums are exact int64 "
        "(cap 5e4 x row count — int64-safe past 1e14 rows/type).",
    tags=("privacy", "events"),
)
def privacy_dp_mean_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    rel = (
        e.filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.least(cents, F.lit(_DPM_CLAMP))).cast("bigint").alias(
                "clamped_sum"
            ),
        )
    )

    us_ = _spark_u01(F.concat(F.lit("dpm_s_"), F.col("event_type")))
    uc_ = _spark_u01(F.concat(F.lit("dpm_c_"), F.col("event_type")))
    noisy_sum = F.col("clamped_sum") + _spark_laplace(us_, _DPM_B_SUM)
    # denominator clamp (r12 review fix): for a rare type (n_rows ~1-5)
    # the count noise can be <= -n_rows (~6% of key space at n=2),
    # flipping the released mean's sign or dividing by ~0 — the
    # standard mechanism clamps the noisy count at 1
    noisy_n = F.greatest(F.col("n_rows") + _spark_laplace(uc_, _DPM_B_CNT), F.lit(1.0))
    return rel.select(
        "event_type",
        "n_rows",
        "clamped_sum",
        pround(F.col("clamped_sum") * F.lit(1.0) / F.col("n_rows"), 6).alias(
            "true_mean_cents"
        ),
        pround(noisy_sum / noisy_n, 6).alias("dp_mean_cents"),
    )


# DP quantile-release constants: clamp bound shared with the mean
# release; candidate grid step (51 candidates 0, 1000, ..., 50000)
_DPQ_STEP = 1000


@register(
    "privacy_dp_quantile_release",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             least(CAST(floor(value * 100.0 + 0.5) AS BIGINT), {_DPM_CLAMP})
               AS cents
      FROM events WHERE value IS NOT NULL AND value >= 0
    ), hist AS (
      SELECT event_type, cents // {_DPQ_STEP} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM base GROUP BY event_type, bucket
    ), grid AS (
      SELECT t.event_type, i.i
      FROM (SELECT DISTINCT event_type FROM hist) t
      CROSS JOIN (SELECT unnest(range(0, 51)) AS i) i
    ), filled AS (
      SELECT g.event_type, g.i, coalesce(h.cnt, 0) AS cnt
      FROM grid g LEFT JOIN hist h
        ON h.event_type = g.event_type AND h.bucket = g.i
    ), cum AS (
      SELECT event_type, i, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY i
                            ROWS UNBOUNDED PRECEDING) - cnt AS below,
             sum(cnt) OVER (PARTITION BY event_type) AS n_rows
      FROM filled
    ), scored AS (
      SELECT event_type, i, n_rows,
             {_DP_EPSILON} * (-abs(2 * below - n_rows)) / 4.0
             - ln(-ln(({duck_u32("'dpq_' || event_type || '_' || CAST(i AS VARCHAR)")}
                       + 0.5) / 4294967296.0)) AS total
      FROM cum
    ), picked AS (
      SELECT event_type, i, n_rows,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY total DESC, i ASC) AS rn
      FROM scored
    )
    SELECT event_type,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(i * {_DPQ_STEP} AS BIGINT) AS dp_median_cents,
           CAST({_DP_EPSILON} AS DOUBLE) AS epsilon
    FROM picked WHERE rn = 1
    """,
    doc="The DP QUANTILE (median) release — fourth of the release "
        "family (counts, histogram, mean, quantile), and the one that "
        "needs a DIFFERENT mechanism: quantiles have unbounded "
        "Laplace sensitivity, so the EXPONENTIAL MECHANISM picks a "
        "candidate c from a public grid (51 cut points over the "
        "[0, $500] clamp range) with probability proportional to "
        "exp(eps * u(c) / 2), where u(c) = -|#below(c) - n/2| has "
        "rank sensitivity 1.  Sampling is the Gumbel-max trick — "
        "argmax of score + Gumbel(-ln(-ln(U))) — with the U's drawn "
        "from the release family's md5-keyed deterministic uniforms "
        "(one per (type, candidate)), so the full mechanism is "
        "oracle-checked; a production release swaps the hash for a "
        "secure RNG and nothing else changes.  The empty grid cells "
        "are ZERO-FILLED before the cumulative rank (the zero-fill "
        "class from the r12 review list, done on both engines).  "
        "Scale shape: one partial-agg shuffle to a |types * 51|-row "
        "release table, window cumsum per type, row_number argmax — "
        "no joins against the fact table beyond the histogram.",
    tags=("privacy", "events"),
)
def privacy_dp_quantile_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    cents = F.least(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
        F.lit(_DPM_CLAMP),
    )
    hist = (
        e.filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .select("event_type", (cents / F.lit(_DPQ_STEP)).cast("bigint").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # alias both sides: grid derives FROM hist, so an unaliased
    # grid-hist join is a self-join Spark cannot disambiguate
    grid = (
        hist.select("event_type")
        .distinct()
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(50))))
        .alias("g")
    )
    h = hist.alias("h")
    filled = grid.join(
        h,
        (F.col("g.event_type") == F.col("h.event_type"))
        & (F.col("g.i") == F.col("h.bucket")),
        "left",
    ).select(
        F.col("g.event_type").alias("event_type"),
        F.col("g.i").alias("i"),
        F.coalesce(F.col("h.cnt"), F.lit(0)).alias("cnt"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = filled.select(
        "event_type",
        "i",
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("below"),
        F.sum("cnt").over(wall).alias("n_rows"),
    )
    u = _spark_u01(
        F.concat(F.lit("dpq_"), F.col("event_type"), F.lit("_"), F.col("i").cast("string"))
    )
    total = (
        F.lit(_DP_EPSILON)
        * (-F.abs(F.lit(2) * F.col("below") - F.col("n_rows")))
        / F.lit(4.0)
        - F.log(-F.log(u))
    )
    picked = cum.withColumn("total", total).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("total"), F.asc("i"))
        ),
    )
    return picked.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("i") * F.lit(_DPQ_STEP)).cast("bigint").alias("dp_median_cents"),
        F.lit(_DP_EPSILON).alias("epsilon"),
    )


@register(
    "privacy_dp_topk_release",
    oracle=f"""
    WITH rel AS (
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS true_users
      FROM events GROUP BY event_type
    ), noised AS (
      SELECT *,
             ({duck_u32("'dptk_' || event_type")} + 0.5)
               / 4294967296.0 AS u
      FROM rel
    ), scored AS (
      SELECT event_type, true_users,
             floor((true_users
                    + CASE WHEN u >= 0.5
                           THEN -{1.0 / _DP_EPSILON} * ln(1.0 - 2.0 * (u - 0.5))
                           ELSE  {1.0 / _DP_EPSILON} * ln(1.0 - 2.0 * (0.5 - u))
                      END) * 1000000.0 + 0.5) / 1000000.0 AS noisy_users
      FROM noised
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY noisy_users DESC,
                                   event_type ASC) AS rnk
      FROM scored
    )
    SELECT CAST(rnk AS INTEGER) AS rnk, event_type, noisy_users,
           CAST({_DP_EPSILON} AS DOUBLE) AS epsilon
    FROM ranked WHERE rnk <= 5
    """,
    doc="Differentially-private top-k release (peeling form of "
        "report-noisy-max): per event type, the distinct-user count "
        "gets Laplace(1/epsilon) noise — same deterministic md5-keyed "
        "inverse-CDF uniform as the other DP releases, the "
        "oracle-checkable stand-in for a real RNG — and the release "
        "publishes ONLY the top-5 types ranked by NOISY score, with "
        "the TRUE counts withheld (releasing the noisy score spends "
        "the same budget; releasing the true count would spend "
        "infinite).  Selection-by-noisy-rank is the part plain "
        "per-cell Laplace doesn't give: which items appear in the "
        "release is itself randomized, so presence leaks bounded "
        "information.  Ranking tie-break on the type name keeps the "
        "released SET deterministic cross-engine.  Scale shape: one "
        "distinct-user dedupe shuffle, a |types|-row release table, "
        "one 5-row ranked emit — the window runs over ~9 rows, not "
        "the fact table.",
    tags=("privacy", "events", "approx-release"),
)
def privacy_dp_topk_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.scale import bounded_window_key

    e = load_table(spark, sf_dir, "events")
    rel = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("true_users")
    )
    u32 = spark_u32(F.concat(F.lit("dptk_"), F.col("event_type")))
    u = (u32 + F.lit(0.5)) / F.lit(4294967296.0)
    scale = 1.0 / _DP_EPSILON
    noise = F.when(
        u >= 0.5, F.lit(-scale) * F.log(F.lit(1.0) - F.lit(2.0) * (u - F.lit(0.5)))
    ).otherwise(F.lit(scale) * F.log(F.lit(1.0) - F.lit(2.0) * (F.lit(0.5) - u)))
    scored = rel.select(
        "event_type",
        "true_users",
        pround(F.col("true_users") + noise, 6).alias("noisy_users"),
    )
    # release table is |event types|-sized — bounded_window_key keeps
    # the single-task window without the No-Partition-Defined warning
    w = Window.partitionBy(bounded_window_key("event_type")).orderBy(
        F.desc("noisy_users"), F.asc("event_type")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "event_type",
            "noisy_users",
            F.lit(_DP_EPSILON).alias("epsilon"),
        )
    )
