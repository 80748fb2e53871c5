"""PII detection / redaction over text columns — the scrub pass a
training-data pipeline runs before anything else sees the corpus
(emails, phone numbers, IP addresses, SSN-shaped ids → typed placeholder
tokens, with per-class counts so the cut is auditable).

Reference scope note: the reference engine (single-node shapely pipeline)
has no text surface; this module is part of the large-scale
training-data-pipeline family the brief adds on top of SURVEY.md §2.

Every pattern is written in the regex subset Java's engine and RE2
(DuckDB) interpret identically — character classes, bounded quantifiers,
non-capturing groups, ``\\b`` — no lookaround, no backreferences — so the
DuckDB oracle reproduces the scrub bit-for-bit.

Scale: pure Catalyst ``regexp_replace`` / ``regexp_extract_all`` column
expressions — map-side, whole-stage-codegen, zero shuffles, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (class, pattern, replacement) — applied IN ORDER, each on the output of
# the previous scrub (so a class never re-matches inside an earlier
# placeholder). Order matters: SSN before phone (both dash-digit shapes),
# IPv4 before phone (dot-separated digits).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact PII and count what was cut.

    Returns ``(doc_id, scrubbed, n_email, n_ssn, n_ipv4, n_phone, n_pii)``
    — ``scrubbed`` is the text with each match replaced by its class
    placeholder; counts are per class on the sequentially-scrubbed text
    (class i counted after classes < i were replaced), so
    ``n_pii = Σ counts`` exactly matches the placeholders inserted."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(
        F.col(id_col).alias("doc_id"), cur.alias("scrubbed"), *counts
    )
    total = sum((F.col(f"n_{n}") for n, _, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("n_pii", total.cast("long"))


def pii_scrub_duckdb_sql(table: str = "documents", text_col: str = "text") -> str:
    """The DuckDB transliteration of :func:`pii_scrub` (same patterns, same
    sequential order) — used by the driver oracle and the crafted-input
    parity test."""
    steps = [f"SELECT doc_id, {text_col} AS t0 FROM {table}"]
    prev = "t0"
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        nxt = f"t{i + 1}"
        # DuckDB needs the 'g' flag for global replacement
        steps.append(
            f"SELECT *, CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT) AS n_{name}, "
            f"regexp_replace({prev}, '{pat}', '{repl}', 'g') AS {nxt} FROM s{i}"
        )
        prev = nxt
    ctes = ",\n".join(
        f"s{i} AS ({q})" for i, q in enumerate(steps)
    )
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    cols = ", ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return (
        f"WITH {ctes}\n"
        f"SELECT doc_id, {prev} AS scrubbed, {cols}, "
        f"CAST({total} AS BIGINT) AS n_pii FROM s{len(PII_PATTERNS)}"
    )
