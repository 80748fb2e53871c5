"""Curation operators (functions/pii.py, operators/curation.py) on
handcrafted inputs — crafted PII strings the synthetic corpus never
contains (with a DuckDB same-SQL parity check), split stability under
corpus growth, quota determinism under reordering, and dup-span coverage
union math with overlapping spans."""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_public_space_mapper_spark.functions.pii import pii_scrub, pii_scrub_duckdb_sql
from osm_public_space_mapper_spark.operators.curation import (
    deterministic_split,
    dup_span_stats,
    source_quota_sample,
)

_PII_DOCS = [
    (1, "contact bob.smith+x@example.co.uk or call 415-555-1234 now"),
    (2, "server at 10.0.255.7 rejected 192.168.1.1; ssn 123-45-6789"),
    (3, "no pii here, just text with numbers 12345 and a date 2026-08-17"),
    (4, ""),
    (5, "two mails: a@b.io c@d.org and +1 650.555.0199 maybe"),
]


def test_pii_scrub_handcrafted(spark):
    docs = spark.createDataFrame(_PII_DOCS, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in pii_scrub(docs).collect()}

    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "<EMAIL>" in got[1]["scrubbed"] and "<PHONE>" in got[1]["scrubbed"]
    assert "bob.smith" not in got[1]["scrubbed"]

    assert got[2]["n_ipv4"] == 2 and got[2]["n_ssn"] == 1
    assert got[2]["scrubbed"].count("<IP>") == 2 and "<SSN>" in got[2]["scrubbed"]

    assert got[3]["n_pii"] == 0 and got[3]["scrubbed"] == _PII_DOCS[2][1]
    assert got[4]["n_pii"] == 0 and got[4]["scrubbed"] == ""
    assert got[5]["n_email"] == 2
    # every class count sums into n_pii
    for d in got.values():
        assert d["n_pii"] == d["n_email"] + d["n_ssn"] + d["n_ipv4"] + d["n_phone"]


def test_pii_scrub_duckdb_parity_on_crafted(spark):
    """The driver oracle at sf0.01 sees zero PII (synthetic corpus); this
    pins engine↔oracle parity on inputs that actually match."""
    docs = spark.createDataFrame(_PII_DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in pii_scrub(docs).collect())

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_PII_DOCS, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.sql(pii_scrub_duckdb_sql()).fetchall())
    assert got == want


def test_deterministic_split_stable_under_growth(spark):
    """Appending rows must not move existing assignments (the property
    randomSplit lacks), and rerun output is identical."""
    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 400).withColumnRenamed("id", "doc_id")

    s1 = {r.doc_id: (r.bucket, r.split) for r in deterministic_split(small, "doc_id").collect()}
    s1b = {r.doc_id: (r.bucket, r.split) for r in deterministic_split(small, "doc_id").collect()}
    s2 = {r.doc_id: (r.bucket, r.split) for r in deterministic_split(big, "doc_id").collect()}

    assert s1 == s1b
    assert all(s2[k] == v for k, v in s1.items())
    splits = {v[1] for v in s2.values()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # ~90/5/5: train should dominate heavily
    n_train = sum(1 for v in s2.values() if v[1] == "train")
    assert n_train > 300


def test_source_quota_sample_deterministic(spark):
    rows = [(i, f"src{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    shuffled = spark.createDataFrame(list(reversed(rows)), "doc_id long, source string").repartition(7)

    a = sorted((r.doc_id, r.source, r.rk) for r in source_quota_sample(df, quota=10).collect())
    b = sorted((r.doc_id, r.source, r.rk) for r in source_quota_sample(shuffled, quota=10).collect())
    assert a == b
    per_src = {}
    for _, src, rk in a:
        per_src.setdefault(src, []).append(rk)
    assert all(sorted(v) == list(range(1, 11)) for v in per_src.values())


def test_dup_span_stats_handcrafted(spark):
    """Two docs share a 9-word run → two overlapping duplicated 8-grams
    each; coverage is the UNION (9 tokens), not 2×8."""
    shared = "one two three four five six seven eight nine"
    docs = spark.createDataFrame(
        [
            (1, shared + " tailA unique filler alpha"),
            (2, "headB " + shared + " other ending words"),
            (3, "totally different content with no repeats at all here"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in dup_span_stats(docs, n=8).collect()}

    # doc 1: 13 tokens, grams at pos 0..5; dup grams are the two inside `shared` (pos 0,1)
    d1 = got[1]
    assert d1["n_tokens"] == 13 and d1["n_ngrams"] == 6
    assert d1["n_dup_ngrams"] == 2
    assert d1["covered_tokens"] == 9  # union of [0,7] and [1,8]
    assert abs(d1["dup_token_frac"] - round(9 / 13, 6)) < 1e-9

    d2 = got[2]
    assert d2["n_dup_ngrams"] == 2 and d2["covered_tokens"] == 9

    d3 = got[3]
    assert d3["n_dup_ngrams"] == 0 and d3["covered_tokens"] == 0 and d3["dup_token_frac"] == 0.0

    d4 = got[4]
    assert d4["n_tokens"] == 0 and d4["n_ngrams"] == 0 and d4["dup_token_frac"] == 0.0


def test_unigram_surprisal_semantics(spark):
    """Corpus-typical docs score low, gibberish scores high; values match a
    python reference exactly (integer micro-nats)."""
    import math

    from osm_public_space_mapper_spark.functions.text import unigram_surprisal

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the mat"),
        (3, "zyxqv fnord blarg"),  # singleton tokens → max surprisal
        (4, ""),                   # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.total_surprisal_micro, r.avg_surprisal_micro)
        for r in unigram_surprisal(df).collect()
    }

    import re

    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in rows}
    vocab = {}
    for ts in toks.values():
        for t in ts:
            vocab[t] = vocab.get(t, 0) + 1
    n_total = sum(vocab.values())
    want = {}
    for d, ts in toks.items():
        lps = [math.floor(math.log(n_total / vocab[t]) * 1_000_000) for t in ts]
        total = sum(lps)
        want[d] = (len(ts), total, math.floor(total / len(ts)) if ts else 0)
    assert got == want
    assert got[4] == (0, 0, 0)
    assert got[3][2] > got[1][2]  # gibberish scores above typical prose
