"""BPE tokenizer: hand-computed merge sequences, reconstruction invariant,
partitioning-invariance of training, and compression monotonicity."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_public_space_mapper_spark.operators.bpe import (
    _EOW,
    _encode_word,
    bpe_encode,
    bpe_vocab_usage,
    train_bpe,
)


def test_train_bpe_hand_computed(spark):
    # corpus: aa ×3, ab ×2, b ×1  (one doc per word occurrence)
    rows = [(i, w) for i, w in enumerate(["aa"] * 3 + ["ab"] * 2 + ["b"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, num_merges=3)
    # pair counts round 1: (a,a)=3, (a,▁)=3, (a,b)=2, (b,▁)=3 → tie at 3,
    # lexicographic min is ('a','a')... '▁' sorts above ascii letters, so
    # ('a','a') < ('a','▁') < ('b','▁')
    assert merges[0] == ("a", "a")
    # round 2: words now (aa,▁)×3, (a,b,▁)×2, (b,▁)×1 → (aa,▁)=3 wins over
    # (a,b)=2 and (b,▁)=3 — tie ('aa','▁') vs ('b','▁'): 'aa' < 'b'
    assert merges[1] == ("aa", _EOW)
    # round 3: remaining pairs (a,b)=2, (b,▁)=3 → ('b','▁')
    assert merges[2] == ("b", _EOW)


def test_encode_word_greedy_rank_order():
    ranks = {("a", "a"): 0, ("aa", _EOW): 1, ("b", _EOW): 2, ("a", "b"): 3}
    assert _encode_word("aa", ranks) == ["aa" + _EOW]
    assert _encode_word("ab", ranks) == ["a", "b" + _EOW]  # rank 2 beats rank 3
    assert _encode_word("aab", ranks) == ["aa", "b" + _EOW]
    assert _encode_word("zzz", ranks) == ["z", "z", "z", _EOW]  # no applicable merge


def test_bpe_encode_reconstruction_and_counts(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    merges = train_bpe(docs, num_merges=80)
    out = bpe_encode(docs, merges).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in out:
        # invariant: concatenating tokens and splitting on the end-of-word
        # marker reconstructs exactly the whitespace words of the document
        words = [w for w in "".join(r.tokens).split(_EOW) if w != ""]
        assert words == texts[r.doc_id].split(), r.doc_id
        assert r.n_tokens == len(r.tokens)


def test_train_bpe_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    m1 = train_bpe(docs, num_merges=60)
    m2 = train_bpe(docs.repartition(13), num_merges=60)
    assert m1 == m2


def test_more_merges_compress_more(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    m_few = train_bpe(docs, num_merges=10)
    m_many = train_bpe(docs, num_merges=120)
    n_few = sum(r.n_tokens for r in bpe_encode(docs, m_few).collect())
    n_many = sum(r.n_tokens for r in bpe_encode(docs, m_many).collect())
    n_char = sum(
        len(w) + 1 for r in docs.collect() for w in r.text.split()
    )  # char-level baseline incl. end-of-word symbol
    assert n_many < n_few < n_char


def test_bpe_vocab_usage_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    merges = train_bpe(docs, num_merges=40)
    a = [(r.token, r.cnt, r.rank) for r in bpe_vocab_usage(docs, merges, k=20).collect()]
    b = [(r.token, r.cnt, r.rank) for r in bpe_vocab_usage(docs.repartition(7), merges, k=20).collect()]
    assert sorted(a, key=lambda t: t[2]) == sorted(b, key=lambda t: t[2])
    assert len(a) == 20 and a[0][2] == 1 if a else True


def test_bpe_encode_string_id_column(spark):
    # r06 (ADVICE r05 low): the output id field derives from the input
    # schema — a string id column round-trips instead of miscasting
    docs = spark.createDataFrame(
        [("doc-a", "low lower lowest"), ("doc-b", "low low")], "name string, text string"
    )
    merges = train_bpe(docs, num_merges=10)
    out = {r.doc_id: r.n_tokens for r in bpe_encode(docs, merges, id_col="name").collect()}
    assert set(out) == {"doc-a", "doc-b"} and all(n > 0 for n in out.values())
