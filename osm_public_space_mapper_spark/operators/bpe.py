"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched
encode (the real-tokenizer step past `functions/text.py`'s whitespace /
BPE-ish-regex token counting).

Reference scope note: the reference engine has no text surface; BPE
train/apply belongs to the training-data-pipeline family the brief adds
alongside SURVEY.md §2.

HOW training scales (the Sennrich et al. 2016 algorithm, Spark-shaped the
way production tokenizer trainers are): the corpus compresses to a WORD
FREQUENCY table in ONE distributed pass (groupBy word — map-side combined,
the only job that touches corpus bytes). BPE's merge loop then runs on
that table, which is vocabulary-sized (≤ `max_words` rows, ~10^5-10^6 for
any natural-language corpus regardless of corpus size — Heaps' law), so
the iterative part is driver-local on kilobytes-per-word state instead of
N re-tokenization jobs over 100 TB. The word table is capped by a
deterministic TakeOrdered (count desc, word asc), so training is stable
under any partitioning/parallelism.

Encoding is one Arrow mapInPandas pass with the merge ranks broadcast and
a per-batch word cache (Zipf: a few thousand distinct words cover most
tokens, so the greedy merge loop runs once per DISTINCT word per batch).

No SQL oracle: the merge loop is inherently iterative/order-dependent —
pinned instead by hand-computed merge sequences, a reconstruction
invariant (concatenating a word's tokens reproduces the word), and a
partitioning-invariance test (`tests/test_bpe.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "▁"  # end-of-word marker (SentencePiece-style visible block)


def word_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the one corpus-touching pass; whitespace
    pre-tokenization (the same split `ws_token_count` uses)."""
    return (
        documents.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    documents: DataFrame,
    num_merges: int = 200,
    max_words: int = 100_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges. Ties break deterministically
    (lexicographically smallest pair among the most frequent), so the same
    corpus yields the same merges at any parallelism. Returns the ordered
    merge list."""
    rows = (
        word_counts(documents, text_col)
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    vocab = {tuple(r["word"]) + (_EOW,): int(r["cnt"]) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best_cnt = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_cnt)
        if best_cnt < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge loop (the GPT-2 apply algorithm): repeatedly
    merge the pair with the smallest training rank until none applies."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) — one Arrow pass, merge
    ranks broadcast inside the closure, per-batch distinct-word cache."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _enc(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in (text or "").split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                toks.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    from pyspark.sql import types as T

    # derive the id field from the input schema (ADVICE r05: the hardcoded
    # 'doc_id long' miscast non-long or renamed id columns at the Arrow
    # boundary)
    schema = T.StructType(
        [
            T.StructField("doc_id", documents.schema[id_col].dataType),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    return documents.select(F.col(id_col), F.col(text_col)).mapInPandas(_enc, schema)


def bpe_vocab_usage(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BPE tokens by corpus frequency (deterministic rank tie-break
    token asc) — the vocabulary-head view over the TRAINED tokenizer,
    mirroring `corpus_token_topk`'s shape over the regex tokenizer."""
    from pyspark.sql import Window

    tok = bpe_encode(documents, merges, id_col, text_col).select(
        F.explode("tokens").alias("token")
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
