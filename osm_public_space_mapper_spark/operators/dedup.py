"""Deduplication operators over the `documents` table (training-data pipeline
ops the task brief requires as first-class components).

All are shuffle-conscious compositions of built-in DataFrame ops:

exact_dedup          hash-groupBy on a normalized-content fingerprint
minhash_lsh_pairs    shingle → portable minhash (k seeds) → band → bucket
                     equi-join → verified Jaccard — the classic MinHash+LSH
                     plan: candidates come from band-bucket joins only, never
                     a cross join
ngram_jaccard_pairs  exact n-gram Jaccard via shingle-explode equi-join
simhash64            bit-vote fingerprint over token hashes (hamming dedup)
embedding_dups       cosine near-duplicate pairs over `embeddings`

Hashes are md5-derived (functions/text.hash64) so the DuckDB oracle can
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, hash64, shingles

MINHASH_PERMS = 12
MINHASH_BANDS = 4  # rows per band = 12/4 = 3
# 30-bit universe keeps a·x + b < 2^61 — identical (non-overflowing) int64
# arithmetic in Spark and the DuckDB oracle
MINHASH_MASK = (1 << 30) - 1
MINHASH_PRIME = 1073741789  # largest prime < 2^30
_SEED_A = 48271
_SEED_B = 40503


def minhash_params(perm: int) -> tuple[int, int]:
    a = (_SEED_A * (perm + 1)) % MINHASH_PRIME
    if a == 0:
        a = 1
    b = (_SEED_B * (perm + 7)) % MINHASH_PRIME
    return a, b


def exact_dedup(documents: DataFrame) -> DataFrame:
    """One survivor (min doc_id) per normalized-content fingerprint."""
    return (
        documents.withColumn("fp", doc_fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


def _minhash_col(sh_hash_col, perm: int):
    """min over shingles of (a·(x & MASK) + b) mod PRIME."""
    a, b = minhash_params(perm)
    return F.array_min(
        F.transform(
            sh_hash_col,
            lambda x: (x.bitwiseAND(F.lit(MINHASH_MASK)) * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME),
        )
    )


def _spread(documents: DataFrame) -> DataFrame:
    """Small doc tables often arrive as one parquet row-group = one partition;
    shingling/minhashing are interpreted higher-order expressions (no codegen
    for lambdas), so spread rows across the session's parallelism first."""
    n_part = int(documents.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return documents.repartition(n_part, "doc_id")


def doc_minhashes(documents: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → array of MINHASH_PERMS minhash values (portable hashes)."""
    documents = _spread(documents)
    sh = documents.select("doc_id", shingles(F.col("text"), n).alias("sh"))
    sh = sh.filter(F.size("sh") > 0)
    sh = sh.withColumn("shh", F.transform(F.col("sh"), hash64))
    cols = [_minhash_col(F.col("shh"), p).alias(f"mh{p}") for p in range(MINHASH_PERMS)]
    return sh.select("doc_id", F.array(*cols).alias("minhashes"))


def minhash_lsh_pairs(documents: DataFrame, n: int = 3, jaccard_threshold: float = 0.5) -> DataFrame:
    """Candidate pairs via band-bucket join, verified with exact shingle
    Jaccard. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    mh = doc_minhashes(documents, n)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[F.element_at("minhashes", b * rows_per_band + i + 1) for i in range(rows_per_band)],
                            )
                        ).alias("sig"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "sig"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify with exact Jaccard over shingle sets
    sh = _spread(documents).select(
        "doc_id", F.array_distinct(shingles(F.col("text"), n)).alias("sh")
    ).filter(F.size("sh") > 0)
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_union", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(F.col("n_inter") / F.col("n_union"), 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via shingle-explode equi-join
    (no LSH approximation; the oracle-checkable exact variant)."""
    sh = _spread(documents).select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), n))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("l")
        .join(sh.alias("r"), "sh")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        pairs.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def simhash64(documents: DataFrame, bits: int = 32) -> DataFrame:
    """Bit-vote SimHash over word-token hashes (portable md5-derived)."""
    toks = _spread(documents).select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")),
            hash64,
        ).alias("th"),
    )
    def _vote(bit: int):
        def merge(acc, h):
            return acc + F.when(h.bitwiseAND(F.lit(1 << bit)) > 0, 1).otherwise(-1)

        return merge

    votes = [
        F.aggregate(F.col("th"), F.lit(0), _vote(b)).alias(f"v{b}") for b in range(bits)
    ]
    v = toks.select("doc_id", *votes)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return v.select("doc_id", sim.alias("simhash"))


def cosine_expr(a, b):
    """cosine similarity between two array<float/double> columns (built-ins)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def embedding_dups(embeddings: DataFrame, threshold: float = 0.95, max_ids: int | None = None) -> DataFrame:
    """Cosine near-duplicate pairs (vec_a < vec_b, cos ≥ threshold).

    Baseline is the exact all-pairs comparison — at scale, swap the self-join
    for the LSH-bucketed candidate generation in similarity.ann_lsh_buckets."""
    e = embeddings.select(F.col("vec_id"), F.col("embedding"))
    if max_ids is not None:
        e = e.filter(F.col("vec_id") < max_ids)
    out = (
        e.alias("l")
        .join(e.alias("r"), F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cosine_expr(F.col("l.embedding"), F.col("r.embedding")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return out
