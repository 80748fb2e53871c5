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


def _spread(documents: DataFrame) -> DataFrame:
    """Small doc tables often arrive as one parquet row-group = one partition;
    shingling/minhashing are interpreted higher-order expressions (no codegen
    for lambdas), so spread rows across the session's parallelism first."""
    n_part = int(documents.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return documents.repartition(n_part, "doc_id")


def doc_shingle_profiles(documents: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → (minhashes array<long>[MINHASH_PERMS], shh array<long> of
    distinct shingle hashes) in ONE Arrow mapInPandas pass.

    The r01 plan built shingles/minhashes with higher-order Catalyst
    expressions — transform/array_min lambdas are interpreted (no codegen)
    and dominated the bench at 14 s/sf0.1. This numpy kernel does
    normalize → shingle → md5-hash → 12 permutation minima per doc in one
    batch, keeping the md5-derived hash values bit-identical to
    functions/text.hash64 (and so to the DuckDB oracle).

    Normalization parity with the expression path (and oracle):
    trim = strip ASCII spaces only (Spark's trim), then lower, then collapse
    Java \\s = [ \\t\\n\\x0b\\f\\r] runs to one space."""
    import re
    from hashlib import md5

    import numpy as np
    import pandas as pd

    a_params = np.array([minhash_params(p)[0] for p in range(MINHASH_PERMS)], dtype=np.int64)
    b_params = np.array([minhash_params(p)[1] for p in range(MINHASH_PERMS)], dtype=np.int64)
    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")

    def _profiles(batches):
        for pdf in batches:
            ids, sigs, shhs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):
                    # NULL text → zero shingles, matching the null-safe
                    # Catalyst expression path this kernel replaced
                    continue
                norm = ws_re.sub(" ", text.strip(" ").lower())
                words = norm.split(" ")
                m = len(words) - n + 1
                if m <= 0:
                    continue
                hs = np.fromiter(
                    (
                        int(md5(" ".join(words[i : i + n]).encode("utf-8")).hexdigest()[:15], 16)
                        for i in range(m)
                    ),
                    dtype=np.int64,
                    count=m,
                )
                masked = hs & MINHASH_MASK
                sig = ((masked[None, :] * a_params[:, None] + b_params[:, None]) % MINHASH_PRIME).min(axis=1)
                ids.append(doc_id)
                sigs.append(sig)
                shhs.append(np.unique(hs))
            yield pd.DataFrame({"doc_id": ids, "minhashes": sigs, "shh": shhs})

    return _spread(documents).select("doc_id", "text").mapInPandas(
        _profiles, "doc_id long, minhashes array<long>, shh array<long>"
    )


def doc_minhashes(documents: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → array of MINHASH_PERMS minhash values (portable hashes)."""
    return doc_shingle_profiles(documents, n).select("doc_id", "minhashes")


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 2000,
) -> DataFrame:
    """Candidate pairs via band-bucket join, verified with exact shingle
    Jaccard. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    The verify join ships distinct shingle-HASH arrays (8 B/shingle), not the
    raw shingle strings — payload-light at scale; set Jaccard over 60-bit
    hashes equals string Jaccard up to md5 collisions.

    max_bucket is the skew guard (the analog of ngram_jaccard_pairs'
    max_df): a degenerate corpus — many near-identical docs — lands d docs
    in ONE (band, sig) bucket, whose self-join is d² rows in a single task.
    Buckets above the cap are re-paired through salted block-grid groups
    (each doc hashes to one of g = ceil(d/cap) salt blocks; upper-triangle
    block pairs become the join key), so the SAME exact pair set comes out
    but no task handles more than ~2·cap rows. The cap is inert on
    non-degenerate data (every bucket ≤ cap → the plain self-join), so the
    DuckDB oracle output is unchanged."""
    profiles = doc_shingle_profiles(documents, n).cache()
    mh = profiles.select("doc_id", "minhashes")
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

    bands = bands.cache()
    sizes = bands.groupBy("band", "sig").agg(F.count("*").alias("bn"))
    hot_keys = sizes.filter(F.col("bn") > max_bucket)
    # short-circuit the common case: no hot bucket → plain self-join, none
    # of the guard's extra stages (anti-join, salt explode, union) in the
    # plan. hot_keys is a tiny aggregate over the cached bands, so this
    # driver-side probe costs one small job, not a second table scan.
    if hot_keys.isEmpty():
        cand = (
            bands.alias("l")
            .join(bands.alias("r"), ["band", "sig"])
            .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
            .distinct()
        )
        return _verify_pairs(profiles, cand, jaccard_threshold)
    cold = bands.join(F.broadcast(hot_keys.select("band", "sig")), ["band", "sig"], "left_anti")
    cand_cold = (
        cold.alias("l")
        .join(cold.alias("r"), ["band", "sig"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
    )

    # hot buckets: salted block-grid pairing. doc → salt block s of g;
    # explode to the g (a,b)=(min(s,t),max(s,t)) block-pair groups it joins
    # in; LEFT role in groups where s<=t, RIGHT where s>t. Every pair meets
    # in exactly one group; per-group row count is bounded by ~2·cap.
    hot = bands.join(F.broadcast(hot_keys), ["band", "sig"]).withColumn(
        "g", F.ceil(F.col("bn") / F.lit(max_bucket)).cast("int")
    ).withColumn("s", F.pmod(F.xxhash64("doc_id"), F.col("g")).cast("int"))
    exp = hot.withColumn("t", F.explode(F.sequence(F.lit(0), F.col("g") - 1))).select(
        "band",
        "sig",
        "doc_id",
        F.least("s", "t").alias("a"),
        F.greatest("s", "t").alias("b"),
        (F.col("s") <= F.col("t")).alias("is_left"),
    )
    lhs = exp.filter(F.col("is_left") | (F.col("a") == F.col("b")))
    rhs = exp.filter(~F.col("is_left") | (F.col("a") == F.col("b")))
    # roles are fixed by salt, so the left-role doc may carry the LARGER id;
    # order with least/greatest (an l<r filter here would silently drop the
    # half of cross-block pairs whose left doc id is bigger)
    cand_hot = (
        lhs.alias("l")
        .join(rhs.alias("r"), ["band", "sig", "a", "b"])
        .filter(F.col("l.doc_id") != F.col("r.doc_id"))
        .select(
            F.least("l.doc_id", "r.doc_id").alias("doc_a"),
            F.greatest("l.doc_id", "r.doc_id").alias("doc_b"),
        )
    )
    cand = cand_cold.unionByName(cand_hot).distinct()
    return _verify_pairs(profiles, cand, jaccard_threshold)


def _verify_pairs(profiles: DataFrame, cand: DataFrame, jaccard_threshold: float) -> DataFrame:
    """Exact Jaccard verify over distinct shingle-hash sets."""
    sh = profiles.select("doc_id", F.col("shh").alias("sh"))
    return (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_union", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(F.col("n_inter") / F.col("n_union"), 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5, max_df: int | None = 1000
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via shingle-explode equi-join
    (no LSH approximation; the oracle-checkable exact variant).

    max_df is the hot-shingle guard: a stopword-heavy shingle shared by d
    docs contributes d² rows to the self-join — quadratic per key at scale.
    Shingles with document frequency > max_df are dropped from BOTH the join
    and the per-doc set sizes (consistent Jaccard over the capped universe).
    The cap is inert when no shingle is hot (max df at sf0.1 is 25), so the
    oracle output is unchanged at test scale.

    Shingles are joined by their 60-bit md5 hash (from the Arrow profile
    kernel), not the raw strings: same Jaccard up to md5 collisions, 8 B/row
    join payload, and no interpreted higher-order expressions."""
    sh = doc_shingle_profiles(documents, n).select(
        "doc_id", F.explode("shh").alias("sh")
    ).cache()  # consumed by sizes + both self-join sides
    if max_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
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


def embedding_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_size: int = 256,
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact cosine near-duplicate pairs (vec_a < vec_b, cos ≥ threshold)
    via a block-grid matmul join — no cartesian/nested-loop node in the plan.

    Vectors get a hash block id (nb blocks); the tiny upper-triangle
    block-pair table broadcasts; each vector is shuffled to the ≤nb+1
    block-pair groups it participates in, and one Arrow kernel scores each
    group with a single BLAS matmul. Shuffle volume is O(N·nb) rows (vs the
    O(N²) a `vec_id < vec_id` theta join ships through a nested-loop join);
    the O(N²/P) FLOPs per group are inherent to *exact* low-threshold
    all-pairs and run at matmul speed, not per-pair expression interpretation.
    This mirrors the block approach of mllib's columnSimilarities/DIMSUM.
    For high thresholds at extreme scale, `embedding_dups_lsh` trades recall
    for candidate pruning.

    n_blocks: callers at scale should size this ≈ N/block_size. When omitted
    it derives from the scan's partition count (a file-count heuristic —
    pure plan metadata, no job), never a `.count()` scan: partitions ≈
    bytes/maxPartitionBytes, so blocks track data volume at write-time row
    sizes without an extra pass over the table."""
    if n_blocks is None:
        # scan partitions track data volume (bytes/maxPartitionBytes) but a
        # small table reads as ONE partition — floor at the session's core
        # count so every core gets block-pair groups to score
        n_blocks = max(
            embeddings.rdd.getNumPartitions(),
            embeddings.sparkSession.sparkContext.defaultParallelism,
        )
    nb = n_blocks
    spark = embeddings.sparkSession
    e = embeddings.select("vec_id", "embedding").withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(nb)).cast("int")
    )
    pair_rows = [(i, j) for i in range(nb) for j in range(i, nb)]
    pairs = spark.createDataFrame(pair_rows, "bi int, bj int")
    lhs = e.join(F.broadcast(pairs), e.blk == pairs.bi).select(
        "bi", "bj", F.lit(0).alias("role"), "vec_id", "embedding"
    )
    rhs = e.join(F.broadcast(pairs), (e.blk == pairs.bj) & (pairs.bi != pairs.bj)).select(
        "bi", "bj", F.lit(1).alias("role"), "vec_id", "embedding"
    )
    both = lhs.unionByName(rhs)

    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        if pdf.empty:
            return empty
        same = pdf["bi"].iat[0] == pdf["bj"].iat[0]
        left = pdf[pdf["role"] == 0]
        right = pdf[pdf["role"] == 1]
        # guard BEFORE np.stack: a group holding only one role (empty hash
        # block, or n_blocks larger than the populated block count) must
        # yield no pairs, not an np.stack ValueError
        if left.empty or (not same and right.empty):
            return empty
        ids_l = left["vec_id"].to_numpy()
        ml = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        ml /= np.linalg.norm(ml, axis=1, keepdims=True)
        if same:
            ids_r, mr = ids_l, ml
        else:
            ids_r = right["vec_id"].to_numpy()
            mr = np.stack(right["embedding"].to_numpy()).astype(np.float64)
            mr /= np.linalg.norm(mr, axis=1, keepdims=True)
        s = ml @ mr.T
        ii, jj = np.nonzero(s >= thr)
        if same:
            keep = ids_l[ii] < ids_r[jj]
            ii, jj = ii[keep], jj[keep]
        a, b = ids_l[ii], ids_r[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": s[ii, jj]})

    out = both.groupBy("bi", "bj").applyInPandas(
        _score, "vec_a long, vec_b long, cosine double"
    )
    return out.select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))


def embedding_dups_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    dim: int = 64,
    multiprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs: sign-random-projection bucket candidates
    (+ multiprobe) then exact cosine verify. Misses pairs whose LSH bits
    differ in > `multiprobe` positions — recall is measured in
    tests/test_dedup_similarity.py; suited to high thresholds where candidate
    pruning is strong. The exact block-grid path is `embedding_dups`."""
    from .similarity import _projection_matrix, lsh_bucket_expr

    planes = _projection_matrix(dim, n_bits, seed)
    e = embeddings.select("vec_id", "embedding").withColumn(
        "bucket", lsh_bucket_expr(F.col("embedding"), planes)
    )
    probes = [F.col("bucket")]
    if multiprobe >= 1:
        probes += [F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    if multiprobe >= 2:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(n_bits)
            for j in range(i + 1, n_bits)
        ]
    probed = e.withColumn("probe", F.explode(F.array(*probes)))
    cand = (
        probed.alias("l")
        .join(e.alias("r"), F.col("l.probe") == F.col("r.bucket"))
        .filter(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cosine_expr(F.col("l.embedding"), F.col("r.embedding")), 6).alias("cosine"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .filter(F.col("cosine") >= threshold)
    )
    return cand


def simhash_hamming_pairs(
    documents: DataFrame, bits: int = 32, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance ≤ max_hamming.

    Banded exact search: the `bits`-bit fingerprint splits into `n_bands`
    contiguous bands; a pair within hamming h < n_bands must agree on at
    least one whole band (pigeonhole), so a band-value equi-join finds ALL
    qualifying pairs with max_hamming = n_bands − 1 — no cross join, no
    recall loss. Verification is one xor + bit_count. Same plan family as
    minhash_lsh_pairs: candidates from an equi-join, cheap exact verify."""
    if max_hamming >= n_bands:
        raise ValueError("exactness requires max_hamming < n_bands (pigeonhole)")
    band_width = bits // n_bands
    mask = (1 << band_width) - 1
    sh = simhash64(documents, bits)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * band_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    pairs = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "key"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs
