"""Corpus-curation operators a training-data pipeline runs between dedup
and export: deterministic train/val/test splitting, per-source quota
sampling (data mixing), and duplicate n-gram span statistics (the
substring-granularity view of Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better").

Reference scope note: the reference engine (single-node shapely pipeline,
no text surface) has none of these; they belong to the training-data
family the brief adds alongside SURVEY.md §2.

All three are pure Catalyst (the only hash is the portable md5-derived
``hash64``, reproduced bit-for-bit by the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash64

_BUCKETS = 10_000


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s1",
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Assign every row a stable train/val/test split by hashing its id.

    The split must be (a) deterministic across reruns and engines — a doc
    never migrates between train and test when the corpus is re-processed
    — and (b) independent of row order and partitioning. Hash bucketing
    delivers both: ``bucket = hash64(seed || ':' || id) mod 10000``, then
    threshold on the bucket. Changing ``seed`` draws a fresh split;
    appending new data never reshuffles old assignments (the property
    ``randomSplit`` does NOT have).

    Returns ``(doc_id, bucket, split)``. Scale: map-side expression only,
    zero shuffles."""
    test = 1.0 - train - val
    if test < -1e-9:
        raise ValueError(f"train+val={train + val} exceeds 1.0")
    bucket = (
        hash64(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
        % _BUCKETS
    )
    t_hi = int(round(train * _BUCKETS))
    v_hi = t_hi + int(round(val * _BUCKETS))
    return df.select(
        F.col(id_col).alias("doc_id"),
        bucket.cast("long").alias("bucket"),
        F.when(bucket < t_hi, "train")
        .when(bucket < v_hi, "val")
        .otherwise("test")
        .alias("split"),
    )


def deterministic_split_duckdb_sql(
    table: str = "documents", id_col: str = "doc_id",
    seed: str = "s1", train: float = 0.9, val: float = 0.05,
) -> str:
    t_hi = int(round(train * _BUCKETS))
    v_hi = t_hi + int(round(val * _BUCKETS))
    h = (
        f"CAST(CONCAT('0x', substr(md5(CONCAT('{seed}', ':', "
        f"CAST({id_col} AS VARCHAR))), 1, 15)) AS BIGINT) % {_BUCKETS}"
    )
    return f"""
SELECT {id_col} AS doc_id, CAST({h} AS BIGINT) AS bucket,
  CASE WHEN {h} < {t_hi} THEN 'train'
       WHEN {h} < {v_hi} THEN 'val'
       ELSE 'test' END AS split
FROM {table}"""


def source_quota_sample(
    df: DataFrame,
    quota: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "s1",
) -> DataFrame:
    """Cap every source at ``quota`` rows, chosen by deterministic hash
    rank — the data-mixing primitive (so one crawled domain can't drown
    the mixture, and the same rows are chosen on every rerun).

    Ranked by ``(hash64(seed || ':' || id), id)`` inside each source —
    i.e. a uniform random-but-reproducible draw; ties impossible since id
    breaks them. Returns ``(doc_id, source, rk)`` for the kept rows.

    Scale: one shuffle on source. A mega-hot source funnels into one
    task's WindowGroupLimit — but Spark's rank-limit pushdown keeps only
    ``quota`` rows per partition map-side before the shuffle
    (WindowGroupLimit Partial), so the skewed task receives at most
    ``quota × n_input_partitions`` rows, not the full source."""
    h = hash64(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= quota)
    )


def source_quota_sample_duckdb_sql(
    table: str = "documents", quota: int = 100,
    id_col: str = "doc_id", source_col: str = "source", seed: str = "s1",
) -> str:
    h = (
        f"CAST(CONCAT('0x', substr(md5(CONCAT('{seed}', ':', "
        f"CAST({id_col} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH r AS (
  SELECT {id_col} AS doc_id, {source_col} AS source,
         ROW_NUMBER() OVER (PARTITION BY {source_col}
                            ORDER BY {h} ASC, {id_col} ASC) AS rk
  FROM {table}
)
SELECT doc_id, source, CAST(rk AS INT) AS rk FROM r WHERE rk <= {quota}"""


def dup_span_stats(
    documents: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicate-substring statistics at word n-gram
    granularity (Lee et al. 2021 §4.1 ExactSubstr, word-aligned): an
    n-gram occurring more than once CORPUS-WIDE marks its whole span as
    duplicated; the per-doc fraction of tokens covered by any duplicated
    span is the signal pipelines cut or trim on (suffix-array exactness
    is replaced by fixed n word-grams — the standard distributed
    relaxation).

    Returns ``(doc_id, n_tokens, n_ngrams, n_dup_ngrams, covered_tokens,
    dup_token_frac)`` — every input doc appears (zeros when nothing is
    duplicated); ``covered_tokens`` is the size of the UNION of the
    [pos, pos+n-1] windows of duplicated n-grams.

    Scale shape: tokens/ngrams are map-side; ngram keys cross the wire as
    64-bit hashes (never the text). The corpus count is ONE
    partial-aggregated groupBy — hot boilerplate n-grams collapse
    map-side. The join back is hash-key equi-join; coverage explodes only
    DUPLICATED grams (rare by construction) before the doc_id groupBy."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
        F.array().cast("array<string>")
    )
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        words.alias("w"),
    ).select(
        "doc_id", "w", F.size("w").cast("long").alias("n_tokens")
    )
    cnt = F.greatest(F.col("n_tokens") - F.lit(n - 1), F.lit(0)).cast("int")
    # guard: Spark's sequence(1, n) generates DESCENDING for n < 1
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    grams = base.select(
        "doc_id",
        "n_tokens",
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("w"), (i + j).cast("int")) for j in range(n)]
                ),
            )
        ).alias("pos", "gram"),
    ).select("doc_id", "n_tokens", "pos", hash64(F.col("gram")).alias("gh"))

    corpus = grams.groupBy("gh").agg(F.count("*").alias("cnt"))
    dup = grams.join(corpus.where(F.col("cnt") >= 2), "gh")

    per_doc = dup.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_ngrams"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1)))
                )
            )
        ).cast("long").alias("covered_tokens"),
    )
    zero = F.lit(0).cast("long")
    return (
        base.select(
            "doc_id",
            "n_tokens",
            F.greatest(F.col("n_tokens") - F.lit(n - 1), F.lit(0))
            .cast("long")
            .alias("n_ngrams"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_ngrams",
            F.coalesce("n_dup_ngrams", zero).alias("n_dup_ngrams"),
            F.coalesce("covered_tokens", zero).alias("covered_tokens"),
            F.round(
                F.coalesce("covered_tokens", zero)
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_token_frac"),
        )
    )


def dup_span_stats_duckdb_sql(
    table: str = "documents", n: int = 8,
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
    CASE WHEN length(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')) > 0
         THEN string_split(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g'), ' ')
         ELSE CAST([] AS VARCHAR[]) END AS w
  FROM {table}
),
sized AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens FROM base),
grams AS (
  SELECT doc_id, n_tokens, i - 1 AS pos,
    CAST(CONCAT('0x', substr(md5(array_to_string(w[i:i+{n - 1}], ' ')), 1, 15)) AS BIGINT) AS gh
  FROM sized, LATERAL unnest(generate_series(1, GREATEST(n_tokens - {n - 1}, 0))) AS u(i)
),
corpus AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2),
dup AS (SELECT g.* FROM grams g JOIN corpus USING (gh)),
cov AS (
  SELECT doc_id, t AS tok
  FROM dup, LATERAL unnest(generate_series(pos, pos + {n - 1})) AS c(t)
  GROUP BY doc_id, t
),
dcnt AS (SELECT doc_id, COUNT(*) AS n_dup_ngrams FROM dup GROUP BY doc_id),
ccnt AS (SELECT doc_id, COUNT(*) AS covered_tokens FROM cov GROUP BY doc_id)
SELECT s.doc_id, s.n_tokens,
  CAST(GREATEST(s.n_tokens - {n - 1}, 0) AS BIGINT) AS n_ngrams,
  CAST(COALESCE(d.n_dup_ngrams, 0) AS BIGINT) AS n_dup_ngrams,
  CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
  ROUND(CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE) / GREATEST(s.n_tokens, 1), 6) AS dup_token_frac
FROM sized s LEFT JOIN dcnt d USING (doc_id) LEFT JOIN ccnt c USING (doc_id)"""


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "s1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``hash64(seed || ':' || id) mod 10000 < fraction * 10000`` for its
    stratum — Spark's ``sampleBy`` semantics with the properties it lacks:
    the SAME rows are kept on every rerun, at any parallelism, on any
    engine (the hash is the portable md5-derived ``hash64``), and
    appending new data never changes old keep/drop decisions. The draw is
    shared with ``deterministic_split`` (same bucket), so a row's sample
    membership is consistent with its split assignment.

    ``fractions`` maps stratum value → keep fraction; unlisted strata use
    ``default_fraction``. Pure map-side expression, zero shuffles."""
    for v, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {v!r} must be in [0,1], got {f}")
    bucket = (
        hash64(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
        % _BUCKETS
    )
    thresh = F.lit(int(round(default_fraction * _BUCKETS)))
    for v, f in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == v, F.lit(int(round(f * _BUCKETS)))
        ).otherwise(thresh)
    return df.where(bucket < thresh)


def stratified_sample_duckdb_sql(
    table: str,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "s1",
    default_fraction: float = 0.0,
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`stratified_sample` (same md5 hash, same
    thresholds) for the hash-checked driver oracle."""
    h = (
        f"CAST(CONCAT('0x', substr(md5(CONCAT('{seed}', ':', "
        f"CAST({id_col} AS VARCHAR))), 1, 15)) AS BIGINT) % {_BUCKETS}"
    )
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {int(round(f * _BUCKETS))}"
        for v, f in sorted(fractions.items())
    )
    thresh = f"CASE {cases} ELSE {int(round(default_fraction * _BUCKETS))} END"
    return f"SELECT {select} FROM {table} WHERE {h} < {thresh}"
