"""Deduplication operators for LLM-training-data pipelines.

Four tiers, all DataFrame-native (no Python UDFs):

  exact_dup_groups   — hash-groupBy on content md5. One shuffle on the
                       hash; at 100 TB this is the cheapest possible dedup.
  ngram_jaccard      — exact near-dup via shingle inverted index: explode
                       shingles → self-join on shingle → per-pair
                       intersection counts → Jaccard. Quadratic only within
                       shingle posting lists, not across the corpus.
  minhash_lsh        — MinHash signatures + LSH banding: candidate pairs
                       come from equality joins on band hashes (shuffle on
                       band key), then exact-Jaccard verification of the
                       (tiny) candidate set. THE scale path: cost is
                       O(docs × shingles × K) map-side + a key join.
  simhash            — 64-bit SimHash signatures from word-level md5 bit
                       votes; near-dups = signature-equality or low
                       Hamming distance buckets.

Engine-neutral hashing: every hash is an md5-hex expression (never Spark's
murmur `hash()`, which no other engine reproduces) so the DuckDB oracles in
plans/parity_llm can replay the exact pipeline. MinHash 'values' are
lexicographic minima of hex strings — uniform enough for banding, and
byte-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ exact


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical documents: md5(text) → group, keep groups
    with >1 member. Returns (content_hash, n, min_id, max_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("n"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n") > 1)
    )


# --------------------------------------------------------------- shingles


def shingle_expr(text_col: str, k: int = 3) -> Column:
    """Distinct word k-gram shingles of lower(text), as array<string>."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)]),
    )
    # short docs (< k words) get their whole text as the single shingle
    return F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.array_distinct(grams)
    )


def doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) exploded pairs — the inverted-index input."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(shingle_expr(text_col, k)).alias("shingle")
    )


# ---------------------------------------------------------- exact jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via the shingle inverted index.

    Plan: explode → self-join on shingle (a<b) → count intersections →
    join sizes → jaccard = i / (|A| + |B| - i). All shuffles are on
    shingle / doc keys; no cross product. Returns
    (doc_a, doc_b, n_common, size_a, size_b, jaccard)."""
    sh = doc_shingles(df, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b"))
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard")
    )


# ----------------------------------------------------------- minhash lsh


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """(doc_id, seed, minhash): per seed, min over shingles of
    md5(seed || '|' || shingle) — lexicographic min of hex strings."""
    sh = doc_shingles(df, text_col, id_col, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        sh.select("doc_id", "shingle", seeds)
        .groupBy("doc_id", "seed")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle")))).alias("minhash"))
    )


def lsh_band_hashes(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, band, band_hash): md5 over the band's minhashes in seed
    order. Docs sharing any band_hash are candidates."""
    rows_per_band = num_hashes // bands
    by_band = signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    ordered = F.array_sort(F.collect_list(F.struct("seed", "minhash")))
    return (
        by_band.groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws("|", F.transform(ordered, lambda s: s.minhash))
            ).alias("band_hash")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH candidate generation, then exact-Jaccard verification.

    The candidate join is an equality join on (band, band_hash) — at
    100 TB this shuffles only the 16-hash signatures, never the corpus,
    and verification touches only candidate pairs. Returns
    (doc_a, doc_b, jaccard) with exact jaccard ≥ threshold."""
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    bandh = lsh_band_hashes(sig, num_hashes, bands)
    a = bandh.alias("a")
    b = bandh.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification over candidates only
    sh = doc_shingles(df, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("b_id")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# --------------------------------------------------------------- simhash


def simhash_hex(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash as 16 lowercase hex chars.

    Word-level features; each word votes ±1 per bit using the first 16 hex
    chars of md5(word) (4 bits per char). Ties (sum == 0) vote 0 — the
    convention the oracle mirrors. Plan: explode words → explode 16 hex
    positions → nibble→4 bit votes → two groupBys. Everything stays in
    codegen; shuffle key is doc_id."""
    words = F.explode(
        F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    ).alias("word")
    base = df.select(F.col(id_col).alias("doc_id"), words).withColumn(
        "h", F.md5(F.col("word"))
    )
    pos = base.withColumn("p", F.explode(F.sequence(F.lit(1), F.lit(16))))
    # column-arg shift/substr/instr need the SQL forms (the Python API
    # wrappers only take literals for these)
    nib = pos.withColumn(
        "v", F.expr("instr('0123456789abcdef', substring(h, p, 1)) - 1")
    ).withColumn("b", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3))))
    votes = nib.withColumn(
        "vote", F.expr("CASE WHEN (shiftright(v, b) & 1) = 1 THEN 1 ELSE -1 END")
    )
    bit_sums = votes.groupBy("doc_id", "p", "b").agg(F.sum("vote").alias("s"))
    nibbles = bit_sums.groupBy("doc_id", "p").agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(1, b) ELSE 0 END")).alias("nv")
    )
    per_pos = nibbles.select(
        "doc_id",
        "p",
        F.expr("substring('0123456789abcdef', cast(nv AS int) + 1, 1)").alias("c"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("p", "c")))
    return per_pos.groupBy("doc_id").agg(
        F.concat_ws("", F.transform(ordered, lambda s: s.c)).alias("simhash")
    )
