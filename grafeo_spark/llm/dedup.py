"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB case: there is **no all-pairs comparison
anywhere** —
- exact dedup is one hash-groupBy shuffle on a 64-bit fingerprint;
- near-dup candidates come from banded MinHash-LSH (shingle → signature →
  band bucket → within-bucket join), so the join key is the band hash and
  the shuffle is proportional to bucket sizes, not n²;
- SimHash buckets by table-rotated prefixes for Hamming-radius probes.

The only O(candidates) work is the exact-Jaccard verification of bucket
collisions, which is the standard MinHash pipeline shape. All expressions
are Catalyst built-ins (xxhash64 / transform / array ops) — no Python UDFs.

With the default 64 hashes in 32 bands of 2 rows, a pair at Jaccard 0.8
is missed with probability (1 - 0.8²)^32 ≈ 6e-15 — the verified output is
exact in practice, which is what the correctness battery checks against a
brute-force oracle at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grafeo_spark.llm.text import shingles, tokenize


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, keep_id) for every row, keep_id = min id among rows with the
    same normalized token stream. One groupBy shuffle on the fingerprint."""
    fp = F.xxhash64(F.array_join(tokenize(F.col(text_col)), " "))
    with_fp = df.select(F.col(id_col).alias("id"), fp.alias("_fp"))
    keep = with_fp.groupBy("_fp").agg(F.min("id").alias("keep_id"))
    return with_fp.join(keep, "_fp").select("id", "keep_id")


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rows surviving exact dedup (keep the min-id representative)."""
    pairs = exact_duplicates(df, id_col, text_col)
    keep = pairs.filter(F.col("id") == F.col("keep_id")).select(F.col("id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """(id, _sh: array<string>) distinct k-token shingles per document."""
    sh = shingles(tokenize(F.col(text_col)), shingle_k)
    return df.select(F.col(id_col).alias("id"), sh.alias("_sh")).filter(F.size("_sh") > 0)


def signatures_from_sets(set_df: DataFrame, num_hashes: int = 64) -> DataFrame:
    """(id, signature) from an (id, _sh: array<string>) element-set frame.

    signature[i] = min over elements of xxhash64(elem, i), computed by
    exploding the sets and running `num_hashes` codegen'd min-aggregates
    (map-side partial agg, one shuffle on id). This deliberately avoids the
    nested higher-order-function formulation: HOF lambdas are interpreted
    per element and are re-evaluated in every self-join branch downstream,
    whereas the groupBy leaves the signatures behind a shuffle exchange that
    Spark's ReuseExchange serves to all branches of the LSH join without
    recomputation — the property that keeps the pipeline linear at scale."""
    exploded = set_df.select("id", F.explode("_sh").alias("_s"))
    mins = [
        F.min(F.xxhash64("_s", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)
    ]
    agg = exploded.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, signature: array<long>[num_hashes]) over k-token shingles."""
    return signatures_from_sets(
        shingle_sets(df, id_col, text_col, shingle_k), num_hashes
    )


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 32) -> DataFrame:
    """(a, b) candidate pairs whose signatures collide in >= 1 band.

    Shuffle key is (band index, band hash): only same-bucket rows meet, so
    cost tracks bucket occupancy — the LSH scale property."""
    sig = F.col("signature")
    n = F.size(sig)
    r = (n / F.lit(bands)).cast("int")
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(b.alias("band"), F.hash(F.slice(sig, b * r + 1, r)).alias("bh")),
    )
    buckets = sig_df.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    l = buckets.select(F.col("band").alias("b1"), F.col("bh").alias("h1"), F.col("id").alias("a"))
    rt = buckets.select(F.col("band").alias("b2"), F.col("bh").alias("h2"), F.col("id").alias("b"))
    return (
        l.join(rt, (F.col("b1") == F.col("b2")) & (F.col("h1") == F.col("h2")) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )


def verify_jaccard(pairs: DataFrame, shingle_df: DataFrame) -> DataFrame:
    """(a, b, jaccard) — exact shingle-set Jaccard for candidate pairs.
    `shingle_df` is `shingle_sets` output (id, _sh)."""
    sa = shingle_df.select(F.col("id").alias("a"), F.col("_sh").alias("_sha"))
    sb = shingle_df.select(F.col("id").alias("b"), F.col("_sh").alias("_shb"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("_sha", "_shb")).cast("double")
                / F.size(F.array_union("_sha", "_shb"))
            ).alias("jaccard"),
        )
    )


def near_duplicate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(a, b, jaccard) verified near-duplicate pairs — the full banded
    MinHash pipeline (shingle → minhash → band bucket → join → verify)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    cands = lsh_candidate_pairs(sigs, bands)
    sh = shingle_sets(df, id_col, text_col, shingle_k)
    return verify_jaccard(cands, sh).filter(F.col("jaccard") >= threshold)


def duplicate_clusters(pairs: DataFrame) -> DataFrame:
    """(id, cluster) — connected components over the near-dup pair graph;
    cluster = min id. Feed `near_duplicate_pairs` output."""
    from grafeo_spark.algorithms.components import connected_components

    return connected_components(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).select("id", F.col("component").alias("cluster"))


def dedup_near(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Rows surviving near-dedup: keep the min-id representative of each
    near-duplicate cluster."""
    pairs = near_duplicate_pairs(df, id_col, text_col, threshold)
    clusters = duplicate_clusters(pairs)
    drop = clusters.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 32,
    unit: str = "word",
) -> DataFrame:
    """(a, b, jaccard) near-duplicates under n-gram Jaccard — the same
    banded MinHash pipeline with word n-grams (the Gopher/C4-style dedup
    unit) or character n-grams (``unit="char"``, robust to tokenization
    differences) as the element set.

    Banding only separates pairs when the corpus's background similarity
    sits well below the threshold; char n-grams over a narrow vocabulary
    violate that (most pairs collide in some band), which is why word
    n-grams are the default unit."""
    from grafeo_spark.llm.text import char_ngrams

    if unit == "char":
        sh = char_ngrams(F.col(text_col), n)
    else:
        sh = shingles(tokenize(F.col(text_col)), n)
    sets = df.select(F.col(id_col).alias("id"), sh.alias("_sh")).filter(
        F.size("_sh") > 0
    )
    sigs = signatures_from_sets(sets, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands)
    return verify_jaccard(cands, sets).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over token hashes: bit i is the
    sign of sum(±1) of each token's hash bit i.

    Computed by exploding tokens and running 64 codegen'd sum-aggregates
    (same rationale as ``signatures_from_sets``: interpreted HOF aggregates
    would be re-evaluated in every branch of the bucket self-join, whereas
    the groupBy leaves codes behind a reusable shuffle exchange). Tokenless
    documents keep code 0 via the left join."""
    ids = df.select(F.col(id_col).alias("id"))
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    votes = []
    masks = []
    for i in range(64):
        mask = (1 << i) if i < 63 else -(1 << 63)  # signed-long bit 63
        masks.append(mask)
        votes.append(
            F.sum(
                F.when(F.col("_h").bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)
            ).alias(f"_v{i}")
        )
    agg = exploded.groupBy("id").agg(*votes)
    code = F.lit(0).cast("long")
    for i, mask in enumerate(masks):
        code = code + F.when(F.col(f"_v{i}") > 0, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    codes = agg.select("id", code.alias("simhash"))
    return ids.join(codes, "id", "left").fillna({"simhash": 0})


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    prefix_bits: int = 16,
    tables: int = 4,
) -> DataFrame:
    """(a, b, hamming) pairs within a Hamming radius, via the rotated-prefix
    bucket trick: hash each code into `tables` buckets of `prefix_bits`
    (rotations spread differing bits), join within buckets, verify exact
    Hamming — again no all-pairs."""
    codes = simhash(df, id_col, text_col)
    # disjoint bit windows: a pair within Hamming distance < tables must
    # agree on at least one window (pigeonhole); shift counts are Python
    # literals, so the windows are unrolled as a union
    window_shift = 64 // tables
    mask = (1 << prefix_bits) - 1
    b = None
    for t in range(tables):
        cur = codes.select(
            "id",
            "simhash",
            F.lit(t).alias("t"),
            F.shiftright(F.col("simhash"), t * window_shift)
            .bitwiseAND(F.lit(mask))
            .alias("bucket"),
        )
        b = cur if b is None else b.unionByName(cur)
    l = b.select(F.col("t").alias("t1"), F.col("bucket").alias("k1"), F.col("id").alias("a"), F.col("simhash").alias("ha"))
    r = b.select(F.col("t").alias("t2"), F.col("bucket").alias("k2"), F.col("id").alias("b"), F.col("simhash").alias("hb"))
    return (
        l.join(r, (F.col("t1") == F.col("t2")) & (F.col("k1") == F.col("k2")) & (F.col("a") < F.col("b")))
        .select("a", "b", hamming_distance(F.col("ha"), F.col("hb")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
