"""LLM training-data pipeline operators (superset of the reference, per the
north-star brief): dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
vector similarity search (brute-force + SRP-LSH ANN), text analysis
(tokens / quality / language-ID / fingerprints), multimodal column
plumbing."""

from grafeo_spark.llm.dedup import (
    dedup_exact,
    dedup_near,
    duplicate_clusters,
    exact_duplicates,
    hamming_distance,
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicate_pairs,
    ngram_jaccard_pairs,
    signatures_from_sets,
    simhash,
    simhash_near_pairs,
    verify_jaccard,
)
from grafeo_spark.llm.multimodal import (
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    fake_decode_features,
    resize_stub,
    sample_frames,
)
from grafeo_spark.llm.similarity import (
    add_srp_buckets,
    ann_join,
    ann_topk,
    similarity_join,
    topk,
)
from grafeo_spark.llm.text import (
    add_text_features,
    char_ngrams,
    detect_language,
    fingerprint,
    quality_features,
    quality_score,
    shingles,
    token_count,
    tokenize,
)

__all__ = [
    "dedup_exact",
    "dedup_near",
    "duplicate_clusters",
    "exact_duplicates",
    "hamming_distance",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "near_duplicate_pairs",
    "ngram_jaccard_pairs",
    "signatures_from_sets",
    "simhash",
    "simhash_near_pairs",
    "verify_jaccard",
    "FEATURES_SCHEMA",
    "MEDIA_SCHEMA",
    "extract_features",
    "fake_decode_features",
    "resize_stub",
    "sample_frames",
    "add_srp_buckets",
    "ann_join",
    "ann_topk",
    "similarity_join",
    "topk",
    "add_text_features",
    "char_ngrams",
    "detect_language",
    "fingerprint",
    "quality_features",
    "quality_score",
    "shingles",
    "token_count",
    "tokenize",
]
