"""Text analysis operators for training-data pipelines.

All pure Catalyst expressions (split/transform/aggregate/xxhash64) — no
Python UDFs, so every operator runs inside whole-stage codegen and scales
linearly with executors. These extend the reference's string surface
(filter.rs:759-1060 scalar functions) with the corpus-preparation ops a
100 TB text pipeline needs: tokenization, shingling, quality features,
language ID, fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword seed sets for the n-gram/stopword heuristic
# language detector (public common-words lists).
_STOPWORDS = {
    "en": "the of and to in is that it for on with as are was be this have from or by not",
    "de": "der die das und ist nicht ein eine zu den von mit für auf im des sich dem werden",
    "es": "el la los las de que y en un una es por con para del se su al como más",
    "fr": "le la les de des et est un une du que pour dans qui sur pas au avec ne ce",
    "it": "il la le di che e un una per del con non sono da come più anche su questo",
    "pt": "o a os as de que e um uma para do da com não por se no na mais como",
}


def tokenize(text: Column) -> Column:
    """Lowercased word tokens; punctuation-split (BPE-ish regex boundary)."""
    cleaned = F.trim(F.lower(F.regexp_replace(text, r"[^\p{L}\p{N}']+", " ")))
    return F.filter(F.split(cleaned, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def bpe_token_count(text: Column) -> Column:
    """GPT-2-style pre-tokenizer segment count — the standard no-model
    estimate of a BPE tokenizer's token count (each pre-token splits into
    >= 1 BPE token, so this lower-bounds the true count). Contractions,
    letter runs, digit runs and punctuation runs each count once;
    whitespace-only segments don't. Pure Catalyst regexp — no tokenizer
    model in the hot path."""
    pat = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the MinHash input unit)."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, k), " "))
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams (for n-gram Jaccard similarity)."""
    s = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, n)))


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic document-quality signals (length/punct/stopword ratios) —
    the standard pre-training filter features."""
    toks = tokenize(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    sw = F.split(F.lit(_STOPWORDS["en"]), " ")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    mean_tok = F.when(n_tok > 0, n_char.cast("double") / n_tok).otherwise(F.lit(0.0))
    return {
        "n_chars": n_char.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len": mean_tok,
        "alpha_ratio": F.when(n_char > 0, alpha / n_char).otherwise(0.0),
        "digit_ratio": F.when(n_char > 0, digit / n_char).otherwise(0.0),
        "punct_ratio": F.when(n_char > 0, punct / n_char).otherwise(0.0),
        "upper_ratio": F.when(n_char > 0, upper / n_char).otherwise(0.0),
        "stopword_ratio": F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0),
    }


def quality_score(text: Column) -> Column:
    """Composite score in [0, 1]: rewards sane length, word shape, and
    English stopword density; penalizes digit/punct soup."""
    f = quality_features(text)
    len_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100_000), 1.0).otherwise(0.3)
    shape_ok = F.when((f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 12), 1.0).otherwise(0.5)
    clean = 1.0 - F.least(f["digit_ratio"] * 2 + f["punct_ratio"] * 2, F.lit(1.0))
    stop = F.least(f["stopword_ratio"] * 3, F.lit(1.0))
    return (0.3 * len_ok + 0.2 * shape_ok + 0.3 * clean + 0.2 * stop).alias("quality")


def detect_language(text: Column) -> Column:
    """Stopword-vote language ID with a CJK character-ratio shortcut —
    the classic cheap heuristic (fasttext-style lid is a model; this is the
    no-model fallback). Returns the ISO code with the most stopword hits;
    script-dominant text short-circuits to 'ja' (kana), 'ko' (hangul) or
    'zh' (han) — kana is checked first because Japanese mixes kanji in;
    'und' when nothing matches."""
    toks = tokenize(text)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(text), F.lit(1))
    kana = F.length(F.regexp_replace(text, r"[^぀-ヿ]", ""))
    hangul = F.length(F.regexp_replace(text, r"[^가-힯ᄀ-ᇿ㄰-㆏]", ""))
    han = F.length(F.regexp_replace(text, r"[^㐀-䶿一-鿿]", ""))
    scores = []
    for lang, words in _STOPWORDS.items():
        sw = F.split(F.lit(words), " ")
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        # struct ordering: score first, then language for deterministic ties
        scores.append(F.struct((hits / n_tok).alias("s"), F.lit(lang).alias("l")))
    best = F.greatest(*scores)
    return (
        F.when(kana / n_chars > 0.05, F.lit("ja"))
        .when(hangul / n_chars > 0.2, F.lit("ko"))
        .when(han / n_chars > 0.2, F.lit("zh"))
        .when(best["s"] >= 0.05, best["l"])
        .otherwise(F.lit("und"))
    )


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of the normalized token stream (rolling
    content hash; exact-dedup key)."""
    return F.xxhash64(F.array_join(tokenize(text), " "))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) — sliding word-window document
    chunking, the context-length-fitting stage of a training-data pipeline
    (every pre-training corpus chunks documents to the model's sequence
    length; the standard shape is fixed windows with overlap so no
    boundary context is lost).

    Pure Catalyst (split -> sequence of starts -> posexplode -> slice):
    linear in corpus size, no shuffle at all — chunking is per-row, so at
    100 TB it runs map-side inside whole-stage codegen. Words are
    whitespace-split (not the normalizing ``tokenize``) so chunk text
    preserves the original tokens; runs of whitespace collapse to single
    spaces on rejoin. Empty documents produce one empty chunk, keeping
    the doc-id set stable through the stage."""
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens ({max_tokens})"
        )
    stride = max_tokens - overlap
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(words) - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    exploded = df.select(
        F.col(id_col), words.alias("__w"), F.posexplode(starts).alias("chunk_id", "__start")
    )
    piece = F.slice(F.col("__w"), F.col("__start"), max_tokens)
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def pack_chunk_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
    budget: int = 1024,
) -> DataFrame:
    """(id, chunk_id, n_tokens, seq_id) — greedy in-order packing of a
    document's chunks into token-budget training sequences (the sequence-
    packing stage that follows :func:`chunk_documents` in a pre-training
    pipeline: batches want sequences filled close to the model's context
    length, not one short chunk each).

    Semantics: scan chunks in ``chunk_col`` order per document; a chunk
    that would push the running sequence past ``budget`` starts the next
    sequence (a chunk larger than the budget gets a sequence of its own).
    Deterministic — replayable as a recursive CTE.

    Plan shape: ONE hash shuffle (groupBy id), then the whole greedy scan
    is an F.aggregate fold over the collected per-doc chunk array —
    Catalyst expressions end to end, no Python, no window sort, and the
    per-task state is one document's chunk list. At 100 TB: packing is
    per-document, so it scales with the id-hash partitioning like every
    other per-doc stage."""
    from pyspark.sql.types import StructType

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    chunks = df.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(chunk_col).cast("int").alias("c"),
                    F.col(tokens_col).cast("long").alias("t"),
                )
            )
        ).alias("__cs")
    )
    init = F.struct(
        F.array().cast("array<int>").alias("seqs"),
        F.lit(0).cast("int").alias("seq"),
        F.lit(0).cast("long").alias("cur"),
    )

    def step(acc, x):
        over = (acc.getField("cur") + x.getField("t") > budget) & (
            acc.getField("cur") > 0
        )
        seq = acc.getField("seq") + F.when(over, 1).otherwise(0)
        cur = F.when(over, x.getField("t")).otherwise(
            acc.getField("cur") + x.getField("t")
        )
        return F.struct(
            F.concat(acc.getField("seqs"), F.array(seq)).alias("seqs"),
            seq.cast("int").alias("seq"),
            cur.cast("long").alias("cur"),
        )

    packed = chunks.select(
        id_col,
        "__cs",
        F.aggregate(F.col("__cs"), init, step).getField("seqs").alias("__seqs"),
    )
    z = F.explode(F.arrays_zip(F.col("__cs"), F.col("__seqs"))).alias("z")
    return packed.select(id_col, z).select(
        id_col,
        F.col("z.__cs.c").alias(chunk_col),
        F.col("z.__cs.t").cast("int").alias(tokens_col),
        F.col("z.__seqs").cast("int").alias("seq_id"),
    )


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: append every feature column (the 'featurize' stage of a
    corpus pipeline)."""
    t = F.col(text_col)
    out = df
    for name, col in quality_features(t).items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("quality", quality_score(t))
        .withColumn("language", detect_language(t))
        .withColumn("fingerprint", fingerprint(t))
    )
