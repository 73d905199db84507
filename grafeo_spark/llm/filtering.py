"""Corpus-filtering stages for training-data pipelines: benchmark
decontamination, repetition features, PII redaction.

These complete the document-pipeline family next to dedup/quality/packing
(llm/dedup.py, llm/text.py) with the three filters every large-scale
pretraining pipeline runs before training:

- **decontamination** — remove documents sharing any exact word n-gram
  (canonically n=13) with an evaluation benchmark, so test questions
  don't leak into training data;
- **repetition features** — Gopher-style within-document repetition
  ratios (duplicate-line fraction, duplicate word-n-gram fraction for
  n = 2..4) used to drop degenerate/boilerplate text;
- **PII redaction** — regex scrubbing of emails / IPv4 addresses /
  phone-like digit runs with per-document match counts.

100 TB design: repetition features and redaction are pure per-row
Catalyst expressions (zero shuffle, ride the corpus partitioning).
Decontamination is one flat-map explode per side plus a semi-join on the
n-gram hash — the benchmark side is tiny (evaluation sets are MBs), so
AQE broadcasts it and the doc side never shuffles its exploded grams;
only the optional per-doc hit COUNT pays a groupBy shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grafeo_spark.llm.text import tokenize

# -- decontamination ---------------------------------------------------- #


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """All exact-length word n-grams (NON-distinct, space-joined) from an
    already-materialized token array; documents shorter than n tokens
    yield none — sub-length grams must not count as benchmark overlap.

    Callers working on a DataFrame should PROJECT the token array first
    and pass the column reference: a raw ``tokenize(text)`` expression
    inlined here is re-evaluated once per gram by the slice lambda
    (Catalyst does not CSE across lambda bodies) — measured ~5s of the
    sf0.1 decontamination pass before the projection split."""
    cnt = F.size(toks)
    idx = F.when(cnt >= n, F.sequence(F.lit(1), cnt - F.lit(n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def word_ngrams_exact(text: Column, n: int) -> Column:
    """Expression-form convenience over :func:`ngrams_from_tokens` —
    fine for single-use column contexts; DataFrame pipelines should
    project ``tokenize(text)`` once instead (see ngrams_from_tokens)."""
    return ngrams_from_tokens(tokenize(text), n)


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(id, n_hits) for every document sharing >= 1 exact word n-gram
    with the benchmark — the standard n-gram decontamination test
    (n=13 is the GPT-3/PaLM convention). Grams are compared by xxhash64
    (collision-free w.h.p. at benchmark scale)."""
    bg = (
        benchmark.select(tokenize(F.col(bench_text_col)).alias("_t"))
        .select(F.explode(ngrams_from_tokens(F.col("_t"), n)).alias("_g"))
        .select(F.xxhash64("_g").alias("_gh"))
        .distinct()
    )
    dg = (
        docs.select(F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("_t"))
        .select("id", F.explode(ngrams_from_tokens(F.col("_t"), n)).alias("_g"))
        .select("id", F.xxhash64("_g").alias("_gh"))
    )
    return (
        dg.join(bg, "_gh", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Documents with every benchmark-overlapping row removed. Avoids the
    hit-count shuffle: contaminated ids come from a distinct of the
    semi-joined gram stream, then one anti-join against the corpus."""
    bad = (
        contaminated_ids(docs, benchmark, n, id_col, text_col, bench_text_col)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(bad, id_col, "left_anti")


# -- repetition features (Gopher-style) --------------------------------- #


def repetition_features(text: Column) -> dict[str, Column]:
    """Per-document repetition ratios, each in [0, 1]:

    - ``dup_line_frac``: 1 - distinct/total over non-empty lines;
    - ``dup_{2,3,4}gram_frac``: 1 - distinct/total over exact word
      n-grams (0.0 when the document has fewer than n tokens).

    Pure per-row Catalyst — zero shuffle at any scale."""
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    nl = F.size(lines)
    out: dict[str, Column] = {
        "dup_line_frac": F.when(
            nl > 0,
            1.0 - F.size(F.array_distinct(lines)).cast("double") / nl,
        ).otherwise(F.lit(0.0))
    }
    for n in (2, 3, 4):
        grams = word_ngrams_exact(text, n)
        ng = F.size(grams)
        out[f"dup_{n}gram_frac"] = F.when(
            ng > 0,
            1.0 - F.size(F.array_distinct(grams)).cast("double") / ng,
        ).otherwise(F.lit(0.0))
    return out


def add_repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """DataFrame form of :func:`repetition_features`, with the token
    array projected ONCE — the per-gram slices then reference a cheap
    attribute instead of re-running tokenize per gram (see
    ngrams_from_tokens)."""
    out = df.withColumn("_t", tokenize(F.col(text_col)))
    text = F.col(text_col)
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    nl = F.size(lines)
    out = out.withColumn(
        "dup_line_frac",
        F.when(
            nl > 0, 1.0 - F.size(F.array_distinct(lines)).cast("double") / nl
        ).otherwise(F.lit(0.0)),
    )
    for n in (2, 3, 4):
        grams = ngrams_from_tokens(F.col("_t"), n)
        out = out.withColumn(f"_g{n}", grams)
        ng = F.size(F.col(f"_g{n}"))
        out = out.withColumn(
            f"dup_{n}gram_frac",
            F.when(
                ng > 0,
                1.0 - F.size(F.array_distinct(F.col(f"_g{n}"))).cast("double") / ng,
            ).otherwise(F.lit(0.0)),
        ).drop(f"_g{n}")
    return out.drop("_t")


# -- PII redaction ------------------------------------------------------- #

# RE2-compatible (no backreferences/lookaround) so the same patterns run
# in Spark (Java regex) and the DuckDB oracle (RE2).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # international-ish phone: +, digits and separators, 8+ digits total
    "phone": (r"\+\d[\d().\- ]{6,}\d", "<PHONE>"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Replace PII matches with typed placeholders and count matches per
    kind (``n_<kind>`` columns). Order matters (emails before phones so a
    phone pattern can't eat an address's digits); counts are taken on the
    ORIGINAL text. Pure per-row Catalyst."""
    pats = patterns or PII_PATTERNS
    out_col = out_col or text_col
    src = F.col(text_col)
    red = src
    for kind, (pat, repl) in pats.items():
        df = df.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(src, F.lit(pat), F.lit(0)))
        )
        red = F.regexp_replace(red, pat, repl)
    return df.withColumn(out_col, red)
