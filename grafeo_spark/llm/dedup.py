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

Banding is derived from the requested threshold (``banding_for_threshold``):
(num_hashes, bands, rows) are chosen so the S-curve midpoint (1/b)^(1/r)
sits just below the threshold while the miss probability (1 - t^r)^b stays
under 1e-6 — the verified output is exact in practice, which is what the
correctness battery checks against a brute-force oracle at sf0.01. A fixed
wide-band default (e.g. 32 bands of 2 rows, midpoint 0.18) would instead
promote every pair above the *background* similarity to an exact-verify
candidate — the scale-killer on any corpus with boilerplate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from grafeo_spark.llm.text import shingles, tokenize

import os

# Candidate-pair budget for the banded LSH join, enforced by the
# occupancy probe inside lsh_candidate_pairs (one partial-aggregated job,
# no extra pass). Calibrated against the single-node scale rehearsals:
# completed — 7.3e7 pairs (sf25 3-shingle @ 0.8), 1.05e8 (sf5 word-2-gram
# @ 0.6, ~68 GB spill, near the brim); FATAL — 2.90e8 (sf50 3-shingle,
# measured exactly by the probe; the verify shuffle exhausted ~70 GB of
# spill disk mid-join, r12) and 2.3e9 (sf25 word-2-gram, r11). 1.5e8
# sits between the largest completed estimate and the smallest measured-
# fatal one. On a cluster spill capacity scales out with executors —
# raise the env var there (the escalated partitioning already spreads
# the same volume evenly, llm/dedup.py PAIRS_PER_TASK).
BANDED_PAIRS_MAX = int(os.environ.get("SPARK_GRAFT_BANDED_PAIRS_MAX", 150_000_000))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, keep_id) for every row, keep_id = min id among rows with the
    same normalized token stream. One groupBy shuffle on the fingerprint."""
    fp = F.xxhash64(F.array_join(tokenize(F.col(text_col)), " "))
    with_fp = df.select(F.col(id_col).alias("id"), fp.alias("_fp"))
    keep = with_fp.groupBy("_fp").agg(F.min("id").alias("keep_id"))
    # the fingerprint→keeper map is corpus-sized (one row per distinct
    # content); hint it off Catalyst's misestimated broadcast path (the
    # r11 sf25 finding — see _content_members)
    return with_fp.join(keep.hint("merge"), "_fp").select("id", "keep_id")


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rows surviving exact dedup (keep the min-id representative)."""
    pairs = exact_duplicates(df, id_col, text_col)
    keep = pairs.filter(F.col("id") == F.col("keep_id")).select(F.col("id").alias(id_col))
    return df.join(keep.hint("merge"), id_col, "left_semi")


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """(id, _sh: array<string>) distinct k-token shingles per document."""
    sh = shingles(tokenize(F.col(text_col)), shingle_k)
    return df.select(F.col(id_col).alias("id"), sh.alias("_sh")).filter(F.size("_sh") > 0)


def _spread_by_id(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition compact doc rows on ``id_col`` before a compute-
    heavy per-element map side (tokenize + expensive hash), ONLY when the
    scan is narrower than the session: a small corpus scans as one task
    and keeps 1-2 of 32 cores busy (measured on the sf0.1 sha256 SimHash
    stage, ~2.4s single-task). On a wide production scan this is a no-op —
    there the consumer's own exchange carries partial aggregates, smaller
    than the text, so adding a text shuffle would be a pessimization.
    Hash partitioning on the id (deterministic) rather than round-robin:
    retried map tasks reproduce their assignment (SPARK-38388) and no
    sort-before-repartition is paid."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism, F.col(id_col))


def shingle_hash_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    unit: str = "word",
) -> DataFrame:
    """(id, _shh: long) — one row per k-element shingle *occurrence*,
    identified by a 64-bit hash of its elements.

    This is the shared scale-path input for MinHash signatures AND exact
    verification: explode elements with position, form each shingle with
    window ``lead`` (all JVM-side — the array-of-strings formulation pays
    an interpreted higher-order-function lambda per shingle, ~3× slower),
    and hash the k elements in one ``xxhash64`` call. The window sort and
    every downstream aggregate share one hash-partition-by-id exchange,
    which ReuseExchange serves to both the signature and the set branch.

    Set semantics downstream: MinHash is duplicate-insensitive (min over a
    multiset equals min over its set), and the verify branch applies
    ``collect_set``. Documents shorter than k elements contribute their
    single truncated shingle (``xxhash64`` skips the null leads), matching
    the array formulation in :func:`shingles`.
    """
    if unit == "char":
        elems = F.split(F.lower(F.col(text_col)), "")
    else:
        elems = tokenize(F.col(text_col))
    # NOT spread here: an A/B of _spread_by_id on this path (move the
    # window's by-id exchange before the posexplode) measured ngram
    # dedup ~8% SLOWER at sf0.1 — xxhash64 shingling is cheap enough
    # that the fixed, non-coalescable user exchange costs more than the
    # 1-task map side saves; the banded-join stages downstream are
    # already wide. SimHash's sha256 path is the opposite case (below).
    rows = df.select(F.col(id_col).alias("id"), F.posexplode(elems).alias("pos", "_t"))
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("_t")] + [F.lead("_t", j).over(w) for j in range(1, shingle_k)]
    n = F.count("*").over(Window.partitionBy("id"))
    return (
        rows.select("id", "pos", F.xxhash64(*parts).alias("_shh"), n.alias("_n"))
        .filter(
            (F.col("pos") <= F.col("_n") - shingle_k)
            | ((F.col("_n") < shingle_k) & (F.col("pos") == 0))
        )
        .select("id", "_shh")
    )


def signatures_from_hash_rows(row_df: DataFrame, num_hashes: int) -> DataFrame:
    """(id, signature) from a (id, _shh) shingle-occurrence frame: num_hashes
    codegen'd min-aggregates over fixed-width rehashes of the shingle hash."""
    mins = [
        F.min(F.xxhash64("_shh", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)
    ]
    agg = row_df.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature")
    )


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


def banding_for_threshold(
    threshold: float, target_miss: float = 1e-6, max_hashes: int = 192
) -> tuple[int, int, int]:
    """Choose ``(num_hashes, bands, rows)`` for a Jaccard threshold.

    Maximizes the S-curve midpoint ``(1/bands)**(1/rows)`` (fewer false
    candidates) subject to the miss probability at the threshold,
    ``(1 - threshold**rows)**bands``, staying below ``target_miss`` — so the
    banded pipeline remains effectively exact versus a brute-force oracle.
    Ties break toward fewer hashes (cheaper signatures). E.g. threshold
    0.8 → (128, 32, 4) with midpoint 0.42 and miss ≈ 5e-8; threshold
    0.6 → (192, 64, 3) with midpoint 0.25 and miss ≈ 2e-7.
    """
    best_key, best = None, None
    for rows in range(2, 9):
        for bands in (4, 6, 8, 12, 16, 24, 32, 48, 64):
            n = bands * rows
            if n > max_hashes:
                continue
            miss = (1.0 - threshold**rows) ** bands
            if miss > target_miss:
                continue
            key = ((1.0 / bands) ** (1.0 / rows), -n)
            if best_key is None or key > best_key:
                best_key, best = key, (n, bands, rows)
    if best is None:  # very low thresholds: widest allowed configuration
        return (max_hashes // 2 * 2, max_hashes // 2, 2)
    return best


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 32, max_bucket: int = 4096
) -> DataFrame:
    return _lsh_candidate_pairs_scaled(sig_df, bands, max_bucket)[0]


# each banded-join / verify reduce task carries on the order of this many
# candidate pairs; the occupancy probe's exact pair estimate divided by it
# sets the shuffle width for the pair-volume stages (see
# _lsh_candidate_pairs_scaled). Sized from the verify join, the heaviest
# flow: each pair drags two collect_set shingle arrays (~1.5-3 KB each at
# the measured corpora), so 1e5 pairs/task ≈ 200-600 MB of in-flight task
# volume — inside execution memory, clear of the spill regime the r11
# sf25 rehearsal measured at the session-default width.
PAIRS_PER_TASK = 100_000


def _lsh_candidate_pairs_scaled(
    sig_df: DataFrame, bands: int = 32, max_bucket: int = 4096
) -> tuple[DataFrame, int]:
    """(a, b) candidate pairs whose signatures collide in >= 1 band.

    Shuffle key is (band index, band hash): only same-bucket rows meet, so
    cost tracks bucket occupancy — the LSH scale property.

    Occupancy guard: exact-content grouping upstream bounds buckets on
    byte-identical corpora, but *near*-identical boilerplate (same long
    header, one varying line) can still load one (band, bh) bucket with
    millions of distinct members, making the within-bucket self-join a
    single quadratic task. Buckets larger than ``max_bucket`` are
    re-split into ``ceil(size/max_bucket)`` sub-buckets salted by a
    BAND-DEPENDENT rehash of the full-signature hash: members with
    IDENTICAL signatures — which collide in every band and must pair —
    always share a salt, while near-identical members split apart in this
    band can still meet in any other matching band. The band in the salt
    hash is what makes the per-band split events independent — salting on
    the signature hash alone correlates them perfectly (a pair split once
    is split everywhere), which measured ~0.33 recall on a hot-bucket
    corpus vs ~1.0 with the band mixed in. A pair is lost only if every
    one of its matching bands independently splits it: with m matching
    bands and s splits the miss probability is (1-1/s)^m — negligible
    except under adversarial skew, the documented recall-at-the-margin
    trade for bounded per-task work.

    The guard is ADAPTIVE: one partial-aggregated occupancy probe over
    the (checkpointed) bucket table finds the oversized buckets; when
    there are none — every healthy corpus — the join runs with no salt
    column at all, identical to the unguarded plan. Only a skewed corpus
    pays for its skew. (Two rejected formulations, both A/B'd at sf0.1:
    a window count over (band, bh) added a sort + an exchange per side
    [+3s/+5s on the two battery entries]; an unconditional salt join kept
    the broadcast wait and the wider shuffle key on healthy data.)"""
    sig = F.col("signature")
    n = F.size(sig)
    r = (n / F.lit(bands)).cast("int")
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(b.alias("band"), F.hash(F.slice(sig, b * r + 1, r)).alias("bh")),
    )
    buckets = sig_df.select(
        "id",
        F.xxhash64(sig.cast("string")).alias("_sk"),
        F.explode(band_structs).alias("bk"),
    ).select("id", "_sk", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    occ = buckets.groupBy("band", "bh").agg(F.count("*").alias("_occ"))
    hot = occ.filter(F.col("_occ") > max_bucket).select(
        "band",
        "bh",
        F.ceil(F.col("_occ") / F.lit(max_bucket)).cast("long").alias("_nsplit"),
    )
    # Adaptive: the probe is one partial-aggregated job whose shuffle
    # rows are (band, bh, count) — tiny. Callers that compute signatures
    # through a non-trivial pipeline should checkpoint/persist ``sig_df``
    # (as _group_rep_pairs does) so the probe and both join sides read
    # one materialized per-doc signature row instead of recomputing.
    # count(), not take(1)/isEmpty(): on the (typical) empty result a
    # take runs Spark's incremental limit scale-up — the same aggregate
    # re-executed over 1, then 4x, then 20x partitions — which measured
    # as multi-second run-to-run jitter on the battery.
    # The SAME probe job also predicts the bucket join's output volume:
    # sum over buckets of occ*(occ-1)/2 (divided by the salt split count
    # the guard will apply) is exactly the candidate-pair row count the
    # join will emit. The r11 sf25 rehearsal showed this is the quantity
    # that kills a run — word-2-gram @ 0.6 estimated 2.30e9 pairs and
    # exhausted >68 GB of single-node spill disk mid-join, while the
    # 3-shingle @ 0.8 default estimated 7.3e7 and completed — so fail
    # fast HERE, with sizing guidance, instead of hours into the shuffle.
    _nsplit = F.when(
        F.col("_occ") > max_bucket, F.ceil(F.col("_occ") / F.lit(max_bucket))
    ).otherwise(F.lit(1))
    probe = occ.agg(
        F.sum(F.when(F.col("_occ") > max_bucket, 1).otherwise(0)).alias("_hot"),
        F.sum(F.col("_occ") * (F.col("_occ") - 1) / 2 / _nsplit).alias("_pairs"),
    ).collect()[0]
    est_pairs = int(probe._pairs or 0)
    if est_pairs > BANDED_PAIRS_MAX:
        raise ValueError(
            f"lsh_candidate_pairs: the banded join would emit ~{est_pairs:,} "
            f"candidate pairs (> {BANDED_PAIRS_MAX:,}). This corpus/threshold "
            "combination has too much background similarity for the banding "
            "to separate (measured single-node walls: 2.9e8 and 2.3e9 pairs "
            "exhausted the spill disk). Raise the Jaccard threshold, use a larger "
            "shingle unit (word 3-grams instead of 2-grams), or — on a "
            "cluster with enough aggregate spill capacity — raise "
            "SPARK_GRAFT_BANDED_PAIRS_MAX to accept the shuffle."
        )
    if (probe._hot or 0) == 0:
        join_cols = ("band", "bh")
        buckets = buckets.drop("_sk")
    else:
        join_cols = ("band", "bh", "salt")
        buckets = (
            buckets.join(F.broadcast(hot), ["band", "bh"], "left")
            .withColumn(
                "salt",
                F.when(
                    F.col("_nsplit") > 1,
                    F.pmod(F.xxhash64(F.col("_sk"), F.col("band")), F.col("_nsplit")),
                ).otherwise(F.lit(0)),
            )
            .drop("_sk", "_nsplit")
        )
    # Partition escalation: the probe's EXACT pair-volume estimate also
    # sizes the shuffles that carry that volume. At the session default
    # (shuffle.partitions = core count) a task's share of the candidate
    # pairs grows linearly with the corpus and tips the sf25 decade into
    # the spill/memory-pressure regime (the r11 superlinearity). Widening
    # only these stages — never the session default, which an sf5 A/B
    # showed regresses the iterative pregel family 2.4x — keeps per-task
    # volume roughly constant at any corpus size.
    base = int(sig_df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parts = int(min(4096, max(base, est_pairs // PAIRS_PER_TASK)))
    l = buckets.select(
        *[F.col(c).alias(c + "_l") for c in join_cols], F.col("id").alias("a")
    )
    # sort-merge hint: the bucket table is |reps| × bands rows — at
    # sf25 scale Catalyst's static estimate under the lazily-checkpointed
    # signature frame read small enough to pick a 200M-row broadcast
    # build (driver OOM); the hinted merge join partitions on the bucket
    # key (the documented scale-out dimension) and, unlike shuffle_hash,
    # spills gracefully instead of moving the OOM to the executors
    # (validated in the sf25 rehearsal, BENCH_SCALE.md)
    rt = buckets.select(
        *[F.col(c).alias(c + "_r") for c in join_cols], F.col("id").alias("b")
    ).hint("merge")
    if parts > base:
        # co-partition both sides at the escalated width; the SMJ reuses
        # the distribution, so this replaces (not adds to) its exchanges
        l = l.repartition(parts, *[c + "_l" for c in join_cols])
        rt = rt.repartition(parts, *[c + "_r" for c in join_cols])
    cond = F.col("a") < F.col("b")
    for c in join_cols:
        cond = cond & (F.col(c + "_l") == F.col(c + "_r"))
    pairs = l.join(rt, cond).select("a", "b")
    if parts > base:
        # the dedup aggregate's exchange carries near-full pair volume;
        # pre-partitioning on its keys at the escalated width makes the
        # aggregation reuse this exchange instead of one at `base`
        pairs = pairs.repartition(parts, "a", "b")
    return pairs.distinct(), parts


def verify_jaccard_from_hash_rows(
    pairs: DataFrame, row_df: DataFrame, parts: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """(a, b, jaccard) — exact Jaccard over the hashed shingle sets.
    ``row_df`` is :func:`shingle_hash_rows` output. The set frame is
    materialized ONCE (lazy checkpoint, r16): both verify join sides
    consumed it, and ReuseExchange only dedupes the by-id exchange — the
    final ``collect_set`` aggregation itself ran once per side.
    Identical to string-set Jaccard (element→hash is injective w.h.p.).
    ``threshold`` forwards to :func:`verify_jaccard`'s size prefilter."""
    sets = (
        row_df.groupBy("id")
        .agg(F.collect_set("_shh").alias("_sh"))
        .localCheckpoint(eager=False)
    )
    return verify_jaccard(pairs, sets, parts=parts, threshold=threshold)


def verify_jaccard(
    pairs: DataFrame, shingle_df: DataFrame, parts: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """(a, b, jaccard) — exact shingle-set Jaccard for candidate pairs.
    `shingle_df` is `shingle_sets` output (id, _sh). ``parts`` (from the
    candidate stage's pair-volume estimate) widens the two verify joins —
    their shuffles carry |pairs| WIDE array rows, the heaviest flow in
    the pipeline — so per-task volume stays bounded at any corpus size.

    ``threshold``: EXACT size prefilter (r16, guide §3.2 — shrink the
    join input): J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so a pair whose set
    sizes differ by more than the threshold ratio cannot verify and is
    dropped BEFORE the joins that drag the wide shingle arrays. The size
    frame is two narrow longs per doc (read off the same materialized set
    frame — no extra aggregation), so the two prefilter joins shuffle
    |pairs| skinny rows to save the pruned fraction of |pairs| array
    rows. No false negatives — the returned relation, post threshold
    filter, is unchanged."""
    if threshold is not None:
        sizes = shingle_df.select("id", F.size("_sh").alias("_n"))
        na = sizes.select(F.col("id").alias("a"), F.col("_n").alias("_na")).hint(
            "shuffle_hash"
        )
        nb = sizes.select(F.col("id").alias("b"), F.col("_n").alias("_nb")).hint(
            "shuffle_hash"
        )
        pairs = (
            pairs.join(na, "a")
            .join(nb, "b")
            .filter(
                F.least("_na", "_nb")
                >= F.lit(threshold) * F.greatest("_na", "_nb")
            )
            .drop("_na", "_nb")
        )
    # the shingle-set sides are corpus-sized WITH wide array rows — a
    # misestimated broadcast build here is the worst case; force the
    # shuffled build (bounded per task)
    sa = shingle_df.select(F.col("id").alias("a"), F.col("_sh").alias("_sha")).hint(
        "shuffle_hash"
    )
    sb = shingle_df.select(F.col("id").alias("b"), F.col("_sh").alias("_shb")).hint(
        "shuffle_hash"
    )
    widened = False
    if parts is not None:
        base = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        if parts > base:
            widened = True
            pairs = pairs.repartition(parts, "a")
            sa = sa.repartition(parts, "a")
            sb = sb.repartition(parts, "b")
    j1 = pairs.join(sa, "a")
    if widened:
        # explicit width for the second join's left side too — its shuffle
        # carries |pairs| rows each dragging a wide _sha array
        j1 = j1.repartition(parts, "b")
    return (
        j1.join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("_sha", "_shb")).cast("double")
                / F.size(F.array_union("_sha", "_shb"))
            ).alias("jaccard"),
        )
    )


def _content_members(sh_rows: DataFrame) -> DataFrame:
    """(id, gid) — gid = min id among documents with the byte-identical
    shingle set (exact-content grouping).

    This is the LSH bucket-skew guard: a boilerplate-heavy corpus (millions
    of identical documents) previously put every copy into the same band
    bucket, turning the within-bucket join into one quadratic task. Grouping
    identical contents FIRST means bucketing only ever sees one
    representative per distinct content, so bucket occupancy is bounded by
    distinct-content counts, and the identical copies rejoin by linear
    group joins."""
    sets = sh_rows.groupBy("id").agg(
        F.sort_array(F.collect_set("_shh")).alias("_set")
    )
    # xxhash64 hashes the array<long> natively — the old cast("string")
    # built a ~10 KB rendered string per document just to feed the hash
    # (guide §2.3: narrower bytes into the expression, same grouping)
    keyed = sets.select("id", F.xxhash64(F.col("_set")).alias("_ck"))
    groups = keyed.groupBy("_ck").agg(F.min("id").alias("gid"))
    # sort-merge hint: `groups` is one row per DISTINCT CONTENT — a
    # corpus-sized frame (on a decorrelated corpus it IS the corpus).
    # Catalyst's static estimate under the aggregate reads small and
    # picks a broadcast build, which at sf25 (6.25M docs) dies with
    # notEnoughMemoryToBuildAndBroadcastTable; the hinted merge join
    # shuffles on `_ck` and spills gracefully at any corpus size
    # (strategy validated in the r11 sf25 rehearsal, BENCH_SCALE.md).
    return keyed.join(groups.hint("merge"), "_ck").select("id", "gid")


def _group_rep_pairs(
    sh_rows: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_bucket: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """(members, rep_pairs): exact-content groups plus the verified
    near-duplicate relation between group REPRESENTATIVES — the bounded
    core of the banded pipeline (everything downstream is linear joins)."""
    # Materialize the shingle-occurrence frame once (lazy checkpoint: the
    # probe job inside lsh_candidate_pairs is the first action and pays
    # for it). Three independent consumers read it — the exact-content
    # grouping, the representative signature branch, and the verify
    # collect_set — and ReuseExchange only dedupes their IDENTICAL
    # exchange subtrees, not the per-branch token-window sort above them:
    # the r15 plan audit counted the posexplode+Window pipeline 6-8x in
    # one query (plans/r15/ngram_jaccard_pairs_before.txt). One
    # materialization replaces all recomputes; blocks are freed when the
    # Python object goes out of scope (same lifecycle as `sigs` below).
    sh_rows = sh_rows.localCheckpoint(eager=False)
    members = _content_members(sh_rows)
    # members is one narrow row per document and is read by the rep
    # semi-join here plus 2-3 fan-out joins downstream — same rationale
    members = members.localCheckpoint(eager=False)
    # the representative-id set is corpus-sized (all-distinct corpus ⇒
    # every id is its own rep) — same no-broadcast rationale as above
    rep_rows = sh_rows.join(
        members.filter(F.col("id") == F.col("gid")).select("id").hint("merge"),
        "id",
        "left_semi",
    )
    # One signature row per distinct-content representative (64-element
    # array): lazily checkpoint it so the occupancy probe inside
    # lsh_candidate_pairs — the first action to touch it — materializes it
    # as a side effect and both bucket-join sides then read this tiny
    # frame instead of re-running the shingle -> minhash pipeline.
    # localCheckpoint, not persist(): persist registers a CacheManager
    # entry that outlives the Python object (a leak per call, and a warm-
    # cache hit for any later identical plan); checkpointed blocks are
    # released when the RDD is garbage-collected.
    sigs = signatures_from_hash_rows(rep_rows, num_hashes).localCheckpoint(eager=False)
    cands, parts = _lsh_candidate_pairs_scaled(sigs, bands, max_bucket=max_bucket)
    rep_pairs = verify_jaccard_from_hash_rows(
        cands, rep_rows, parts=parts, threshold=threshold
    ).filter(F.col("jaccard") >= threshold)
    base = int(sh_rows.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if parts > base:
        # the threshold filter collapses the escalated pair volume to the
        # verified relation (tiny under any sane threshold) — narrow back
        # to the session width so downstream consumers (the CC loop's
        # eager checkpoint, the fan-out joins) don't inherit hundreds of
        # near-empty partitions per stage. One exchange of a tiny frame;
        # measured +10% on the sf25 survivors entry without it.
        rep_pairs = rep_pairs.repartition(base)
    return members, rep_pairs


def _expand_group_pairs(members: DataFrame, rep_pairs: DataFrame) -> DataFrame:
    """Fan the representative-level relation out to member-level (a, b,
    jaccard) pairs. Same-content pairs have jaccard exactly 1.0 (equal
    sets); a cross-content pair inherits its groups' verified jaccard
    (every member holds the same set as its representative). Output size is
    inherently pairwise — the tasks producing it are plain joins."""
    # members is corpus-sized: hint both fan-out joins off the broadcast
    # path (the r11 sf25 OOM — Catalyst misestimates the aggregated map)
    ma = members.select(F.col("gid").alias("a"), F.col("id").alias("_ia")).hint(
        "shuffle_hash"
    )
    mb = members.select(F.col("gid").alias("b"), F.col("id").alias("_ib")).hint(
        "shuffle_hash"
    )
    cross = (
        rep_pairs.join(ma, "a")
        .join(mb, "b")
        .select(
            F.least("_ia", "_ib").alias("a"),
            F.greatest("_ia", "_ib").alias("b"),
            "jaccard",
        )
    )
    within = (
        members.select("gid", F.col("id").alias("_ia"))
        .join(members.select("gid", F.col("id").alias("_ib")).hint("merge"), "gid")
        .filter(F.col("_ia") < F.col("_ib"))
        .select(
            F.col("_ia").alias("a"),
            F.col("_ib").alias("b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return within.unionByName(cross)


def near_duplicate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 3,
    max_bucket: int = 4096,
) -> DataFrame:
    """(a, b, jaccard) verified near-duplicate pairs — the full banded
    MinHash pipeline (shingle → exact-content group → minhash of
    representatives → band bucket → join → verify → fan out).

    ``num_hashes``/``bands`` default to ``banding_for_threshold(threshold)``
    so the candidate set tracks true near-duplicates, not the corpus's
    background similarity; identical contents collapse to one
    representative before bucketing (see :func:`_content_members`)."""
    if num_hashes is None or bands is None:
        num_hashes, bands, _ = banding_for_threshold(threshold)
    sh_rows = shingle_hash_rows(df, id_col, text_col, shingle_k)
    members, rep_pairs = _group_rep_pairs(
        sh_rows, num_hashes, bands, threshold, max_bucket=max_bucket
    )
    return _expand_group_pairs(members, rep_pairs)


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
    max_bucket: int = 4096,
) -> DataFrame:
    """Rows surviving near-dedup: keep the min-id representative of each
    near-duplicate cluster.

    Clustering runs over STAR edges (member → content representative) plus
    the representative-level near-dup relation — LINEAR in corpus size,
    never materializing the member-level pair set (which is quadratic per
    duplicate group and only needed when the pairs themselves are the
    requested output)."""
    from grafeo_spark.algorithms.components import connected_components

    num_hashes, bands, _ = banding_for_threshold(threshold)
    sh_rows = shingle_hash_rows(df, id_col, text_col)
    members, rep_pairs = _group_rep_pairs(
        sh_rows, num_hashes, bands, threshold, max_bucket=max_bucket
    )
    star = members.filter(F.col("id") != F.col("gid")).select(
        F.col("id").alias("src"), F.col("gid").alias("dst")
    )
    # Materialize the cluster-edge frame (|docs| rows at most) before the
    # iterative CC loop: its lineage is the whole banded dedup pipeline,
    # and without the checkpoint the first supersteps re-derive that
    # pipeline through the vertex-state plan until pregel's own periodic
    # checkpoint truncates it.
    edges = star.unionByName(
        rep_pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).localCheckpoint(eager=True)
    clusters = connected_components(edges)
    drop = clusters.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop.hint("merge"), id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.6,
    num_hashes: int | None = None,
    bands: int | None = None,
    unit: str = "word",
    max_bucket: int = 4096,
) -> DataFrame:
    """(a, b, jaccard) near-duplicates under n-gram Jaccard — the same
    banded MinHash pipeline with word n-grams (the Gopher/C4-style dedup
    unit) or character n-grams (``unit="char"``, robust to tokenization
    differences) as the element set.

    Banding only separates pairs when the corpus's background similarity
    sits well below the threshold; char n-grams over a narrow vocabulary
    violate that (most pairs collide in some band), which is why word
    n-grams are the default unit."""
    if num_hashes is None or bands is None:
        num_hashes, bands, _ = banding_for_threshold(threshold)
    sh_rows = shingle_hash_rows(df, id_col, text_col, shingle_k=n, unit=unit)
    members, rep_pairs = _group_rep_pairs(
        sh_rows, num_hashes, bands, threshold, max_bucket=max_bucket
    )
    return _expand_group_pairs(members, rep_pairs)


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #


def _token_hash64(col: Column, bit_source: str) -> Column:
    """64-bit per-token hash feeding SimHash's bit votes.

    ``xxhash64`` (default) is the fast path — one JVM hash call per token.
    ``sha256`` derives the same 64-bit shape from the first 16 hex chars of
    SHA-256, at ~2-3x the hash cost; its value is that SHA-256 is available
    bit-identically in other engines (DuckDB, Postgres), so the WHOLE
    SimHash pipeline — tokenize, bit votes, windows, Hamming verify — can
    be replayed as plain SQL for engine-independent verification. Both
    arms share every line downstream of this expression."""
    if bit_source == "xxhash64":
        return F.xxhash64(col)
    if bit_source == "sha256":
        hx = F.sha2(col, 256)
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
        # Java shift wraps the sign bit, reproducing the unsigned bit layout
        return F.shiftleft(hi, 32).bitwiseOR(lo)
    raise ValueError(f"unknown bit_source {bit_source!r}")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bit_source: str = "xxhash64",
) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over token hashes: bit i is the
    sign of sum(±1) of each token's hash bit i.

    Computed by exploding tokens and running 64 codegen'd sum-aggregates
    (same rationale as ``signatures_from_sets``: interpreted HOF aggregates
    would be re-evaluated in every branch of the bucket self-join, whereas
    the groupBy leaves codes behind a reusable shuffle exchange). Tokenless
    documents keep code 0 WITHOUT a join-back: explode_outer emits one
    null-token row for an empty token array, its null hash makes every
    per-bit vote resolve to -1 (when(null != 0) falls to the otherwise
    arm), so the sign test assigns bit 0 — the r11 merge-hint work showed
    the old ids-left-join costing a full extra sort exchange."""
    # spread the tokenize+hash+partial-vote map side when the scan is
    # narrower than the session (no-op on wide scans, whose partial-
    # aggregate exchange is already smaller than a text shuffle)
    exploded = _spread_by_id(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokenize(F.col(text_col))).alias("_t"),
    ).withColumn("_h", _token_hash64(F.col("_t"), bit_source))
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
    return agg.select("id", code.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    tables: int = 4,
    bit_source: str = "xxhash64",
) -> DataFrame:
    """(a, b, hamming) pairs within a Hamming radius, via disjoint bit
    windows: split each 64-bit code into `tables` windows of 64//tables
    bits, join within windows, verify exact Hamming — again no all-pairs.

    Exactness (pigeonhole) requires ``max_hamming < tables``: a pair with
    fewer differing bits than windows must agree on at least one whole
    window. The window width is derived from ``tables`` (not a free knob —
    an independent prefix width silently voids the guarantee)."""
    if max_hamming >= tables:
        raise ValueError(
            f"simhash_near_pairs requires max_hamming < tables for the "
            f"pigeonhole guarantee (got max_hamming={max_hamming}, tables={tables})"
        )
    codes = simhash(df, id_col, text_col, bit_source=bit_source)
    # disjoint bit windows, exploded from EACH code row rather than
    # unioned: a tables-way union re-plans the whole tokenize→hash→vote
    # pipeline once per branch per join side (8 scans / 18 aggregates at
    # tables=4 — measured 1.8x slower at sf0.1, the r11 bench
    # regression); the row-local explode keeps one pipeline per side
    window_shift = 64 // tables
    mask = (1 << window_shift) - 1
    wins = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.shiftright(F.col("simhash"), t * window_shift)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    b = codes.select("id", "simhash", F.explode(wins).alias("_w")).select(
        "id", "simhash", F.col("_w.t").alias("t"), F.col("_w.bucket").alias("bucket")
    )
    l = b.select(F.col("t").alias("t1"), F.col("bucket").alias("k1"), F.col("id").alias("a"), F.col("simhash").alias("ha"))
    r = b.select(F.col("t").alias("t2"), F.col("bucket").alias("k2"), F.col("id").alias("b"), F.col("simhash").alias("hb"))
    return (
        l.join(r, (F.col("t1") == F.col("t2")) & (F.col("k1") == F.col("k2")) & (F.col("a") < F.col("b")))
        .select("a", "b", hamming_distance(F.col("ha"), F.col("hb")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
