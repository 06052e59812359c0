"""Deduplication operators for the LLM-data-pipeline extension:
exact (fingerprint groupBy), MinHash+LSH, SimHash, and n-gram Jaccard
near-dup detection — all pure DataFrame compositions (no Python UDFs;
hashing via ``xxhash64``, folds via higher-order functions, candidate
generation via band-bucket equi-joins).

Scale posture (the point of each design choice):

- Exact dedup shuffles only (fingerprint, id) pairs, never text.
- MinHash/SimHash candidate generation is a *bucket equi-join* on band
  keys — linear shuffle, no cross join; hot buckets (boilerplate docs)
  are capped with ``max_bucket_size`` so one degenerate bucket can't
  produce O(n²) pairs.
- Verification (exact Jaccard / Hamming) runs only on candidate pairs.
- Pair canonicalization (src < dst) halves the candidate volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.pairwise import (
    jaccard_micro_tokens,
    jaccard_tokens,
    micro_threshold,
    tokenize,
)
from ..functions.textstats import doc_fingerprint, doc_rolling_hash


def _drop_hot_buckets(banded: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """Drop rows in over-cap LSH buckets via ``groupBy(keys).count()`` +
    anti-join of the over-cap key set.

    The groupBy gets map-side partial aggregation, so the cap costs one
    shuffle of *distinct keys only*; the banded rows themselves are
    never sorted or reshuffled (a ``count().over(Window)`` here forces a
    full sort-shuffle of all bands×N rows — the dominant dedup shuffle
    at scale, measured 66s vs 14s at sf0.1 on adversarial boilerplate
    skew).

    No explicit ``broadcast()`` hint on the over-cap set: it is tiny on
    normal data, but under adversarial skew (MANY distinct buckets each
    just over cap) an unconditional hint would force a driver-memory
    broadcast of an unbounded key set — the exact input the cap exists
    to defend against. AQE (on in our sessions, and by default since
    Spark 3.2) converts the anti-join to a broadcast join at runtime
    when the built side's measured size is actually small, and keeps a
    shuffled join when it is not."""
    over_cap = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > max_bucket_size)
        .select(*keys)
    )
    return banded.join(over_cap, on=keys, how="left_anti")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact near-identical dedup: md5 fingerprint of normalized text →
    keep the min-id representative per fingerprint.

    Returns (fingerprint, keeper_id, n_dups). A full-table hash-shuffle
    on the 32-byte fingerprint only — at 100 TB the text stays columnar
    at the scan and never moves.
    """
    return (
        docs.select(doc_fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            (F.count(F.lit(1)) - 1).alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash
# ---------------------------------------------------------------------------

def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text, each
    rendered as a single string (space-joined); empty/whitespace-only
    text → [""]. Tokens are :func:`tokenize` (empty-filtered — Spark's
    ``split`` is Java ``Pattern.split(str, -1)``, which keeps a LEADING
    empty token for tab/newline-led text; an unfiltered split would
    silently diverge from the ``_toks_sql`` oracles there).

    Built as ``arrays_zip`` of ``n`` shifted slices + one transform, so
    the token subtree is referenced a constant ``n + 2`` times. The
    naive form — ``slice(toks, i+1, n)`` inside a ``transform`` lambda —
    re-evaluates the whole split subtree once *per token* (HOF lambda
    bodies get the subtree inlined, and there is no common-subexpression
    elimination inside them): measured 15.6s vs 0.9s just to explode
    shingles at sf0.1. (``tokenize`` itself is codegen-safe —
    ``array_remove``, not a filter() lambda.)"""
    toks = tokenize(text)
    if n == 1:
        # zero-token text keeps its [""] shingle, as in the general
        # branch's else arm
        return F.array_distinct(
            F.when(F.size(toks) >= 1, toks).otherwise(F.array(F.lit("")))
        )
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))  # number of n-grams
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, m).alias(f"__t{i}") for i in range(n)]
    )
    grams = F.when(
        F.size(toks) >= n,
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f"__t{i}"] for i in range(n)])),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(grams)


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed i, ``min over shingles of
    xxhash64(i, shingle)``. One array column of ``num_hashes`` longs.

    NOTE: referencing this column from further derived expressions makes
    Catalyst's ``CollapseProject`` inline the whole nested-HOF tree into
    every use site (measured 30× blowup on the band keys) — prefer
    :func:`minhash_signature_cols` for anything downstream."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda sh: F.xxhash64(i, sh))),
    )


def minhash_signature_cols(
    docs: DataFrame, id_col: str, shingles: Column, num_hashes: int
) -> DataFrame:
    """MinHash signatures as ``num_hashes`` plain long columns
    ``__h0..__h{n-1}`` plus ``__nsh`` (shingle-set size) via explode →
    hash → min-aggregate.

    The groupBy's partial (map-side) aggregation means the shuffle moves
    only ``num_hashes`` longs per (doc, partition) — never the shingles
    — and the aggregation boundary doubles as a projection barrier, so
    band-key expressions over ``__h*`` stay simple codegen'd columns
    instead of inlined nested-HOF trees (the 200s→7s fix at sf0.1).
    ``__nsh`` rides along for free (shingles are distinct, so the group
    count IS the set size) and feeds the lossless size-ratio prefilter
    in :func:`minhash_near_dup_pairs`."""
    ex = docs.select(F.col(id_col).alias("__id"), F.explode(shingles).alias("__sh"))
    return ex.groupBy("__id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("__sh"))).alias(f"__h{i}")
            for i in range(num_hashes)
        ],
        F.count(F.lit(1)).alias("__nsh"),
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
    prefilter_sigma: float = 5.0,
    collapse_exact: bool = True,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact Jaccard.

    shingle → minhash → band → bucket-join → signature prefilter →
    verify. Emits (src_id, dst_id, jaccard_micro) with src_id < dst_id and
    jaccard ≥ threshold. Bands of r = num_hashes/bands rows; a pair
    collides if any band's sub-signature matches exactly.

    The prefilter estimates Jaccard as the fraction of agreeing minhash
    values (num_hashes long-compares, already computed for banding) and
    drops candidates whose estimate is more than ``prefilter_sigma``
    binomial std-devs below ``threshold`` — most false candidates from
    low-r band collisions never reach the exact array intersection. At
    5σ the probability of dropping a true ≥threshold pair is ~3e-7 per
    pair; set ``prefilter_sigma=None`` to disable (strictly all-candidate
    verification). Memory note (ADVICE r17): with the r17 inline-verify
    shape the banded rows carry the hashed shingle arrays PLUS — when
    the σ-prefilter is on — 2×``num_hashes`` signature longs through
    the shuffle_hash bucket join's build side; ``max_bucket_size`` is
    the guard on per-partition build memory at larger tiers, and
    setting ``prefilter_sigma=None`` shrinks banded-row width by
    2×``num_hashes`` longs if build-side memory becomes the binding
    constraint (results unchanged — the prefilter only discards
    candidates the exact verify would reject).

    Spark-first replacement for the reference's
    ``MinHashLSH.approxSimilarityJoin`` (Predictor.scala:394-405) with
    the threshold pushed *into* candidate verification rather than
    filtered post-hoc, and canonical (src<dst) pairs (SURVEY.md §2.7-3).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    # Hash the shingle STRINGS to 64-bit longs up front; everything
    # downstream — the 32 per-seed minhashes AND the exact verification
    # intersections — runs over the long sets, so the per-byte string
    # hashing happens once per lineage pass instead of 32× inside the
    # signature aggregation. Deliberately NOT cached: the three
    # consumers (signature agg, two verify join sides) each recompute
    # this lineage, but an A/B at sf0.1 measured recompute at 6.6s
    # steady-state vs 8.5s with .cache() — materializing exploded long
    # arrays into storage memory costs more than re-running a
    # page-cached, codegen'd scan. At 100 TB with a cold object store
    # that tradeoff flips; persist(MEMORY_AND_DISK_SER) there.
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.transform(
            word_shingles(text_col, shingle_n), lambda s: F.xxhash64(s)
        ).alias("__shingles"),
    )

    # Exact-collapse first tier (``collapse_exact``): replicated corpora
    # put k identical documents in one LSH bucket, which costs k²/2
    # candidate pairs each paying an exact intersection (the sf0.1
    # corpus has a 248-member cluster → ~61k pairs from ONE text; at
    # 100 TB boilerplate replication makes this the dominant term).
    # Group by the sorted shingle-set (via a 64-bit set key — the same
    # negligible collision class as the hashed verify below), run
    # band→bucket→verify over one representative per DISTINCT set, then
    # expand: intra-group pairs are jaccard 1.0 by construction
    # (closed-form, no verification), cross-group pairs inherit the
    # verified representative jaccard (identical sets ⇒ identical
    # jaccard). Output is pair-for-pair what the uncollapsed pipeline
    # produces, except strictly better under the hot-bucket cap: the
    # cap now counts distinct SETS per bucket, so replication can no
    # longer evict genuine neighbours. Measured at sf0.1 (5000 docs →
    # 3935 sets): candidates 827k → 667k, in-bench 9.0s → 7.5-8.5s —
    # modest here, decisive under replication (10× stress exponent
    # 0.07 → 0.01; BASELINE.md Round 6). One grouped side table —
    # one row per distinct set, carrying rep + member ids — is
    # localCheckpoint(eager=False)'d rather than .cache()'d (ADVICE
    # r06): cache-manager entries live until an explicit unpersist
    # nobody can place, so repeated invocations in a long-lived session
    # accumulated storage memory; checkpointed RDDs are reclaimed by
    # the ContextCleaner as soon as the returned plan is
    # garbage-collected. eager=False (ADVICE r07) keeps plan
    # construction side-effect-free — the checkpoint materializes on
    # the first action and still breaks the double-computation of the
    # grouping between the rep pipeline and the membership expansion.
    # (localCheckpoint trades away lineage-based recovery — fine for a
    # bounded side table; on a cluster with preemptible or
    # failure-prone executors use reliable checkpointing or
    # persist+explicit-unpersist instead.)
    memb = None
    if collapse_exact:
        # Group on the sorted shingle ARRAY itself — exact set
        # equality, like the prefix-Jaccard and embedding collapse
        # tiers — not on xxhash64(array): a 64-bit set-key collision
        # would merge two distinct sets and fabricate jaccard-1.0
        # pairs (ADVICE r06). The shuffle carries the array either
        # way (it is the grouped payload), so exactness is free.
        # Membership comes out of the SAME aggregation (collect_list →
        # explode), not a second array-keyed join: one wide-key shuffle
        # instead of two plus a join — per-group id lists are bounded
        # by the duplicate-cluster size, orders of magnitude below a
        # hot LSH bucket.
        g = (
            base.select("__id", F.array_sort("__shingles").alias("__setarr"))
            .groupBy("__setarr")
            .agg(F.min("__id").alias("__rep"), F.collect_list("__id").alias("__ids"))
            .localCheckpoint(eager=False)
        )
        memb = g.select(F.explode("__ids").alias("__id"), "__rep")
        # Re-spread the rep table after the checkpoint (r17): AQE
        # rightly coalesces the small collapse shuffle to 1-3
        # partitions, but every post-checkpoint consumer inherits that
        # width — the 32-seed signature aggregation's explode+hash map
        # stage (the pipeline's densest per-row work) was measured
        # running as a 3-task stage at the 10× tier (~15 s/task,
        # tasks=3 in the stage profile). One tiny keyed exchange
        # (pinned to defaultParallelism so AQE cannot re-coalesce it;
        # cluster-sized, not a local constant) restores full-width
        # parallelism for the signature agg, both verify-join build
        # sides, and the banding explode.
        par = docs.sparkSession.sparkContext.defaultParallelism
        base = g.select(
            F.col("__rep").alias("__id"), F.col("__setarr").alias("__shingles")
        ).repartition(par, F.col("__id"))

    # Signatures as plain columns behind an aggregation barrier (see
    # minhash_signature_cols — avoids CollapseProject's nested-HOF
    # recompute blowup in the band keys below). Seeded re-hash of an
    # already-hashed long is a constant-time mix, not a per-byte pass.
    sig = minhash_signature_cols(base, "__id", F.col("__shingles"), num_hashes)

    # σ-prefilter cut (needs num_hashes; decides whether the signature
    # longs ride the banded rows below).
    import math

    cut = None
    if prefilter_sigma is not None:
        cut = threshold - prefilter_sigma * math.sqrt(
            threshold * (1.0 - threshold) / num_hashes
        )
        if cut <= 0:
            cut = None
    hcols = [f"__h{i}" for i in range(num_hashes)] if cut is not None else []

    # INLINE-VERIFY restructure (r17, the p2 fast-join lesson): the
    # hashed shingle arrays ride the band explode and the ONE
    # (band,key) exchange — replicated bands× there (~1.2 KB × bands
    # per rep) — so the exact intersection runs INSIDE the bucket
    # join and only SURVIVING pairs reach the pair-dedup shuffle.
    # The old ids-only candidate path was cheaper per banded row but
    # paid for it downstream: a candidate-pair shuffle (382 MB at the
    # 10× tier), a re-exchange per verify join, and the second verify
    # join's probe EXCHANGE carrying the attached src-side array for
    # every candidate pair (~1.2 KB × |candidates| ≫ the banded
    # exchange). Measured at the 10× tier: 14.8s → 6.9s solo-warm.
    # The attach join below is exchange-free: sig's aggregation and
    # the repartitioned base are both already hash-partitioned by
    # __id. Band key = xxhash64 over the band's signature longs
    # directly — no per-row string building.
    sigarr = sig.join(base, on="__id")
    banded = sigarr.select(
        "__id",
        "__nsh",
        "__shingles",
        *hcols,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col(f"__h{i}")
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__key"),
    )

    # Cap degenerate buckets. Post-collapse this counts distinct
    # shingle-SETS per bucket (replication can't trip it); what remains
    # capped is genuine diversity collisions (e.g. many distinct
    # boilerplate variants sharing a band).
    banded = _drop_hot_buckets(banded, ["__band", "__key"], max_bucket_size)

    # Size-ratio prefilter (LOSSLESS), applied inside the bucket join:
    # |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), so J ≤ min/max —
    # a pair failing min ≥ threshold·max can never verify. Two int
    # compares kill a boilerplate mega-cluster's near-miss candidates
    # before they cost an exact intersection. (The 1e-6 slack mirrors
    # the micro_threshold convention in the final filter.)
    a = banded.select(
        F.col("__band"), F.col("__key"),
        F.col("__id").alias("src_id"), F.col("__nsh").alias("__na"),
        F.col("__shingles").alias("__sh_a"),
        *[F.col(h).alias(f"__a{h}") for h in hcols],
    )
    b = banded.select(
        F.col("__band"), F.col("__key"),
        F.col("__id").alias("dst_id"), F.col("__nsh").alias("__nb"),
        F.col("__shingles").alias("__sh_b"),
        *[F.col(h).alias(f"__b{h}") for h in hcols],
    )
    size_ok = F.least(F.col("__na"), F.col("__nb")) >= (
        F.lit(threshold - 1e-6) * F.greatest(F.col("__na"), F.col("__nb"))
    )
    # ``shuffle_hash`` hint: the bucket self-join's sides are
    # symmetric row streams with unique-ish keys — a sort-merge join
    # pays two O(n log n) sorts of bands×reps rows for no benefit,
    # while a shuffled hash join builds a per-partition hash table and
    # streams the probe side (same shuffle, no sort; the hot-bucket
    # cap bounds per-bucket output, so SHJ output skew is bounded too,
    # unlike the uncapped p2 parity join where the hint had to go).
    # Physical-only: the inner equi-join's result set is identical
    # (parity pinned by the collapse/banding pytests). Measured at the
    # 10× bench replica: whole-pipeline 24.1s → 16.4s just from this
    # hint (BASELINE.md Round 14). Scale contract: the build side's
    # per-partition slice must fit in executor memory — it now carries
    # the shingle arrays (~1.2 KB × bands per rep / shuffle
    # partitions), still the hash-aggregate footprint class.
    joined = a.join(b.hint("shuffle_hash"), on=["__band", "__key"], how="inner").filter(
        (F.col("src_id") < F.col("dst_id")) & size_ok
    )

    # Signature-agreement prefilter (probabilistic, ``prefilter_sigma``):
    # estimate J as the fraction of agreeing minhash values (already
    # computed for banding, riding the banded rows when enabled) and
    # drop candidates more than σ binomial std-devs below threshold —
    # cheap long-compares ahead of the exact array intersection.
    if hcols:
        est = sum(
            F.when(F.col(f"__a{h}") == F.col(f"__b{h}"), 1).otherwise(0)
            for h in hcols
        ) / F.lit(float(num_hashes))
        joined = joined.filter(est >= cut)

    # Verify INLINE over the same 64-bit-hashed shingle sets the
    # signatures used: the jaccard of the hash sets equals the jaccard
    # of the string sets unless two distinct shingles collide in 64
    # bits within one pair (P ≈ |A|·|B|/2^64 ≈ 1e-16 for typical
    # documents). Verification before the pair dedup means a pair
    # colliding in k bands is intersected k× (≤ bands, measured ~2× at
    # the 10× tier) — strictly cheaper than shuffling EVERY candidate
    # pair for dedup and then re-exchanging it twice through the old
    # verify joins. Only pairs that PASS the threshold reach the
    # dropDuplicates shuffle (tiny (src, dst, jaccard) rows, true-pair
    # volume).
    pairs = (
        joined.withColumn(
            "jaccard_micro", jaccard_micro_tokens(F.col("__sh_a"), F.col("__sh_b"))
        )
        .filter(F.col("jaccard_micro") >= micro_threshold(threshold))
        .select("src_id", "dst_id", "jaccard_micro")
        .dropDuplicates(["src_id", "dst_id"])
    )
    if memb is None:
        return pairs

    # Expand representative pairs back to document pairs (see the
    # collapse-tier note above). Members of distinct groups are
    # disjoint, so least/greatest re-canonicalizes src < dst exactly.
    ma = memb.select(F.col("__rep").alias("src_id"), F.col("__id").alias("__a"))
    mb = memb.select(F.col("__rep").alias("dst_id"), F.col("__id").alias("__b"))
    cross = (
        pairs.join(ma, "src_id")
        .join(mb, "dst_id")
        .select(
            F.least("__a", "__b").alias("src_id"),
            F.greatest("__a", "__b").alias("dst_id"),
            "jaccard_micro",
        )
    )
    intra = (
        memb.alias("x")
        .join(memb.alias("y"), "__rep")
        .filter(F.col("x.__id") < F.col("y.__id"))
        .select(
            F.col("x.__id").alias("src_id"),
            F.col("y.__id").alias("dst_id"),
            F.lit(1_000_000).cast("long").alias("jaccard_micro"),
        )
    )
    return cross.unionByName(intra)


def minhash_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Persistable near-dup index: one row per document —
    ``(doc_id, nsh, shingles: sorted array<long>, sig: array<long> of
    size num_hashes, band_keys: array<long> of size bands, set_key:
    array<long> of size 2)``.

    This is the state a 100 TB corpus keeps BETWEEN ingest batches:
    write it as parquet partitioned however the corpus is, and each
    daily/hourly increment runs :func:`minhash_incremental_pairs`
    against it — no re-shingling, re-hashing, or re-banding of the
    accumulated corpus, whose text never has to be read again. Band
    keys and shingle hashes use the same seeds/expressions as
    :func:`minhash_near_dup_pairs`, so index rows built at different
    times (or by the full pipeline) are mutually compatible as long as
    (shingle_n, num_hashes, bands) match. Indexes persisted by the
    pre-r08 format (no ``sig``/``set_key`` columns) remain readable:
    :func:`minhash_incremental_pairs` recomputes ``set_key`` from the
    stored shingles and runs with the σ-prefilter disabled (ADVICE
    r08) — the prefilter only discards candidates the exact verify
    would reject anyway, so results are unchanged.

    ``sig`` (the full minhash signature) feeds the incremental path's
    σ-prefilter without any per-ingest recompute; ``set_key`` is a
    128-bit exact-set identity (two independently-seeded ``xxhash64``
    of the sorted shingle array) that lets the incremental collapse
    tier group identical documents on 2 longs instead of shuffling
    every indexed shingle array per ingest — collision probability per
    set pair ≈ 2⁻¹²⁸, far below the hashed-shingle verify's own
    documented ~1e-16 collision class.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(
            F.transform(word_shingles(text_col, shingle_n), lambda s: F.xxhash64(s))
        ).alias("shingles"),
    )
    sig = minhash_signature_cols(base, "doc_id", F.col("shingles"), num_hashes)
    band_keys = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[
                    F.col(f"__h{i}")
                    for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    return (
        base.join(
            sig.select(
                F.col("__id").alias("doc_id"),
                F.col("__nsh").alias("nsh"),
                F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig"),
                band_keys.alias("band_keys"),
            ),
            "doc_id",
        ).withColumn(
            "set_key",
            F.array(
                F.xxhash64(F.lit(0), F.col("shingles")),
                F.xxhash64(F.lit(1), F.col("shingles")),
            ),
        )
    )


def minhash_incremental_pairs(
    index: DataFrame,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
    prefilter_sigma: float = 5.0,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-dup pairs TOUCHING a new ingest batch, against a persisted
    :func:`minhash_index` — new-vs-index and new-vs-new, without
    recomputing anything for indexed documents.

    Returns ``(src_id, dst_id, jaccard_micro)`` with ``src_id < dst_id`` and
    ``jaccard ≥ threshold``: the subset of
    ``minhash_near_dup_pairs(old ∪ new)`` — run at the SAME
    ``(collapse_exact, prefilter_sigma)`` settings, both defaulting
    identically here and there — whose pairs include at least one new
    id (pinned pair-for-pair at both the default and the legacy
    collapse-off/σ-off settings by
    tests/test_operators.py::test_minhash_incremental_matches_full;
    requires index ids and new ids disjoint, same index parameters).

    ``collapse_exact`` mirrors the full run's exact-collapse tier
    (ADVICE r07): old ∪ new is grouped by the index's 128-bit
    ``set_key`` — an ids+2-longs shuffle, never the shingle arrays —
    so a replicated duplicate cluster costs ONE representative through
    banding instead of k²/2 candidate pairs, and the hot-bucket cap
    counts distinct sets exactly like the default full run (a cluster
    larger than ``max_bucket_size`` can no longer fill its buckets and
    silently lose pairs). Intra-group pairs touching the new batch are
    emitted closed-form at jaccard_micro 1_000_000; cross-group pairs inherit the
    verified representative jaccard. The only divergence from the full
    run's group-by-array tier is a 128-bit set_key collision
    (P ≈ 2⁻¹²⁸ per set pair — below the hashed-shingle verify's own
    ~1e-16 class). ``prefilter_sigma`` reuses the stored ``sig``
    arrays, arithmetic identical to the full run's σ-prefilter.

    Scale shape: the index side never touches text — per indexed doc it
    contributes (id, set_key, nsh, band_keys) to the collapse + bucket
    join, its stored ``sig`` only for σ-checked candidates and its
    stored ``shingles`` only for verified candidates (both join in by
    id). The incremental batch pays the full shingle/signature cost
    only for its own rows. Caller appends ``minhash_index(new_docs)``
    to the stored index afterwards.
    """
    import math

    new_idx = minhash_index(
        new_docs,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
    )
    # Checkpoint the new batch's index rows (r18): all_idx below feeds
    # FIVE consumers (collapse agg, two σ-prefilter joins, two verify
    # joins), and each would re-run the batch's shingle+signature
    # lineage — the pipeline's densest per-row work — from the text.
    # One ingest batch is bounded by contract, so materializing it is
    # scale-safe (unlike the accumulated index side, which at 100 TB
    # must stay a pruned-column parquet re-read, never a copy). The
    # pinned-count keyed repartition BEFORE the checkpoint fixes the
    # materialized width — AQE rightly coalesces the small signature
    # aggregation, and every consumer would inherit 1-3 partitions
    # (the r17 checkpoint-pins-AQE-width lesson).
    par = new_docs.sparkSession.sparkContext.defaultParallelism
    new_idx = new_idx.repartition(par, "doc_id").localCheckpoint(eager=False)
    # Pre-r08 index-format tolerance (ADVICE r08): ``set_key`` is
    # recomputed from the stored shingles with the exact
    # :func:`minhash_index` expression; a missing ``sig`` disables the
    # σ-prefilter for this run — the prefilter only drops candidates
    # the exact hashed-shingle verify would reject anyway, so the
    # returned pair set is unchanged, just more candidates verified.
    if "set_key" not in index.columns:
        index = index.withColumn(
            "set_key",
            F.array(
                F.xxhash64(F.lit(0), F.col("shingles")),
                F.xxhash64(F.lit(1), F.col("shingles")),
            ),
        )
    if "sig" not in index.columns:
        index = index.withColumn("sig", F.lit(None).cast("array<bigint>"))
        prefilter_sigma = None
    cols = ["doc_id", "nsh", "shingles", "sig", "band_keys", "set_key"]
    # Tag rows instead of joining an id list back in: the union is
    # lazy, so a literal flag per branch costs nothing and keeps the
    # banded explode ids-only.
    all_idx = (
        index.select(*cols).withColumn("__new", F.lit(False))
        .unionByName(new_idx.select(*cols).withColumn("__new", F.lit(True)))
    )

    memb = None
    if collapse_exact:
        # Group by the precomputed 128-bit set identity, NOT the
        # shingle array: grouping on the array would re-shuffle every
        # indexed document's shingles on every ingest — the exact cost
        # the index exists to amortize. Column pruning keeps shingles
        # and sig out of this exchange (the agg only references
        # nsh/band_keys/doc_id/__new); they rejoin by id at the σ /
        # verify stages, candidates only. nsh and band_keys are
        # constant within a group (identical set ⇒ identical
        # signature), so first() is deterministic here.
        # localCheckpoint(eager=False) for the same
        # reclaim-without-unpersist + side-effect-free-construction
        # reasons as the full run's tier.
        g = (
            all_idx.groupBy("set_key")
            .agg(
                F.min("doc_id").alias("__rep"),
                F.first("nsh").alias("nsh"),
                F.first("band_keys").alias("band_keys"),
                F.max("__new").alias("__has_new"),
                F.collect_list(
                    F.struct(F.col("doc_id").alias("i"), F.col("__new").alias("n"))
                ).alias("__members"),
            )
            .localCheckpoint(eager=False)
        )
        memb = g.select("__rep", F.explode("__members").alias("m")).select(
            "__rep", F.col("m.i").alias("__id"), F.col("m.n").alias("__mnew")
        )
        # Re-spread after the collapse checkpoint (r18, the r17 minhash
        # full-run fix applied here too): AQE coalesces the small
        # collapse shuffle and the banding explode + hot-bucket count +
        # bucket join would otherwise inherit 1-3 task slots.
        work = g.select(
            F.col("__rep").alias("doc_id"), "nsh", "band_keys",
            F.col("__has_new").alias("__new"),
        ).repartition(par, F.col("doc_id"))
    else:
        work = all_idx.select("doc_id", "nsh", "band_keys", "__new")

    banded = work.select(
        "doc_id",
        "nsh",
        "__new",
        F.posexplode("band_keys").alias("__band", "__key"),
    )
    # Post-collapse this counts distinct shingle-sets per bucket — the
    # same population the default full run caps.
    banded = _drop_hot_buckets(banded, ["__band", "__key"], max_bucket_size)

    # Asymmetric bucket join: only rows (groups) touching the new batch
    # on the build side — old-vs-old collisions never become pairs.
    a = banded.filter("__new").select(
        "__band", "__key",
        F.col("doc_id").alias("__ida"), F.col("nsh").alias("__na"),
    )
    b = banded.select(
        "__band", "__key",
        F.col("doc_id").alias("__idb"), F.col("nsh").alias("__nb"),
    )
    size_ok = F.least(F.col("__na"), F.col("__nb")) >= (
        F.lit(threshold - 1e-6) * F.greatest(F.col("__na"), F.col("__nb"))
    )
    candidates = (
        a.join(b, on=["__band", "__key"], how="inner")
        .filter((F.col("__ida") != F.col("__idb")) & size_ok)
        .select(
            F.least("__ida", "__idb").alias("src_id"),
            F.greatest("__ida", "__idb").alias("dst_id"),
        )
        .dropDuplicates(["src_id", "dst_id"])
    )

    # σ-prefilter over the STORED signatures — same cut and the same
    # agree-count / num_hashes arithmetic as the full run, so the two
    # paths accept/reject candidates identically.
    cut = None
    if prefilter_sigma is not None:
        cut = threshold - prefilter_sigma * math.sqrt(
            threshold * (1.0 - threshold) / num_hashes
        )
    if cut is not None and cut > 0:
        sigs = all_idx.select("doc_id", "sig")
        sa = sigs.select(F.col("doc_id").alias("src_id"), F.col("sig").alias("__siga"))
        sb = sigs.select(F.col("doc_id").alias("dst_id"), F.col("sig").alias("__sigb"))
        agree = F.aggregate(
            F.zip_with(
                F.col("__siga"), F.col("__sigb"),
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        candidates = (
            candidates.join(sa, on="src_id")
            .join(sb, on="dst_id")
            .filter((agree / F.lit(float(num_hashes))) >= cut)
            .select("src_id", "dst_id")
        )

    sets = all_idx.select("doc_id", "shingles")
    pairs = (
        candidates.join(
            sets.select(F.col("doc_id").alias("src_id"), F.col("shingles").alias("__sa")),
            "src_id",
        )
        .join(
            sets.select(F.col("doc_id").alias("dst_id"), F.col("shingles").alias("__sb")),
            "dst_id",
        )
        .withColumn("jaccard_micro", jaccard_micro_tokens(F.col("__sa"), F.col("__sb")))
        .filter(F.col("jaccard_micro") >= micro_threshold(threshold))
        .select("src_id", "dst_id", "jaccard_micro")
    )
    if memb is None:
        return pairs

    # Expand representative pairs back to document pairs, keeping only
    # pairs that touch the new batch (the full run emits them all; the
    # incremental contract is the touching-new subset). Members of
    # distinct groups are disjoint, so least/greatest re-canonicalizes
    # src < dst exactly.
    ma = memb.select(
        F.col("__rep").alias("src_id"),
        F.col("__id").alias("__a"), F.col("__mnew").alias("__an"),
    )
    mb = memb.select(
        F.col("__rep").alias("dst_id"),
        F.col("__id").alias("__b"), F.col("__mnew").alias("__bn"),
    )
    cross = (
        pairs.join(ma, "src_id")
        .join(mb, "dst_id")
        .filter(F.col("__an") | F.col("__bn"))
        .select(
            F.least("__a", "__b").alias("src_id"),
            F.greatest("__a", "__b").alias("dst_id"),
            "jaccard_micro",
        )
    )
    # Intra-group: jaccard 1.0 by construction (minhash shingle sets
    # are never empty — empty text shingles to [""]), new-touching
    # member pairs only.
    intra = (
        memb.alias("x")
        .join(memb.alias("y"), "__rep")
        .filter(
            (F.col("x.__id") < F.col("y.__id"))
            & (F.col("x.__mnew") | F.col("y.__mnew"))
        )
        .select(
            F.col("x.__id").alias("src_id"),
            F.col("y.__id").alias("dst_id"),
            F.lit(1_000_000).cast("long").alias("jaccard_micro"),
        )
    )
    return cross.unionByName(intra)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: bit b of the signature is 1 iff
    the sum over distinct tokens of ±1 (sign of bit b of xxhash64(token))
    is positive. Returns a long.

    Single-expression form — the ``hashes`` subtree is duplicated into
    all ``bits`` vote aggregates (no sharing across a projection), so
    per-row cost is bits×|tokens| hash evals. Fine for ad-hoc column
    use; :func:`simhash_cols` is the linear-cost form used by the
    near-dup operator."""
    toks = F.array_distinct(tokenize(text))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(F.bit_get(h, b) == 1, 1).otherwise(-1),
        ),
    )
    # MSB-first fold (shift amounts can't be Columns): sig = Σ [vote>0]·2^b.
    return F.aggregate(
        F.reverse(bit_votes),
        F.lit(0).cast("long"),
        lambda acc, v: acc * 2 + F.when(v > 0, 1).otherwise(0),
    )


def simhash_cols(docs: DataFrame, id_col: str, text: Column | str, bits: int) -> DataFrame:
    """SimHash as ``(__id, __sh)`` via explode → hash-once-per-token →
    per-bit vote aggregation. Each token is hashed exactly once; the
    groupBy's map-side combine shuffles ``bits`` ints per (doc,
    partition); the aggregation is also a projection barrier, so the
    block keys built over ``__sh`` never re-inline the vote tree.

    Zero-token docs are excluded (explode of an empty array) — the
    expression form gave them all signature 0, i.e. one degenerate
    all-empty-docs bucket, which is never the wanted behavior."""
    # tokenize is codegen-safe (array_remove, no filter() lambda), and
    # empty-filtered tokens mean zero-token docs simply explode to
    # nothing — excluded, as wanted.
    ex = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(tokenize(text))).alias("__tok"),
    ).withColumn("__hash", F.xxhash64("__tok"))
    votes = ex.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.bit_get(F.col("__hash"), F.lit(b)) == 1, 1).otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in reversed(range(bits)):
        sig = sig * 2 + F.when(F.col(f"__v{b}") > 0, 1).otherwise(0)
    return votes.select("__id", sig.alias("__sh"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    blocks: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """SimHash near-dup pairs: by pigeonhole, two signatures within
    Hamming distance < blocks must agree exactly on ≥1 of ``blocks``
    bit-blocks — block equality is the LSH bucket key; candidates are
    verified with ``bit_count(xor) <= max_hamming``.

    Emits (src_id, dst_id, hamming) with src_id < dst_id.
    """
    base = simhash_cols(docs, id_col, text_col, bits)
    return signature_band_pairs(
        base,
        bits=bits,
        blocks=blocks,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


def signature_band_pairs(
    sigs: DataFrame,
    *,
    bits: int,
    blocks: int,
    max_hamming: int,
    max_bucket_size: int = 1000,
    collapse_exact: bool = True,
) -> DataFrame:
    """Banded Hamming-ball self-join over ANY ``(__id, __sh)`` signature
    frame (simhash text signatures, image perceptual hashes, …): by
    pigeonhole, two signatures within Hamming distance < ``blocks``
    agree exactly on ≥1 of the ``blocks`` bit-blocks, so block equality
    is the bucket key and the full-signature ``bit_count(xor)`` verify
    runs only inside buckets. Hot buckets are deterministically dropped
    at ``max_bucket_size`` (recall/cost cap, same contract as minhash).

    ``collapse_exact``: identical signatures (replicated texts; same-
    class perceptual hashes) are collapsed to one representative before
    banding — the signature twin of minhash_near_dup_pairs' collapse
    tier. Intra-group pairs are Hamming 0 by definition and emitted
    closed-form; cross-group pairs inherit the representative distance
    (identical signatures ⇒ identical xor). Output is pair-for-pair the
    uncollapsed result, except the hot-bucket cap now counts distinct
    SIGNATURES per bucket, so replication can't evict genuine
    neighbours. The two side tables are 2 longs/row, cached.

    Emits (src_id, dst_id, hamming) with src_id < dst_id.
    """
    assert bits % blocks == 0
    assert max_hamming < blocks, "pigeonhole completeness needs max_hamming < blocks"
    block_bits = bits // blocks
    mask = (1 << block_bits) - 1

    memb = None
    if collapse_exact:
        # localCheckpoint(eager=False), not cache(): reclaimed by the
        # ContextCleaner once the returned plan is dropped —
        # cache-manager entries from repeated invocations accumulated
        # storage memory (ADVICE r06) — and lazy so plan construction
        # stays side-effect-free (ADVICE r07). Membership via
        # collect_list→explode in the same aggregation — one shuffle,
        # no second join (see the minhash collapse tier).
        g = (
            sigs.groupBy("__sh")
            .agg(F.min("__id").alias("__rep"), F.collect_list("__id").alias("__ids"))
            .localCheckpoint(eager=False)
        )
        memb = g.select(F.explode("__ids").alias("__id"), "__rep")
        sigs = g.select(F.col("__rep").alias("__id"), "__sh")

    banded = sigs.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sh"), b * block_bits).bitwiseAND(
                        F.lit(mask).cast("long")
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("__block", "__key"),
    )
    banded = _drop_hot_buckets(banded, ["__block", "__key"], max_bucket_size)
    a = banded.select("__block", "__key", F.col("__id").alias("src_id"), F.col("__sh").alias("__sh_a"))
    b = banded.select("__block", "__key", F.col("__id").alias("dst_id"), F.col("__sh").alias("__sh_b"))
    # shuffle_hash: same rationale as the minhash bucket join (no sort
    # for a join feeding an unsorted dedup agg; round 14)
    pairs = (
        a.join(b.hint("shuffle_hash"), on=["__block", "__key"], how="inner")
        .filter(F.col("src_id") < F.col("dst_id"))
        .select(
            "src_id",
            "dst_id",
            F.bit_count(F.col("__sh_a").bitwiseXOR(F.col("__sh_b"))).alias("hamming"),
        )
        # filter BEFORE the pair-dedup shuffle (r17): hamming is
        # deterministic per pair, so dedup-then-filter ≡
        # filter-then-dedup — but only surviving pairs shuffle.
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["src_id", "dst_id"])
    )
    if memb is None:
        return pairs

    # Expand representative pairs to member pairs (disjoint groups, so
    # least/greatest re-canonicalizes src < dst exactly).
    ma = memb.select(F.col("__rep").alias("src_id"), F.col("__id").alias("__a"))
    mb = memb.select(F.col("__rep").alias("dst_id"), F.col("__id").alias("__b"))
    cross = (
        pairs.join(ma, "src_id")
        .join(mb, "dst_id")
        .select(
            F.least("__a", "__b").alias("src_id"),
            F.greatest("__a", "__b").alias("dst_id"),
            "hamming",
        )
    )
    intra = (
        memb.alias("x")
        .join(memb.alias("y"), "__rep")
        .filter(F.col("x.__id") < F.col("y.__id"))
        .select(
            F.col("x.__id").alias("src_id"),
            F.col("y.__id").alias("dst_id"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


def signature_incremental_pairs(
    index: DataFrame,
    new_sigs: DataFrame,
    *,
    bits: int,
    blocks: int,
    max_hamming: int,
    max_bucket_size: int = 1000,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-dup pairs TOUCHING a new ingest batch, against a persisted
    signature index — the :func:`signature_band_pairs` twin of
    :func:`minhash_incremental_pairs`, covering the whole signature
    family (SimHash text, pHash images, any ``(__id, __sh)`` frame).

    The persisted state is simply the signature frame itself — one
    (id, long) row per document, the cheapest index in the repo; write
    ``simhash_cols(...)`` / pHash output as parquet and each ingest
    batch bands only its own rows against it. Returns
    ``(src_id, dst_id, hamming)`` with ``src_id < dst_id`` and
    ``hamming ≤ max_hamming``: exactly the subset of
    ``signature_band_pairs(old ∪ new)`` — same ``collapse_exact``
    setting both sides — whose pairs include at least one new id
    (pinned pair-for-pair by tests/test_operators.py::
    test_signature_incremental_matches_full; requires index ids and new
    ids disjoint, same bits/blocks). ``collapse_exact`` groups
    old ∪ new by the signature long itself (2 longs/row through the
    shuffle — no set_key indirection needed), so the hot-bucket cap
    counts distinct SIGNATURES exactly like the full run and an
    over-cap duplicate cluster still pairs via its one representative.
    """
    assert bits % blocks == 0
    assert max_hamming < blocks, "pigeonhole completeness needs max_hamming < blocks"
    block_bits = bits // blocks
    mask = (1 << block_bits) - 1

    all_sigs = (
        index.select("__id", "__sh").withColumn("__new", F.lit(False))
        .unionByName(new_sigs.select("__id", "__sh").withColumn("__new", F.lit(True)))
    )

    memb = None
    if collapse_exact:
        g = (
            all_sigs.groupBy("__sh")
            .agg(
                F.min("__id").alias("__rep"),
                F.max("__new").alias("__has_new"),
                F.collect_list(
                    F.struct(F.col("__id").alias("i"), F.col("__new").alias("n"))
                ).alias("__members"),
            )
            .localCheckpoint(eager=False)
        )
        memb = g.select("__rep", F.explode("__members").alias("m")).select(
            "__rep", F.col("m.i").alias("__id"), F.col("m.n").alias("__mnew")
        )
        work = g.select(
            F.col("__rep").alias("__id"), "__sh", F.col("__has_new").alias("__new")
        )
    else:
        work = all_sigs

    banded = work.select(
        "__id",
        "__sh",
        "__new",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sh"), b * block_bits).bitwiseAND(
                        F.lit(mask).cast("long")
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("__block", "__key"),
    )
    banded = _drop_hot_buckets(banded, ["__block", "__key"], max_bucket_size)

    a = banded.filter("__new").select(
        "__block", "__key",
        F.col("__id").alias("__ida"), F.col("__sh").alias("__sh_a"),
    )
    b = banded.select(
        "__block", "__key",
        F.col("__id").alias("__idb"), F.col("__sh").alias("__sh_b"),
    )
    pairs = (
        a.join(b, on=["__block", "__key"], how="inner")
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            F.least("__ida", "__idb").alias("src_id"),
            F.greatest("__ida", "__idb").alias("dst_id"),
            # xor is symmetric, so canonicalizing ids leaves it intact
            F.bit_count(F.col("__sh_a").bitwiseXOR(F.col("__sh_b"))).alias("hamming"),
        )
        # filter BEFORE the pair-dedup shuffle (r17): hamming is
        # deterministic per pair, so dedup-then-filter ≡
        # filter-then-dedup — but only surviving pairs shuffle.
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["src_id", "dst_id"])
    )
    if memb is None:
        return pairs

    ma = memb.select(
        F.col("__rep").alias("src_id"),
        F.col("__id").alias("__a"), F.col("__mnew").alias("__an"),
    )
    mb = memb.select(
        F.col("__rep").alias("dst_id"),
        F.col("__id").alias("__b"), F.col("__mnew").alias("__bn"),
    )
    cross = (
        pairs.join(ma, "src_id")
        .join(mb, "dst_id")
        .filter(F.col("__an") | F.col("__bn"))
        .select(
            F.least("__a", "__b").alias("src_id"),
            F.greatest("__a", "__b").alias("dst_id"),
            "hamming",
        )
    )
    intra = (
        memb.alias("x")
        .join(memb.alias("y"), "__rep")
        .filter(
            (F.col("x.__id") < F.col("y.__id"))
            & (F.col("x.__mnew") | F.col("y.__mnew"))
        )
        .select(
            F.col("x.__id").alias("src_id"),
            F.col("y.__id").alias("dst_id"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


# ---------------------------------------------------------------------------
# n-gram Jaccard with blocking
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    ngram: int = 2,
    threshold: float = 0.2,
    window: int | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity over blocked candidate
    pairs: pairs share ``block_col`` (e.g. source/partition key) and —
    optionally — have ids within ``window`` of each other. Fully
    SQL-expressible (the oracle-checkable exact-similarity operator;
    MinHash above approximates exactly this).

    Without ``window`` the pair count is O(block²) and block size grows
    with the corpus — correct as the small-scale ground-truth twin for
    MinHash recall checks, catastrophic as a production dedup path at
    100 TB. Callers must therefore either bound pairs with ``window``
    or state the intent with ``allow_quadratic=True``.

    Emits (src_id, dst_id, jaccard) with src_id < dst_id, jaccard ≥
    threshold, rounded to 6 decimals.
    """
    if window is None and not allow_quadratic:
        raise ValueError(
            "ngram_jaccard_pairs without a `window` bound is O(block²) per "
            "block — pass window=N to bound candidate pairs, or "
            "allow_quadratic=True if this is a deliberate small-scale "
            "ground-truth run (use minhash_near_dup_pairs in production)."
        )
    base = docs.select(
        F.col(id_col).alias("__id"),
        *( [F.col(block_col).alias("__blk")] if block_col else [F.lit(0).alias("__blk")] ),
        word_shingles(text_col, ngram).alias("__grams"),
    )
    a = base.select(F.col("__blk"), F.col("__id").alias("src_id"), F.col("__grams").alias("__ga"))
    b = base.select(F.col("__blk"), F.col("__id").alias("dst_id"), F.col("__grams").alias("__gb"))
    pairs = a.join(b, on="__blk", how="inner").filter(F.col("src_id") < F.col("dst_id"))
    if window is not None:
        pairs = pairs.filter(F.col("dst_id") - F.col("src_id") <= window)
    # NOTE: no size-ratio prefilter here, deliberately. At this
    # operator's low default threshold the min/max-size bound prunes
    # almost nothing, and A/B measurement showed the extra per-pair
    # predicate made the blocked join 1.7× SLOWER at sf0.1 (45s vs
    # 26s) — the bound only pays off at high thresholds on pre-shuffle
    # candidate streams (see minhash_near_dup_pairs).
    return (
        pairs.withColumn(
            "jaccard_micro", jaccard_micro_tokens(F.col("__ga"), F.col("__gb"))
        )
        .filter(F.col("jaccard_micro") >= micro_threshold(threshold))
        .select("src_id", "dst_id", "jaccard_micro")
    )


# ---------------------------------------------------------------------------
# Duplicate clustering: pairs → connected components → keeper per cluster
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    *,
    src: str = "src_id",
    dst: str = "dst_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation over
    DataFrames (GraphX has no Python API; this is the PySpark-native
    formulation, SURVEY.md §7-6).

    Each node's component starts as its own id; every round each node
    adopts the min component among itself and its neighbors; converged
    when no label changes. Rounds are O(diameter) — near-dup clusters
    are dense and shallow, so few rounds in practice (cap asserts).
    ``localCheckpoint`` truncates lineage each round (an iterative plan
    would otherwise grow exponentially and re-execute from the scan).

    Returns (node_id, component) with component = min node id reachable.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node_id"))
        .dropDuplicates()
        .withColumn("component", F.col("node_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["node_id"])
            .groupBy(F.col("a").alias("node_id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, on="node_id", how="left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iterations} rounds")
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """Near-dup pairs → duplicate clusters: every doc mapped to its
    cluster representative (min doc id in the component); singletons map
    to themselves. The output drives the actual dedup filter
    (``keep iff doc_id == keeper_id``)."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp["node_id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("keeper_id"),
        )
    )


def dedup_clusters_incremental(
    assignment: DataFrame,
    new_ids: DataFrame,
    new_pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "src_id",
    dst: str = "dst_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Incremental keeper maintenance — the step a daily ingest runs
    AFTER :func:`minhash_incremental_pairs` (or the signature/embedding
    twins): update a persisted ``(doc_id, keeper_id)`` assignment with
    the pairs touching a new batch, without recomputing connected
    components over the accumulated corpus.

    Exactness by cluster contraction: the persisted assignment's
    clusters are the components of the old pair set, so mapping each
    old endpoint of a new pair to its keeper (new endpoints map to
    themselves) yields a contracted graph whose components are exactly
    the merged old∪new components; and because every old keeper is the
    MIN id of its old cluster, the contracted component's min node id
    IS the min id of the merged cluster. Hence
    ``dedup_clusters_incremental(assign(old), new, inc_pairs)`` equals
    ``dedup_clusters(old ∪ new, old_pairs ∪ inc_pairs)`` row-for-row
    (pinned by tests/test_operators.py::
    test_dedup_clusters_incremental_matches_full; requires
    ``assignment`` = the full clustering of the old corpus and
    ``new_pairs`` ⊇ every pair with ≥1 new id — exactly the
    ``*_incremental_pairs`` contract).

    Scale shape: the iterative CC runs on the CONTRACTED batch graph —
    O(|new_pairs|) nodes, not the corpus — and the corpus-sized work is
    two broadcast-able equi-joins (pair endpoints → keepers, then
    touched keepers → new components). Returns the full updated
    ``(doc_id, keeper_id)`` over old ∪ new; at 100 TB, write it back
    as the next ingest's ``assignment``.
    """
    keeper = assignment.select(
        F.col(id_col).alias("__n"), F.col("keeper_id").alias("__k")
    )
    p = new_pairs.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    contracted = (
        p.join(keeper.withColumnRenamed("__n", "__s").withColumnRenamed("__k", "__ks"),
               on="__s", how="left")
        .join(keeper.withColumnRenamed("__n", "__d").withColumnRenamed("__k", "__kd"),
              on="__d", how="left")
        .select(
            F.coalesce(F.col("__ks"), F.col("__s")).alias(src),
            F.coalesce(F.col("__kd"), F.col("__d")).alias(dst),
        )
        .filter(F.col(src) != F.col(dst))  # intra-cluster pairs are no-ops
    )
    comp = connected_components(
        contracted, src=src, dst=dst, max_iterations=max_iterations
    )
    old_updated = (
        assignment.join(comp, assignment["keeper_id"] == comp["node_id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col("keeper_id")).alias("keeper_id"),
        )
    )
    new_assign = (
        new_ids.select(F.col(id_col))
        .join(comp, new_ids[id_col] == comp["node_id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("keeper_id"),
        )
    )
    return old_updated.unionByName(new_assign)


def keep_best_incremental(
    assignment: DataFrame,
    old_keepers: DataFrame,
    new_scored: DataFrame,
    new_pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "src_id",
    dst: str = "dst_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Incremental QUALITY-keeper maintenance (round 16, VERDICT r15
    item 4) — :func:`dedup_clusters_incremental` extended from min-id
    keepers to ``dedup_keep_best``'s quality policy (keep the
    highest-scored member, ties to the lowest id), without ever
    re-scanning the old corpus's scores.

    Inputs: ``assignment`` = the persisted (id, keeper_id) MIN-LABEL
    clustering of the old corpus; ``old_keepers`` = (comp, keeper_doc,
    keeper_score), the persisted quality keeper PER OLD CLUSTER (comp
    is the min-label id); ``new_scored`` = (id, score) for the new
    batch; ``new_pairs`` ⊇ every pair with ≥1 new endpoint (the
    ``*_incremental_pairs`` contract).

    Exactness: clusters merge via cluster contraction (see
    dedup_clusters_incremental); within a merged cluster the quality
    argmax is ASSOCIATIVE — each old cluster's keeper dominates every
    member of its cluster under the total order (score DESC, id ASC),
    so argmax over {old keepers of the merged comps} ∪ {new members}
    equals argmax over all members. Hence the output is row-for-row
    the from-scratch ``dedup_keep_best`` of old ∪ new (the registry
    entry hash-gates exactly this).

    KEEPER STABILITY (the contract VERDICT r15 pinned): a new
    duplicate scored BELOW the incumbent keeper can never steal
    keeper-ship (it loses the argmax), and an EQUAL-scored newcomer
    loses the id tiebreak to any older (lower-id) incumbent — only a
    strictly better variant, or a cluster merge that imports a better
    keeper, changes the keeper
    (tests/test_operators.py::test_keep_best_incremental_stability).

    Scale shape: the iterative CC runs on the contracted batch graph;
    corpus-sized work is the two broadcast-able keeper-remap joins of
    dedup_clusters_incremental plus ONE broadcast join of the final
    per-comp keeper back onto the assignment. Scores are read only for
    old KEEPERS (|clusters| rows, persisted) and the new batch.
    Returns (id, keeper_id, kept) over old ∪ new with keeper_id = the
    QUALITY keeper."""
    assign2 = dedup_clusters_incremental(
        assignment,
        new_scored.select(F.col(id_col)),
        new_pairs,
        id_col=id_col,
        src=src,
        dst=dst,
        max_iterations=max_iterations,
    )
    comp2 = assign2.select(
        F.col(id_col).alias("__m"), F.col("keeper_id").alias("__c2")
    )
    cand_old = old_keepers.join(
        comp2, old_keepers["keeper_doc"] == comp2["__m"]
    ).select(
        F.col("__c2").alias("__comp"),
        F.col("keeper_doc").alias("__cand"),
        F.col("keeper_score").alias("__score"),
    )
    cand_new = new_scored.join(
        comp2, new_scored[id_col] == comp2["__m"]
    ).select(
        F.col("__c2").alias("__comp"),
        F.col(id_col).alias("__cand"),
        F.col("score").alias("__score"),
    )
    w = Window.partitionBy("__comp").orderBy(
        F.col("__score").desc(), F.col("__cand")
    )
    best = (
        cand_old.unionByName(cand_new)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("__comp", F.col("__cand").alias("__q_keeper"))
    )
    return (
        assign2.join(best, assign2["keeper_id"] == best["__comp"])
        .select(
            F.col(id_col),
            F.col("__q_keeper").alias("keeper_id"),
            (F.col(id_col) == F.col("__q_keeper")).cast("int").alias("kept"),
        )
    )


def jaccard_prefix_join(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    collapse_exact: bool = True,
) -> DataFrame:
    """EXACT token-Jaccard ≥ threshold self-join with NO blocking key
    and no id-window — prefix filtering (the PPJoin family's core
    idea) replaces :func:`ngram_jaccard_pairs`'s required blocking.

    Soundness: J(A,B) ≥ t ⟹ |A∩B| ≥ t·|A| (and ≥ t·|B|), so if A and
    B share no token among A's first ``|A| − ⌈t·|A|⌉ + 1`` tokens under
    a GLOBAL token order, their overlap is < t·|A| and the pair cannot
    match. Ordering tokens by ascending corpus frequency (rarest
    first, token string tie-break) makes prefixes land in the
    *smallest* inverted lists, so the candidate join is driven by rare
    tokens — the standard trick that keeps candidate volume near the
    true-pair volume instead of the stopword cross-product.

    Plan shape at scale: token-frequency agg (vocab-sized), per-doc
    rank window (one doc-keyed shuffle), prefix explode (Σ prefix
    sizes ≤ Σ (1−t)·|doc| rows — e.g. ≤20% of the token stream at
    t=0.8), token-keyed candidate equi-join carrying ids only, pair
    dedupe, then one verification join back to the token arrays. The
    ``t·|A| ≤ |B| ≤ |A|/t`` size bound prunes candidates before
    verification. Never O(n²), no caller-supplied blocking contract.

    Emits (src_id, dst_id, jaccard_micro) with src_id < dst_id in exact
    BIGINT micro-units — same contract as ngram_jaccard_pairs(ngram=1) run
    unblocked.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(tokenize(text_col)).alias("__toks"),
    )

    # Exact-collapse first tier (the production sequence for replicated
    # corpora, same contract as minhash_near_dup_pairs): identical token
    # SETS collapse to one representative before the prefix machinery,
    # grouped on the sorted array itself (exact equality, no collision
    # class). Prefix-filter soundness holds under ANY consistent global
    # token order, so computing document frequencies over
    # representatives instead of raw documents changes candidates but
    # not the verified output. Intra-group pairs are jaccard 1.0 — but
    # ONLY for non-empty sets (two empty token sets have jaccard 0.0 by
    # the union>0 rule and must stay excluded, as in the uncollapsed
    # path); cross-group pairs inherit the representative jaccard.
    memb = None
    if collapse_exact:
        # localCheckpoint, not cache() — see the minhash collapse tier
        # (ADVICE r06: unbounded cache-manager accumulation).
        # Membership via collect_list→explode in the same aggregation —
        # one shuffle, no second array-keyed join.
        g = (
            base.select("__id", "__toks", F.array_sort("__toks").alias("__setk"))
            .groupBy("__setk")
            .agg(
                F.min("__id").alias("__rep"),
                F.first("__toks").alias("__toks"),
                F.collect_list("__id").alias("__ids"),
            )
            .localCheckpoint()
        )
        memb = g.select(F.explode("__ids").alias("__id"), "__rep")
        nonempty_reps = g.filter(F.size("__setk") > 0).select("__rep")
        # Re-spread after the checkpoint — same r17 fix as the minhash
        # collapse tier: AQE coalesces the small collapse shuffle, and
        # the token explode + df join + prefix window downstream would
        # otherwise run 1-3 tasks wide. Bracketed solo A/B at the 10×
        # tier (r18, quiet box): with 7.06s / without 10.51s / with
        # 7.64s (mins of 3) — the repartition pays ~3s here; the r17
        # in-bench regression vs r16 (6.6→8.5s) tracked the throttled
        # window, not this exchange.
        par = docs.sparkSession.sparkContext.defaultParallelism
        base = g.select(F.col("__rep").alias("__id"), "__toks").repartition(
            par, F.col("__id")
        )

    toks = base.select("__id", F.size("__toks").alias("__sz"), F.explode("__toks").alias("__tok"))
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy("__df", "__tok")
    # Every pruning bound below must be STRICTLY PERMISSIVE w.r.t. the
    # verification predicate round(jaccard, 6) >= threshold, which
    # admits true J down to threshold − 5e-7 (HALF_UP). Two epsilon
    # guards make that hold (ADVICE r10, high):
    #   * t_eff relaxes each bound to the rounded predicate's floor
    #     (matters only for corpora with 10^6-token docs, but costs
    #     nothing);
    #   * _EPS subtracted inside every ceil() defeats IEEE-double
    #     overshoot — e.g. 0.8/1.8 > 4/9 in doubles, so
    #     t·(sa+sb)/(1+t) at exact-integer points (sa+sb = 63, 117,
    #     126, … at t = 0.8) ceils one too high and silently drops a
    #     true pair sitting at exactly J = threshold. The same
    #     overshoot family hits ceil(t·sz) (prefix one token too
    #     short at sz = 35, 70, … for t = 0.8) and the size filter
    #     (ceil(0.8·35) = 29 in doubles, dropping a legal
    #     |A|=35,|B|=28 pair at J = 0.8), so all three sites use it.
    t_eff = threshold - 1e-6
    _EPS = 1e-9
    prefix_len = F.col("__sz") - F.ceil(F.lit(t_eff) * F.col("__sz") - F.lit(_EPS)) + 1
    prefix = (
        toks.join(freq, on="__tok")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= prefix_len)
        .select("__tok", "__id", "__sz", "__rn")
    )
    # Positional filter (PPJoin, Xiao et al. WWW'08): for a shared
    # token at global-order rank i of A and j of B, common tokens
    # strictly before it number ≤ min(i−1, j−1) (a common token
    # earlier in the global order ranks earlier in BOTH docs) and
    # strictly after it ≤ min(|A|−i, |B|−j), so
    #   overlap(A,B) ≤ min(i−1, j−1) + 1 + min(|A|−i, |B|−j).
    # J ≥ t needs overlap ≥ ⌈t/(1+t)·(|A|+|B|)⌉; candidates whose
    # bound falls short die BEFORE the pair-dedup shuffle. Per-row
    # soundness (pairs survive via ANY row): for a true pair the
    # earliest SHARED-prefix token row's bound dominates its real
    # overlap, so that row always clears the filter. The before-term
    # is required for worst-case soundness — the pair's globally-
    # earliest common token may sit inside one prefix but beyond the
    # other, leaving the earliest joined row with genuine commons
    # before it. (Measured on the test corpora the tighter no-before
    # bound happens to lose zero pairs — rank gaps between shared
    # prefix tokens stay small there — but that is a property of the
    # data, not of the bound; the sound form costs nothing extra.)
    a = prefix.select(
        "__tok", F.col("__id").alias("src_id"),
        F.col("__sz").alias("__sa"), F.col("__rn").alias("__ra"),
    )
    b = prefix.select(
        "__tok", F.col("__id").alias("dst_id"),
        F.col("__sz").alias("__sb"), F.col("__rn").alias("__rb"),
    )
    overlap_needed = F.ceil(
        F.lit(t_eff / (1.0 + t_eff)) * (F.col("__sa") + F.col("__sb")) - F.lit(_EPS)
    )
    overlap_bound = (
        F.least(F.col("__ra"), F.col("__rb"))
        - 1
        + F.least(F.col("__sa") - F.col("__ra"), F.col("__sb") - F.col("__rb"))
        + 1
    )
    # shuffle_hash on the inverted-list self-join and both verify
    # joins (round 14): sort-merge sorted the prefix stream (and then
    # the candidate stream, with the token-array payload) for joins
    # that feed an unsorted pair-dedup/filter — the same pure-waste
    # shape fixed in minhash_near_dup_pairs. Measured at the 10× bench
    # replica on the 5% p2 sample: whole pipeline 26.0s → 5.65s.
    # Physical-only; the entries stay hash-gated end to end.
    candidates = (
        a.join(b.hint("shuffle_hash"), on="__tok")
        .filter(F.col("src_id") < F.col("dst_id"))
        .filter(
            (F.col("__sb") >= F.ceil(F.lit(t_eff) * F.col("__sa") - F.lit(_EPS)))
            & (F.col("__sa") >= F.ceil(F.lit(t_eff) * F.col("__sb") - F.lit(_EPS)))
        )
        .filter(overlap_bound >= overlap_needed)
        .select("src_id", "dst_id")
        .dropDuplicates(["src_id", "dst_id"])
    )
    sets = base.select(F.col("__id"), F.col("__toks"))
    pairs = (
        candidates.join(
            sets.select(
                F.col("__id").alias("src_id"), F.col("__toks").alias("__ta")
            ).hint("shuffle_hash"),
            on="src_id",
        )
        .join(
            sets.select(
                F.col("__id").alias("dst_id"), F.col("__toks").alias("__tb")
            ).hint("shuffle_hash"),
            on="dst_id",
        )
        .withColumn("jaccard_micro", jaccard_micro_tokens(F.col("__ta"), F.col("__tb")))
        .filter(F.col("jaccard_micro") >= micro_threshold(threshold))
        .select("src_id", "dst_id", "jaccard_micro")
    )
    if memb is None:
        return pairs

    ma = memb.select(F.col("__rep").alias("src_id"), F.col("__id").alias("__a"))
    mb = memb.select(F.col("__rep").alias("dst_id"), F.col("__id").alias("__b"))
    cross = (
        pairs.join(ma, "src_id")
        .join(mb, "dst_id")
        .select(
            F.least("__a", "__b").alias("src_id"),
            F.greatest("__a", "__b").alias("dst_id"),
            "jaccard_micro",
        )
    )
    intra = (
        memb.join(nonempty_reps, "__rep")
        .alias("x")
        .join(memb.alias("y"), "__rep")
        .filter(F.col("x.__id") < F.col("y.__id"))
        .select(
            F.col("x.__id").alias("src_id"),
            F.col("y.__id").alias("dst_id"),
            F.lit(1_000_000).cast("long").alias("jaccard_micro"),
        )
    )
    return cross.unionByName(intra)


def containment_prefix_join(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 1,
) -> DataFrame:
    """EXACT directed token-set CONTAINMENT join (Broder 1997's
    C(A,B) = |A∩B| / |A| ≥ t) — the quote/subset detector next to
    :func:`jaccard_prefix_join`'s symmetric near-dup tier: a short doc
    fully quoted inside a long one has containment ~1.0 but Jaccard
    ~|A|/|B| → 0, so the Jaccard family structurally cannot find it.
    This is the curation pass that catches excerpt/boilerplate
    inclusion and train-on-test contamination by inclusion.

    Prefix filter (PPJoin adapted to the asymmetric predicate):
    C(A,B) ≥ t ⟹ |A∩B| ≥ t·|A|, so A must share a token with B among
    A's first |A| − ⌈t·|A|⌉ + 1 tokens in the GLOBAL rarest-first
    order — but B, unlike the Jaccard case, must index ALL its tokens
    (B's matching token may rank arbitrarily late in B: nothing bounds
    |B| from above). Size bound: |B| ≥ ⌈t·|A|⌉ (the intersection can't
    exceed |B|); no upper bound exists, again unlike Jaccard.
    Positional filter: for a shared token at rarest-first rank i of A
    and j of B, overlap ≤ min(i−1, j−1) + 1 + min(|A|−i, |B|−j) —
    sound per pair because the pair's globally-earliest common token
    row dominates its true overlap (jaccard_prefix_join's argument,
    unchanged by asymmetry). All three bounds carry the same
    ε-guards as the Jaccard twin (t_eff slack below the exact ≥ t
    verify floor — candidate-side only, so strictly lossless — and
    _EPS against IEEE ceil overshoot).

    Emits DIRECTED (src_id, dst_id, containment_micro): src's tokens
    are ≥ t contained in dst; both directions can appear, src ≠ dst;
    zero-token docs are excluded (containment undefined). Verification
    is the exact intersection over the token arrays; the score is
    BIGINT micro-units ``(10^6 · |A∩B|) div |A|`` — integral on both
    engines, so the hash gate never depends on an engine's
    double-rounding convention (the r11/r12 dpp lesson; VERDICT r14
    item 2). The ``>= t`` predicate is EXACT: for integral t·10^6,
    ``floor(10^6·c) >= t·10^6 ⟺ c >= t``. shuffle_hash on the
    candidate and verify joins — the round-14 no-sort-before-hash-agg
    discipline.

    Plan shape at 100 TB: the candidate join's key distribution is
    driven by A-prefix tokens, which are the corpus-RAREST by
    construction — the full B index only joins on keys some prefix
    emits, so stopword keys never enter. Candidate volume tracks
    Σ_tok df_prefix(tok)·df(tok), near the true-pair volume."""
    # ``shingle_n`` > 1 runs containment over word n-gram shingles —
    # far more discriminative on template-heavy corpora (shared
    # VOCABULARY no longer suffices; shared SPANS are required): the
    # registered query uses 3-grams, where the testbed yields ~50 true
    # inclusions at sf0.01 vs ~145k under unigram containment. Docs
    # below shingle_n tokens degrade to their whole text as one gram
    # (word_shingles' contract); zero-token docs are excluded
    # (containment undefined on an empty set).
    grams = (
        word_shingles(text_col, shingle_n)
        if shingle_n > 1
        else F.array_distinct(tokenize(text_col))
    )
    base = docs.filter(F.size(tokenize(text_col)) > 0).select(
        F.col(id_col).alias("__id"), grams.alias("__toks")
    )
    toks = base.select(
        "__id", F.size("__toks").alias("__sz"), F.explode("__toks").alias("__tok")
    )
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    from pyspark.sql import Window

    w = Window.partitionBy("__id").orderBy("__df", "__tok")
    ranked = toks.join(freq, on="__tok").withColumn("__rn", F.row_number().over(w))
    t_eff = threshold - 1e-6
    _EPS = 1e-9
    prefix_len = F.col("__sz") - F.ceil(F.lit(t_eff) * F.col("__sz") - F.lit(_EPS)) + 1
    a = ranked.filter(F.col("__rn") <= prefix_len).select(
        "__tok", F.col("__id").alias("src_id"),
        F.col("__sz").alias("__sa"), F.col("__rn").alias("__ra"),
    )
    b = ranked.select(
        "__tok", F.col("__id").alias("dst_id"),
        F.col("__sz").alias("__sb"), F.col("__rn").alias("__rb"),
    )
    overlap_needed = F.ceil(F.lit(t_eff) * F.col("__sa") - F.lit(_EPS))
    overlap_bound = (
        F.least(F.col("__ra"), F.col("__rb"))
        - 1
        + F.least(F.col("__sa") - F.col("__ra"), F.col("__sb") - F.col("__rb"))
        + 1
    )
    candidates = (
        a.join(b.hint("shuffle_hash"), on="__tok")
        .filter(F.col("src_id") != F.col("dst_id"))
        .filter(F.col("__sb") >= overlap_needed)
        .filter(overlap_bound >= overlap_needed)
        .select("src_id", "dst_id")
        .dropDuplicates(["src_id", "dst_id"])
    )
    sets = base.select("__id", "__toks")
    return (
        candidates.join(
            sets.select(
                F.col("__id").alias("src_id"), F.col("__toks").alias("__ta")
            ).hint("shuffle_hash"),
            on="src_id",
        )
        .join(
            sets.select(
                F.col("__id").alias("dst_id"), F.col("__toks").alias("__tb")
            ).hint("shuffle_hash"),
            on="dst_id",
        )
        .withColumn(
            "containment_micro",
            F.expr(
                "(1000000L * size(array_intersect(__ta, __tb)))"
                " div size(__ta)"
            ),
        )
        .filter(F.col("containment_micro") >= micro_threshold(threshold))
        .select("src_id", "dst_id", "containment_micro")
    )


def levenshtein_near_dup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = "lang",
    prefix_len: int = 40,
    band_width: int = 32,
    max_block: int = 64,
    max_dist: int = 8,
) -> DataFrame:
    """Edit-distance near-dup pairs with banded blocking: candidates
    share (``block_col``, length band) — an equi-join, never all-pairs —
    and verify with ``levenshtein`` on a ``prefix_len``-char normalized
    prefix (edit distance is O(len²) per pair; bounding the operand
    bounds the per-pair cost). Blocks larger than ``max_block`` are
    dropped WHOLE by a deterministic windowed count — lossy by design:
    over-weight blocks are boilerplate mega-clusters whose quadratic
    pair volume the cap exists to refuse (the same posture as the
    MinHash/SimHash ``max_bucket_size`` caps, applied pre-join).

    Oracle-matched twin: queries.py::dedup_levenshtein_banded runs the
    identical blocking + cap in DuckDB SQL.
    """
    from pyspark.sql import Window

    pfx = F.substring(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "),
        1,
        prefix_len,
    )
    block = F.col(block_col) if block_col else F.lit("_")
    d = docs.select(
        F.col(id_col),
        block.alias("__blk"),
        pfx.alias("__pfx"),
        (F.length(F.col(text_col)).cast("int") / F.lit(band_width))
        .cast("int")
        .alias("__band"),
    )
    capped = (
        d.withColumn(
            "__bs", F.count(F.lit(1)).over(Window.partitionBy("__blk", "__band"))
        )
        .filter(F.col("__bs") <= max_block)
        .drop("__bs")
    )
    a = capped.select(
        "__blk", "__band", F.col(id_col).alias("src_id"), F.col("__pfx").alias("__pa")
    )
    b = capped.select(
        "__blk", "__band", F.col(id_col).alias("dst_id"), F.col("__pfx").alias("__pb")
    )
    return (
        a.join(b, ["__blk", "__band"])
        .filter(F.col("dst_id") > F.col("src_id"))
        .select("src_id", "dst_id", F.levenshtein("__pa", "__pb").alias("lev"))
        .filter(F.col("lev") <= max_dist)
    )


def exact_substring_regions(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_match_tokens: int = 50,
    within_doc: bool = False,
    max_gram_positions: int = 1000,
) -> DataFrame:
    """Cross-document EXACT duplicate-substring detection — the
    suffix-array dedup family of Lee et al. 2021 (arXiv:2107.06499,
    "Deduplicating Training Data Makes Language Models Better", the
    method behind C4/MassiveText exact substring removal), re-expressed
    as relational gram adjacency instead of a driver-side suffix array:

    A duplicated substring of >= L tokens exists between two positions
    iff they share an L-token gram (L = ``min_match_tokens``), and the
    MAXIMAL duplicated substring is a maximal run of consecutive shared
    L-grams along one (src, dst, offset) diagonal. So:

    1. posexplode every doc's L-token grams -> (id, pos, gram) rows
       (relational form — building gram ARRAYS and hashing inside HOF
       lambdas re-inlines the token subtree per element, the Catalyst
       no-CSE trap; one row per gram evaluates everything once);
    2. hot-gram cap: grams occurring at more than
       ``max_gram_positions`` positions corpus-wide are dropped WHOLE
       (boilerplate license blocks at 100 TB would fan the self-join
       out quadratically on one key — same posture as the MinHash /
       decontamination bucket caps; dropping splits any run crossing
       the hot gram, which is the documented lossy trade);
    3. self-equi-join on the gram STRING (exact — no 64-bit hash
       collision risk in a correctness gate; at 100 TB pre-hash with
       xxhash64 as the shuffle key and verify string equality in the
       same join to cut shuffle bytes to 8/key + payload);
    4. maximal-run merge: one window per (src, dst, diag) ordered by
       src position — lag()-based run break flags, running-sum run
       ids, then min/max per run. Every duplicated region is emitted
       exactly once with its exact token extent.

    Emits (src_id, dst_id, src_pos, dst_pos, match_tokens): the
    maximal shared run starting at token offset ``src_pos`` of src and
    ``dst_pos`` of dst, ``match_tokens`` long (>= min_match_tokens by
    construction). ``within_doc=True`` additionally reports repeated
    passages inside a single document (src_id == dst_id, src_pos <
    dst_pos — the self-repetition Lee et al. also remove).

    Plan shape at 100 TB: token posexplode is map-side; the cap is one
    distinct-gram-keyed count + anti-join (map-side partial agg); the
    self-join is ONE gram-keyed shuffle whose output is bounded by
    true duplication (never all-pairs — positions only meet when their
    grams are equal); the run-merge windows partition by (src, dst,
    diag), which is at most the anchor count. Nothing is quadratic in
    corpus size, only in genuine per-gram duplication, which the cap
    bounds. No driver-side suffix array: the sorted-adjacency property
    the suffix array provides is exactly what the gram equi-join +
    per-diagonal window reconstructs distributively."""
    from pyspark.sql import Window

    L = int(min_match_tokens)
    if L < 2:
        raise ValueError(f"min_match_tokens must be >= 2, got {min_match_tokens}")
    toks = tokenize(text_col)
    base = docs.select(F.col(id_col).alias("__id"), toks.alias("__t"))
    n = F.size("__t")
    grams_arr = F.when(
        n >= L,
        F.transform(
            F.sequence(F.lit(1), n - L + 1),
            lambda p: F.concat_ws(" ", F.slice("__t", p, L)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select("__id", F.posexplode(grams_arr).alias("__p", "__g"))
    grams = _drop_hot_buckets(grams, ["__g"], max_gram_positions)
    a = grams.select(
        F.col("__id").alias("src_id"), F.col("__p").alias("__pa"), "__g"
    )
    b = grams.select(
        F.col("__id").alias("dst_id"), F.col("__p").alias("__pb"), "__g"
    )
    pred = F.col("src_id") < F.col("dst_id")
    if within_doc:
        pred = pred | (
            (F.col("src_id") == F.col("dst_id")) & (F.col("__pa") < F.col("__pb"))
        )
    anchors = (
        a.join(b, on="__g")
        .filter(pred)
        .select(
            "src_id",
            "dst_id",
            "__pa",
            (F.col("__pb") - F.col("__pa")).alias("__diag"),
        )
    )
    by_diag = Window.partitionBy("src_id", "dst_id", "__diag").orderBy("__pa")
    runs = anchors.withColumn(
        "__brk",
        F.when(F.lag("__pa").over(by_diag) == F.col("__pa") - 1, 0).otherwise(1),
    ).withColumn("__run", F.sum("__brk").over(by_diag))
    return (
        runs.groupBy("src_id", "dst_id", "__diag", "__run")
        .agg(F.min("__pa").alias("__start"), F.max("__pa").alias("__end"))
        .select(
            "src_id",
            "dst_id",
            F.col("__start").cast("int").alias("src_pos"),
            (F.col("__start") + F.col("__diag")).cast("int").alias("dst_pos"),
            (F.col("__end") - F.col("__start") + L).cast("int").alias("match_tokens"),
        )
    )


def exact_substring_remove(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_match_tokens: int = 50,
    max_gram_positions: int = 1000,
) -> DataFrame:
    """The REMOVE step of exact substring dedup (Lee et al. 2021,
    arXiv:2107.06499 §4 — after detection, one copy of each duplicated
    span is cut from the corpus): keep-first policy — the occurrence in
    the LOWER-id document stays, the higher-id document's span is
    removed. Composes :func:`exact_substring_regions`' detected
    regions into a corpus rewrite:

    1. dst-side spans ``[dst_pos, dst_pos + match_tokens)`` become
       per-doc removal intervals;
    2. overlapping intervals merge into islands (gaps-and-islands: a
       running ``max(e)`` window per doc ordered by (s, e) flags new
       islands, a running sum numbers them, min/max per island) —
       regions found on different diagonals may overlap, and removal
       must not double-cut;
    3. each doc's kept token stream is the original minus island-covered
       positions — a per-doc ``filter`` with the positional lambda over
       the (small) collected island array, map-side;
    4. emits (doc_id, n_tokens, n_removed, kept_hash) where kept_hash
       is the portable Rabin-Karp rolling hash of the space-joined kept
       tokens (functions.textstats.doc_rolling_hash) — the gate pins
       the actual post-removal BYTES, not just counts. Docs with
       nothing removed hash their full token stream; fully-removed docs
       hash the empty string (0).

    Plan shape at 100 TB: detection is the bounded
    exact_substring_regions plan; islands aggregate per doc (intervals
    per doc ~ regions, small); the rewrite is ONE doc-keyed join of the
    corpus against its island lists followed by a per-doc map — no
    token-level shuffle, tokens never leave their partition."""
    from pyspark.sql import Window

    regions = exact_substring_regions(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_match_tokens=min_match_tokens,
        within_doc=False,
        max_gram_positions=max_gram_positions,
    )
    iv = regions.select(
        F.col("dst_id").alias("__id"),
        F.col("dst_pos").alias("__s"),
        (F.col("dst_pos") + F.col("match_tokens")).alias("__e"),
    )
    by_doc = Window.partitionBy("__id").orderBy("__s", "__e")
    prior_max_e = F.max("__e").over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = (
        iv.withColumn(
            "__new",
            F.when(F.col("__s") <= F.coalesce(prior_max_e, F.lit(-1)), 0).otherwise(1),
        )
        .withColumn("__isl", F.sum("__new").over(by_doc))
        .groupBy("__id", "__isl")
        .agg(F.min("__s").alias("__s"), F.max("__e").alias("__e"))
        .groupBy("__id")
        .agg(
            F.collect_list(F.struct("__s", "__e")).alias("__islands"),
            F.sum(F.col("__e") - F.col("__s")).alias("__covered"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("__id"), tokenize(text_col).alias("__t")
    )
    joined = base.join(isl, on="__id", how="left").select(
        "__id",
        "__t",
        F.coalesce("__islands", F.array().cast("array<struct<__s:int,__e:int>>")).alias(
            "__islands"
        ),
        F.coalesce("__covered", F.lit(0)).alias("__covered"),
    )
    kept = F.filter(
        F.col("__t"),
        lambda t, i: ~F.exists(
            F.col("__islands"),
            lambda st: (i >= st["__s"]) & (i < st["__e"]),
        ),
    )
    # Materialize the kept stream as a named column BEFORE hashing:
    # doc_rolling_hash's internal empty-text CASE references its input
    # twice, and Catalyst has no CSE inside expression trees — hashing
    # the filter expression directly re-evaluates the whole
    # filter+exists per reference (the winnowing HOF trap; plan
    # verified to carry ONE filter after this split).
    staged = joined.select(
        "__id",
        F.size("__t").cast("long").alias("n_tokens"),
        F.col("__covered").cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("__kept"),
    )
    return staged.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "n_removed",
        doc_rolling_hash(F.col("__kept")).alias("kept_hash"),
    )
