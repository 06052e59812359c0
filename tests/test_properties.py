"""Property-based tests (hypothesis): the Catalyst expression functions
must agree with straightforward Python references on arbitrary inputs —
including the whitespace/empty/null corners hand-written fixtures miss.

One SparkSession round-trip per example is too slow, so each property
generates a BATCH of examples, runs them through Spark as one DataFrame,
and compares row-wise.
"""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_spark_link_prediction_spark.functions.pairwise import (
    common_token_count,
    common_token_count_multiset,
    jaccard_tokens,
    tokenize,
)
from apache_spark_link_prediction_spark.functions.textstats import (
    bpe_ish_token_count,
    whitespace_token_count,
)
from apache_spark_link_prediction_spark.functions.vectors import cosine_similarity

# Text with whitespace variety; avoid surrogates Spark can't encode.
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=60,
)
BATCH = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# Java regex \s (what Spark executes) is the ASCII class
# [ \t\n\x0B\f\r] — unlike Python's \s, which adds Unicode
# whitespace (\x85, \xa0, U+2000…) — and Spark's ``trim`` strips only
# 0x20 (filtered-empty tokens make that equivalent here). The reference
# mirrors Java; the engine and its DuckDB oracles already agree on this.
_JAVA_WS = r"[ \t\n\x0b\f\r]+"


def py_tokenize(s: str) -> list[str]:
    return [t for t in re.split(_JAVA_WS, s.lower()) if t]


@given(st.lists(texts, min_size=1, max_size=8))
@BATCH
def test_tokenize_matches_python(spark, rows):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "i long, s string")
    got = {r.i: r.t for r in df.select("i", tokenize("s").alias("t")).collect()}
    for i, s in enumerate(rows):
        assert got[i] == py_tokenize(s), repr(s)


@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=8))
@BATCH
def test_token_pair_functions_match_python(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a string, b string"
    )
    out = df.select(
        "i",
        common_token_count(tokenize("a"), tokenize("b")).alias("set_common"),
        common_token_count_multiset(tokenize("a"), tokenize("b")).alias("ms_common"),
        jaccard_tokens(
            F.array_distinct(tokenize("a")), F.array_distinct(tokenize("b"))
        ).alias("jac"),
    )
    got = {r.i: r for r in out.collect()}
    for i, (a, b) in enumerate(pairs):
        ta, tb = py_tokenize(a), py_tokenize(b)
        assert got[i].set_common == len(set(ta) & set(tb))
        # multiset: Scala Seq.intersect semantics — min multiplicity
        ms = sum(min(ta.count(x), tb.count(x)) for x in dict.fromkeys(ta))
        assert got[i].ms_common == ms
        union = set(ta) | set(tb)
        want = len(set(ta) & set(tb)) / len(union) if union else 0.0
        assert math.isclose(got[i].jac, want, abs_tol=1e-9)


@given(st.lists(texts, min_size=1, max_size=8))
@BATCH
def test_token_counts_match_python(spark, rows):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "i long, s string")
    out = df.select(
        "i",
        whitespace_token_count("s").alias("ws"),
        bpe_ish_token_count("s").alias("bpe"),
    )
    got = {r.i: r for r in out.collect()}
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]")
    for i, s in enumerate(rows):
        assert got[i].ws == len(py_tokenize(s))
        assert got[i].bpe == len(pat.findall(s)), repr(s)


finite_floats = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)


@given(st.lists(st.tuples(st.lists(finite_floats, min_size=4, max_size=4),
                          st.lists(finite_floats, min_size=4, max_size=4)),
                min_size=1, max_size=8))
@BATCH
def test_cosine_matches_python(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, a array<float>, b array<float>",
    )
    got = {r.i: r.c for r in df.select("i", cosine_similarity("a", "b").alias("c")).collect()}
    for i, (a, b) in enumerate(pairs):
        # float32 storage round-trip, then double math — mirror Spark
        import struct

        a = [struct.unpack("f", struct.pack("f", x))[0] for x in a]
        b = [struct.unpack("f", struct.pack("f", x))[0] for x in b]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        want = dot / (na * nb) if na * nb > 0 else 0.0
        assert math.isclose(got[i], want, rel_tol=1e-9, abs_tol=1e-12), (a, b)


def py_shingles(s: str, n: int) -> list[str]:
    toks = py_tokenize(s)
    if len(toks) >= n:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        grams = [" ".join(toks)]
    out: list[str] = []
    for g in grams:
        if g not in out:
            out.append(g)
    return out


@given(st.lists(texts, min_size=1, max_size=6), st.integers(min_value=1, max_value=4))
@BATCH
def test_word_shingles_match_python(spark, rows, n):
    """Pins the arrays_zip shingle formulation (and its tokenize-based
    token source) to the naive reference semantics on arbitrary text —
    including tab/newline-led strings, where an unfiltered split keeps
    a leading empty token and would silently diverge."""
    from apache_spark_link_prediction_spark.operators.dedup import word_shingles

    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "i long, s string")
    got = {r.i: r.g for r in df.select("i", word_shingles("s", n).alias("g")).collect()}
    for i, s in enumerate(rows):
        assert got[i] == py_shingles(s, n), (repr(s), n)


@settings(deadline=None, max_examples=60)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    color_type=st.sampled_from([0, 2, 4, 6]),
    data=st.data(),
)
def test_png_codec_roundtrip_property(w, h, color_type, data):
    """encode_png → decode_png round-trips dimensions and pixel mean
    for arbitrary sizes, every supported color type, and arbitrary
    pixel bytes (pure-Python, no Spark session needed)."""
    from apache_spark_link_prediction_spark.operators.multimodal import (
        _PNG_CHANNELS,
        decode_png,
        encode_png,
    )

    n = w * h * _PNG_CHANNELS[color_type]
    pixels = bytes(data.draw(st.binary(min_size=n, max_size=n)))
    meta = decode_png(encode_png(w, h, pixels, color_type=color_type))
    assert (meta["width"], meta["height"]) == (w, h)
    assert abs(meta["mean_sample"] - sum(pixels) / n) < 1e-9


@given(
    keys=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300),
    probes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=8),
)
@BATCH
def test_count_min_never_underestimates(spark, keys, probes):
    from collections import Counter

    from apache_spark_link_prediction_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    sketch = count_min_table(df, "k", depth=3, width=16)
    pdf = spark.createDataFrame([(p,) for p in set(probes)], "k long")
    est = {
        r.k: r.est
        for r in count_min_estimate(sketch, pdf, "k", depth=3, width=16).collect()
    }
    exact = Counter(keys)
    for p in set(probes):
        assert est[p] >= exact.get(p, 0), (p, est[p], exact.get(p, 0))
        assert est[p] <= len(keys)


@given(
    docs=st.lists(
        st.text(alphabet="abc x", min_size=0, max_size=20), min_size=1, max_size=40
    ),
    needle=st.text(alphabet="abc x", min_size=1, max_size=6),
)
@BATCH
def test_trigram_search_always_equals_scan(spark, docs, needle):
    from apache_spark_link_prediction_spark.operators.text_index import trigram_search

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(r.doc_id for r in trigram_search(df, needle).collect())
    want = sorted(i for i, t in enumerate(docs) if needle.lower() in t.lower())
    assert got == want


@given(
    vals=st.lists(
        st.one_of(
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ),
            # exact 4dp half-ties — the case banker's rounding gets wrong
            st.integers(min_value=-10**7, max_value=10**7).map(lambda n: n * 5e-5),
        ),
        min_size=1,
        max_size=50,
    )
)
@BATCH
def test_np_round_half_away_matches_duckdb_round(vals):
    """_np_round_half_away must agree with DuckDB's round() (half away
    from zero) — including exact .00005 ties where np.round's banker's
    half-to-even convention splits (ADVICE r05)."""
    import duckdb
    import numpy as np

    from apache_spark_link_prediction_spark.queries import _np_round_half_away

    got = _np_round_half_away(np.array(vals, dtype=np.float64), 4)
    con = duckdb.connect()
    want = [
        con.execute("SELECT round(CAST(? AS DOUBLE), 4)", [v]).fetchone()[0]
        for v in vals
    ]
    assert np.allclose(got, want, rtol=0, atol=1e-12), list(zip(vals, got, want))


@given(
    sigs=st.lists(
        # small value domain so identical signatures (the collapse path)
        # and near-misses (hamming <= 3) both occur often
        st.integers(min_value=0, max_value=2**12 - 1),
        min_size=1,
        max_size=50,
    )
)
@BATCH
def test_signature_band_pairs_collapse_equivalence(spark, sigs):
    """The signature-collapse tier must be pair-for-pair identical to
    the uncollapsed banded Hamming join on arbitrary signature
    multisets (duplicates, singletons, near-misses)."""
    from apache_spark_link_prediction_spark.operators.dedup import signature_band_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "__id long, __sh long"
    )

    def run(collapse):
        return {
            (r["src_id"], r["dst_id"], r["hamming"])
            for r in signature_band_pairs(
                df, bits=32, blocks=4, max_hamming=3, collapse_exact=collapse
            ).collect()
        }

    assert run(True) == run(False)


@given(texts_list=st.lists(texts, min_size=1, max_size=25))
@BATCH
def test_simhash_expression_and_aggregation_forms_agree(spark, texts_list):
    """The single-expression simhash() (used by the streaming
    suppressor, no shuffle) and the explode→vote-aggregate
    simhash_cols() (used by batch dedup) are two implementations of the
    same definition and must produce identical signatures for every
    non-empty document. (Zero-token docs differ BY DESIGN: the
    expression form gives them signature 0, the aggregation form
    excludes them — pinned here too.)"""
    from apache_spark_link_prediction_spark.operators.dedup import (
        simhash,
        simhash_cols,
        tokenize,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts_list)], "doc_id long, text string"
    )
    expr = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", simhash("text", 32).alias("s")).collect()
    }
    agg = {
        r["__id"]: r["__sh"]
        for r in simhash_cols(df, "doc_id", "text", 32).collect()
    }
    # "zero tokens" must be judged by the ENGINE's tokenizer: Java \s
    # excludes unicode spaces (\u00a0, \u0085) that Python str.split()
    # strips, so a Python-side emptiness check would flake on them.
    empty = {
        r["doc_id"]
        for r in df.select(
            "doc_id", F.size(tokenize("text")).alias("n")
        ).collect()
        if r["n"] == 0
    }
    assert set(agg) == set(expr) - empty
    for d, sig in agg.items():
        assert expr[d] == sig, (texts_list[d], expr[d], sig)
    for d in empty:
        assert expr[d] == 0


@given(texts_list=st.lists(texts, min_size=1, max_size=20))
@BATCH
def test_minhash_expression_and_aggregation_forms_agree(spark, texts_list):
    """minhash_signature() (nested-HOF expression form) and
    minhash_signature_cols() (explode→min-aggregate form) implement the
    same definition over the hashed shingle sets and must agree hash
    for hash. (word_shingles never yields an empty array — empty text
    becomes the [""] shingle — so no exclusion case exists here.)"""
    from apache_spark_link_prediction_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_cols,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts_list)], "doc_id long, text string"
    )
    hashed = df.select(
        "doc_id",
        F.transform(word_shingles("text", 1), lambda s: F.xxhash64(s)).alias("sh"),
    )
    expr = {
        r["doc_id"]: list(r["sig"])
        for r in hashed.select(
            "doc_id", minhash_signature(F.col("sh"), 8).alias("sig")
        ).collect()
    }
    agg = {
        r["__id"]: [r[f"__h{i}"] for i in range(8)]
        for r in minhash_signature_cols(hashed, "doc_id", F.col("sh"), 8).collect()
    }
    assert agg == expr


def test_spark_round_convention_pin(spark):
    """Pin what Spark's rounding operators ACTUALLY do (VERDICT r06
    item 1).  The numeric_round_halfaway_suite gate now compares a
    shared IEEE closed form (sign*floor(abs(v)*p+0.5), scaled BIGINT)
    on BOTH engines, because the library functions themselves diverge
    across engines/versions; this test documents and pins the
    divergence so it can never silently re-enter an oracle:

    - F.round(double, n) and CAST(double AS DECIMAL) round half-up on
      the SHORTEST DECIMAL REPR of the double (BigDecimal.valueOf goes
      through Double.toString): round(1.005, 2) == 1.01 even though
      1.005 is really 1.00499...989.
    - DuckDB 1.0.0 round(DOUBLE, n) is multiply-based:
      round(1.005, 2) == 1.00.  Other DuckDB releases differ again —
      the r06 driver-red cause.
    Therefore round(double, n>0) MUST NOT appear in any oracle-gated
    column; use the closed form on both sides (scaled integers).
    Spark's version is pinned in-repo, so this pytest pin is
    environment-stable where a DuckDB-side pin was not."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    vals = [
        0.0, 2.5, -2.5, 3.5, -3.5, 0.05, -0.05, 0.15, 0.25, -0.25,
        2.675, -2.675, 0.285, -0.285, 1.005, -1.005, 490.015, -490.015,
        123.455, -123.455, 0.125, -0.125, 244.995, 245.005, 1e-3, -1e-3,
    ]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = df.select(
        "v",
        F.round(F.col("v")).cast("long").alias("r0"),
        F.round(F.col("v"), 2).alias("r2"),
        F.col("v").cast("decimal(18,3)").alias("dec3"),
    ).collect()

    def repr_half_up(v: float, q: str) -> Decimal:
        return Decimal(repr(v)).quantize(Decimal(q), rounding=ROUND_HALF_UP)

    for r in rows:
        assert r["r0"] == int(repr_half_up(r["v"], "1")), r
        assert Decimal(repr(r["r2"])) == repr_half_up(r["v"], "0.01"), r
        assert r["dec3"] == repr_half_up(r["v"], "0.001"), r

    # The concrete divergence that made CORRECTNESS_r06 red: Spark says
    # 1.01, the IEEE closed form (and DuckDB 1.0.0) says 1.00.
    demo = df.filter(F.col("v") == 1.005).select(
        F.round(F.col("v"), 2).alias("spark_round"),
        F.floor(F.abs(F.col("v")) * 100.0 + 0.5).alias("closed_form_centi"),
    ).first()
    assert float(demo["spark_round"]) == 1.01
    assert demo["closed_form_centi"] == 100


def test_halfaway_suite_closed_form_cross_engine(spark, sf_dir):
    """The closed form itself is bit-deterministic across engines: run
    numeric_round_halfaway_suite's Spark plan and its DuckDB oracle on
    the same parquet and require exact per-row equality (the same
    comparison the driver gate hashes, asserted value-by-value here so
    a future regression names the row and column)."""
    import duckdb

    from apache_spark_link_prediction_spark.queries import ORACLE, QUERIES

    got = {
        r["event_id"]: r.asDict()
        for r in QUERIES["numeric_round_halfaway_suite"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(ORACLE["numeric_round_halfaway_suite"])
    cols = [d[0] for d in cur.description]
    want = {row[0]: dict(zip(cols, row)) for row in cur.fetchall()}
    assert set(got) == set(want) and len(got) > 0
    for eid, g in got.items():
        for c in ("r0_scaled", "rneg_deci", "r2_centi", "signed_centi", "dec3_milli"):
            assert g[c] == want[eid][c], (eid, c, g[c], want[eid][c])


# ---------------------------------------------------------------------------
# Exact substring dedup vs an independent pure-Python reference
# ---------------------------------------------------------------------------

def _py_substring_regions(docs: dict[int, list[str]], L: int, within: bool):
    """Independent reference for exact_substring_regions: per (pair,
    diagonal), scan token equality runs DIRECTLY (no grams) — a maximal
    duplicated substring of length m >= L is a maximal equality run of
    m tokens along one diagonal. Emits the same (src, dst, src_pos,
    dst_pos, match_tokens) tuples."""
    out = set()
    ids = sorted(docs)
    pairs = [(a, b) for a in ids for b in ids if a < b]
    if within:
        pairs += [(a, a) for a in ids]
    for a, b in pairs:
        ta, tb = docs[a], docs[b]
        diags = range(-(len(ta)), len(tb) + 1)
        for d in diags:
            if a == b and d <= 0:
                continue  # within-doc: src_pos < dst_pos means diag > 0
            run = 0
            lo = max(0, -d)
            hi = min(len(ta), len(tb) - d)
            for i in range(lo, hi + 1):
                if i < hi and ta[i] == tb[i + d]:
                    run += 1
                else:
                    if run >= L:
                        out.add((a, b, i - run, i - run + d, run))
                    run = 0
    return out


small_tokens = st.sampled_from(["x", "y", "z"])  # tiny alphabet → dense dups


@given(
    st.lists(
        st.lists(small_tokens, min_size=0, max_size=14), min_size=2, max_size=5
    ),
    st.sampled_from([2, 3]),
    st.booleans(),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_exact_substring_regions_matches_reference(spark, docs, L, within):
    """Random tiny-alphabet corpora (periodic runs, shared prefixes,
    empty docs — the suffix-family edge cases) must agree with a
    diagonal-equality-scan reference that never builds a gram."""
    from apache_spark_link_prediction_spark.operators.dedup import (
        exact_substring_regions,
    )

    corpus = {i: toks for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        (r["src_id"], r["dst_id"], r["src_pos"], r["dst_pos"], r["match_tokens"])
        for r in exact_substring_regions(
            df, min_match_tokens=L, within_doc=within
        ).collect()
    }
    want = _py_substring_regions(corpus, L, within)
    assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])


@given(
    st.lists(
        st.lists(small_tokens, min_size=0, max_size=14), min_size=2, max_size=5
    ),
    st.sampled_from([2, 3]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_exact_substring_remove_matches_reference(spark, docs, L):
    """The rewrite against the same reference: dst-side intervals from
    the reference regions, python island merge, python cut — kept
    streams must match token-for-token (compared via the same rolling
    hash the operator emits, plus exact removal counts)."""
    from apache_spark_link_prediction_spark.functions.textstats import (
        doc_rolling_hash,
    )
    from apache_spark_link_prediction_spark.operators.dedup import (
        exact_substring_remove,
    )

    corpus = {i: toks for i, toks in enumerate(docs)}
    regions = _py_substring_regions(corpus, L, within=False)
    intervals: dict[int, list[tuple[int, int]]] = {}
    for _, dst, _, dpos, m in regions:
        intervals.setdefault(dst, []).append((dpos, dpos + m))
    kept_ref, removed_ref = {}, {}
    for i, toks in corpus.items():
        ivs = sorted(intervals.get(i, []))
        merged: list[list[int]] = []
        for s0, e0 in ivs:
            if merged and s0 <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e0)
            else:
                merged.append([s0, e0])
        covered = set()
        for s0, e0 in merged:
            covered.update(range(s0, e0))
        kept_ref[i] = [t for p, t in enumerate(toks) if p not in covered]
        removed_ref[i] = len(covered)

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_hash"])
        for r in exact_substring_remove(df, min_match_tokens=L).collect()
    }
    want_hash_inputs = [(i, " ".join(kept_ref[i])) for i in corpus]
    hdf = spark.createDataFrame(want_hash_inputs, "i long, s string")
    want_hash = {
        r["i"]: r["h"]
        for r in hdf.select("i", doc_rolling_hash("s").alias("h")).collect()
    }
    for i, toks in corpus.items():
        assert got[i] == (len(toks), removed_ref[i], want_hash[i]), (
            i, got[i], (len(toks), removed_ref[i], want_hash[i]), kept_ref[i]
        )
