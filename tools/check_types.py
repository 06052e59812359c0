"""Type-parity audit between Spark query outputs and their DuckDB
oracles. The value-hash comparator stringifies values, so it can hide
engine type divergences that a stricter (Arrow-typed) comparator would
flag — the round-1 driver failures were exactly this (DuckDB HUGEINT
from an uncast SUM vs Spark LONG). This tool compares schemas directly
and flags any column whose normalized type differs.

Round 12 (VERDICT r11 item 2) adds two checks for the class of bug
that made `dpp_partitioned_join` the round-11 driver red even though
every VALUE was exactly equal:

1. **Decimal-scale parity**: a Decimal's *textual rendering* (what the
   hash comparator sees) depends on its scale — Decimal('1.1300') at
   scale 4 vs scale 6 renders '1.1300' vs '1.130000'. Precision may
   differ between engines (Spark decimal(38,6) vs DuckDB DECIMAL(18,6)
   render identically) but SCALE must match, so decimal columns are
   compared scale-exactly, not just as "decimal".
2. **Engine-version-dependent scale lint**: `round(DECIMAL, k)`'s
   return SCALE is an engine convention (DuckDB 1.0 keeps the input
   scale; other versions return scale k) — a bare round() feeding a
   DECIMAL output column is green on one engine pair and a silent hash
   red on another. Any oracle with a DECIMAL output column whose SQL
   contains a round() NOT immediately wrapped in CAST(... AS ...) is
   flagged; the fix is the dpp pattern: pin both sides with an explicit
   CAST / .cast("decimal(p,s)").

Usage: python tools/check_types.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

import duckdb

sys.path.insert(0, ".")

# DuckDB type -> normalized; Spark simpleString -> normalized.
_DUCK = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "UBIGINT": "u64", "UINTEGER": "u32",
    "DOUBLE": "f64", "FLOAT": "f32", "DECIMAL": "decimal",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts_us", "TIMESTAMP_NS": "ts_ns", "DATE": "date",
}
_SPARK = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts_us", "timestamp_ntz": "ts_us", "date": "date",
}


def norm_duck(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{norm_duck(t[:-2])}>"
    base = t.split("(")[0].strip()
    return _DUCK.get(base, t.lower())


def norm_spark(t: str) -> str:
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{norm_spark(t[6:-1])}>"
    base = t.split("(")[0].strip()
    if base.startswith("decimal"):
        return "decimal"
    return _SPARK.get(base, base)


def decimal_scale(t: str) -> int | None:
    """Scale of a decimal type string ('decimal(18,4)' / 'DECIMAL(18,4)')
    from either engine; None if not a decimal."""
    m = re.match(r"\s*decimal\s*\(\s*\d+\s*,\s*(\d+)\s*\)", t, re.IGNORECASE)
    return int(m.group(1)) if m else None


def bare_rounds(sql: str) -> int:
    """Count round( occurrences NOT immediately wrapped in CAST( — the
    engine-version-dependent-scale hazard when the query emits DECIMAL.
    `CAST(round(x, k) AS DECIMAL(p,s))` pins the scale; a bare
    `round(decimal_expr, k)` inherits the engine's round-return-scale
    convention."""
    n = 0
    for m in re.finditer(r"round\s*\(", sql, re.IGNORECASE):
        head = sql[: m.start()].rstrip()
        if re.search(r"cast\s*\($", head, re.IGNORECASE):
            continue
        n += 1
    return n


# ---------------------------------------------------------------------------
# round()-in-hash-path lint (round 15, VERDICT r14 item 2).
#
# round(DOUBLE, n>0) is an ENGINE CONVENTION at exact half-points: Spark
# rounds the exact binary expansion via BigDecimal HALF_UP while DuckDB
# multiplies by 10^n in floating point and std::round()s the product, so a
# value whose exact rational form q | 2*10^n lands EXACTLY on a half and
# the two engines can disagree (the dpp r11/r12 reds; the class this
# repo migrated off in rounds 14-15). Every count-ratio score now ships
# as exact BIGINT micro-units ((10^6*num) div den), and ratio-of-exact-
# sums metrics emit the raw IEEE quotient of exactly-equal inputs.
#
# The remaining round() sites are each PROVABLY safe or documented
# accepted-risk, by category:
#   TRANSCENDENTAL     irrational results (ln/exp/sqrt/log2/cosine/
#                      stddev) of identical IEEE inputs: exact halves
#                      are measure-zero beyond double error.
#   TRANSCENDENTAL_SUM same, but summed as raw doubles before the round
#                      (order noise ~1 ulp; the coarse round absorbs
#                      it; residual half-zone ~1e-10 relative is the
#                      documented accepted risk).
#   STAGED_9DP         per-term round(x, 9) -> DECIMAL(.,9) sum
#                      (order-independent, exact). DEMOTED r17
#                      (VERDICT r16 items 1-2): the driver hashed
#                      embedding_dim_stats RED on raw float32 inputs —
#                      round(DOUBLE,9)->DECIMAL is venue-dialect-
#                      fragile exactly when the staged terms are DYADIC
#                      (raw floats, x*x of floats). The class is now
#                      admissible ONLY over TRANSCENDENTAL terms
#                      (ln/exp/p·ln p — exact halves measure-zero),
#                      and every remaining member below is
#                      driver-proven green on that footing. Dyadic-
#                      input sums must use signed nano-unit BIGINT
#                      (sign(v)·floor(|v|·1e9+0.5), the
#                      signed_exact_div family) instead.
#   QUANTILE_CENTI     quantile_cont interpolation over 2-decimal
#                      values: results are exact decimals at <= 6dp, so
#                      round(., >=6) is the identity.
#   CENTI_IDENTITY     round(v, k>=2) over values exact at <= k
#                      decimals (events.value is exactly 2-decimal).
#   DECIMAL_SUM_IDENT  exact DECIMAL sum (scale <= k) cast to double,
#                      round(., k) = identity.
#   SCALED_INT_IDENT   k/10^m with m <= round scale = identity.
#   SAFE_RATIONAL      p/q where q has a prime factor not in {2,5}:
#                      distance to any half-integer >= 1/(2q) >> double
#                      error, and exact halves cannot exist.
#   SAFE_SCALE0        round(x) at scale 0 on non-negative identical
#                      doubles: no scaling multiply exists to diverge;
#                      both engines round the same double half-up.
#
# A NEW oracle containing round( must either be migrated to integer
# micro-units / raw-IEEE form or earn an entry here with its category —
# otherwise end_of_round fails. Stale entries (no round( left) fail too.
ROUND_ALLOWLIST = {
    "approx_quantile_agg": "QUANTILE_CENTI",
    "arrow_vec_norms": "TRANSCENDENTAL (sqrt norm, 4dp)",
    "asof_join_events": "CENTI_IDENTITY (value passthrough)",
    "asof_join_pandas": "CENTI_IDENTITY (value passthrough)",
    "bigram_lm_perplexity": "STAGED_9DP (ln terms)",
    "bigram_pmi": "TRANSCENDENTAL (ln, 4dp)",
    "bm25_scoring": "TRANSCENDENTAL (ln idf terms, 6dp)",
    "cdc_apply_deletes": "CENTI_IDENTITY (value passthrough)",
    "chi_square_independence": "STAGED_9DP (expected-count terms)",
    "corpus_zipf_fit": "STAGED_9DP (ln rank/freq) + TRANSCENDENTAL OLS",
    "corr_by_group": "TRANSCENDENTAL (sqrt denominator)",
    "dsir_importance_select": "STAGED_9DP (ln ratio terms)",
    "embedding_binary_quant_topk": "TRANSCENDENTAL (cosine, 4dp)",
    "embedding_dim_stats": "",  # migrated r17 — signed nano-unit BIGINT
    # (the r16 driver red: STAGED_9DP over raw float32 falsified)
    "embedding_mrl_topk": "TRANSCENDENTAL (cosine, 4dp)",
    "embedding_pairs_exact": "TRANSCENDENTAL (cosine, 4dp)",
    "embedding_scalar_quantization": (
        "SAFE_SCALE0 (the quantizer round IS the algorithm) + "
        "TRANSCENDENTAL (recon error, 6dp)"
    ),
    "embedding_topk_bruteforce": "TRANSCENDENTAL (cosine, 4dp)",
    "event_anomaly_mad": "QUANTILE_CENTI (median/MAD of centi values)",
    "gini_revenue_concentration": "CENTI_IDENTITY (o_totalprice staging)",
    "graph_adamic_adar": "TRANSCENDENTAL_SUM (sum 1/ln d, 6dp)",
    "graph_degree_assortativity": "TRANSCENDENTAL (sqrt denominator)",
    "graph_pagerank": "TRANSCENDENTAL_SUM (damped iteration, 5dp)",
    "graph_resource_allocation": (
        "TRANSCENDENTAL_SUM (sum 1/d, 6dp — exact rational form "
        "infeasible: lcm of neighbor degrees; documented accepted risk)"
    ),
    "hard_negative_mining": "TRANSCENDENTAL (cosine, 4dp)",
    "knn_label_agreement": (
        "TRANSCENDENTAL (cosine, 4dp) — rank-only: the rounded cosine "
        "orders the top-k and never reaches the output columns"
    ),
    "embedding_norm_outlier_audit": "",  # migrated r17 — nano-unit BIGINT
    # sqn (x² ≥ 0, no sign term); mad_nano is an exact dyadic quarter,
    # emitted unrounded (same driver-red family as embedding_dim_stats)
    "hybrid_rank_fusion_rrf": "TRANSCENDENTAL (bm25 leg ranks on 6dp ln)",
    "incremental_agg_merge": "CENTI_IDENTITY (min/max passthrough)",
    "multimodal_audio_centroid_tone": (
        "SCALED_INT_IDENT (closed-form dyadic decimals exact at 4dp)"
    ),
    "multimodal_audio_energy": "TRANSCENDENTAL (sqrt RMS, 6dp)",
    "multimodal_png_roundtrip": "SAFE_RATIONAL (mean over q=192=2^6*3)",
    "ndcg_retrieval_eval": "TRANSCENDENTAL (log2 discounts, 6dp)",
    "null_semantics_suite": "DECIMAL_SUM_IDENT",
    "pagerank_parts": "TRANSCENDENTAL_SUM (damped iteration, 6dp)",
    "pandas_udf_cosine": "TRANSCENDENTAL (cosine, 4dp)",
    "pareto_skyline_parts": "SAFE_SCALE0 (cents) + CENTI_IDENTITY",
    "percentile_agg": "QUANTILE_CENTI",
    "python_datasource_agg": "SCALED_INT_IDENT (k/1000 at 3dp)",
    "scd2_point_in_time_join": "CENTI_IDENTITY (value passthrough)",
    "streaming_stateful_ema": (
        "TRANSCENDENTAL_SUM (ordered EMA recursion, identical op "
        "sequence both engines, 6dp)"
    ),
    "streaming_static_join": "CENTI_IDENTITY (centi x dyadic weights <=3dp)",
    "streaming_stream_join": "SCALED_INT_IDENT (us epoch diff exact at 6dp)",
    "streaming_stream_join_outer": "SCALED_INT_IDENT (us epoch diff)",
    "table_profile": "CENTI_IDENTITY (min/max passthrough)",
    "target_encode_loo": "CENTI_IDENTITY (y staging round, CAST-pinned)",
    "tfidf_keywords": "TRANSCENDENTAL (ln idf, 6dp)",
    "time_decay_user_score": "STAGED_9DP (exp terms)",
    "token_drift_js": "TRANSCENDENTAL_SUM (ln JS terms, 6dp)",
    "token_entropy": "STAGED_9DP (p ln p terms)",
    "tpch_q10_returned_items": "DECIMAL_SUM_IDENT (4dp-exact sum)",
    "tpch_q11_important_stock": "SCALED_INT_IDENT (k/100 at 2dp)",
    "tpch_q14_promo_effect": "",  # migrated r15 — raw IEEE (no round left)
    "tpch_q15_top_supplier": "DECIMAL_SUM_IDENT",
    "tpch_q16_supplier_count": "SCALED_INT_IDENT (k/100 at 2dp)",
    "tpch_q17_avg_qty": "SAFE_RATIONAL (sum/7, q=7 not in {2,5})",
    "tpch_q19_discounted_revenue": "DECIMAL_SUM_IDENT",
    "tpch_q20_excess_inventory": "SCALED_INT_IDENT (k/100 at 2dp)",
    "tpch_q2_min_cost_supplier": "SCALED_INT_IDENT + CENTI_IDENTITY",
    "tpch_q6_forecast_revenue": "DECIMAL_SUM_IDENT",
    "tpch_q8_market_share": "",  # migrated r15 — raw IEEE
    "tpch_q9_product_profit": "SCALED_INT_IDENT (k/100 at 2dp)",
    "unigram_logprob_score": "TRANSCENDENTAL_SUM (avg -ln p, 6dp)",
    "unpivot_measures": "DECIMAL_SUM_IDENT",
    "window_functions_suite": "",  # migrated r15 — micro-units
    "winsorize_by_group": "QUANTILE_CENTI",
    "zscore_by_group_pandas": "TRANSCENDENTAL (stddev, 4dp)",
}
# Entries with an empty justification are tombstones for queries
# migrated this round; they are pruned below and kept only so the
# diff shows WHAT was migrated. Prune on next touch.
ROUND_ALLOWLIST = {k: v for k, v in ROUND_ALLOWLIST.items() if v}


def lint_rounds(oracles: dict[str, str]) -> int:
    """FLAG (a) any oracle containing round( without an allowlist
    category, (b) stale allowlist entries whose oracle no longer
    contains round( (so the list can't rot). Deletion-rot (an
    allowlist key whose QUERY was removed from the registry) is
    :func:`lint_removed_keys` — kept separate because this function is
    also pinned against small synthetic dicts in tests."""
    n = 0
    for name, sql in oracles.items():
        has = bool(re.search(r"\bround\s*\(", sql, re.IGNORECASE))
        if has and name not in ROUND_ALLOWLIST:
            print(
                f"FLAG  {name}: round() in oracle SQL without a "
                "ROUND_ALLOWLIST category — migrate to BIGINT "
                "micro-units / raw-IEEE or document the safe category"
            )
            n += 1
        elif not has and name in ROUND_ALLOWLIST:
            print(
                f"FLAG  {name}: stale ROUND_ALLOWLIST entry (no round( "
                "left in its oracle) — remove the entry"
            )
            n += 1
    return n


def lint_removed_keys(oracles: dict[str, str]) -> int:
    """FLAG allowlist keys (ROUND_ or SIGNED_DIV_) whose query was
    DELETED from the registry — lint_rounds only iterates the oracles
    dict, so removal-rot slipped through it (ADVICE r15 #5). Call with
    the FULL registry only."""
    n = 0
    for listname, keys in (
        ("ROUND_ALLOWLIST", ROUND_ALLOWLIST),
        ("SIGNED_DIV_ALLOWLIST", SIGNED_DIV_ALLOWLIST),
    ):
        for name in sorted(set(keys) - set(oracles)):
            print(
                f"FLAG  {name}: {listname} entry for a query no longer "
                "in the registry — remove the entry"
            )
            n += 1
    return n


# ---------------------------------------------------------------------------
# Signed-integer-division lint (round 16, VERDICT r15 item 3).
#
# Integer division on a NEGATIVE numerator is an engine-version convention
# (truncate toward zero vs floor: −7/2 → −3 vs −4; Spark `div` and DuckDB
# 1.0 `//` both truncate, but the convention is fragile across versions
# and engines — Python `//` floors). The house form for signed scores is
# MAGNITUDE division, identical under both conventions:
# Spark `signed_exact_div` (functions/pairwise.py), oracle twin
# `sign(num) * (abs(num) // den)`. This lint scans every oracle's `//`
# operands: a numerator containing a top-level binary minus (the one
# static marker of "can go negative") that is not abs()-wrapped must
# either be migrated or carry a SIGNED_DIV_ALLOWLIST entry proving why
# the raw convention is safe.
SIGNED_DIV_ALLOWLIST = {
    "numeric_intdiv_mod_suite": (
        "DELIBERATE sign pin: this suite EXISTS to assert that Spark div "
        "and this DuckDB's // agree (truncate toward zero) on real "
        "negative data; hash-green is the proof. If a DuckDB upgrade "
        "flips // to floor, THIS query reds first — the canary."
    ),
    "doc_novelty_score": (
        "n_grams - n_seen >= 0: seen grams are a subset of the doc's "
        "grams by construction (the join that builds n_seen filters on "
        "membership)."
    ),
    "gopher_repetition_ngram": (
        "len(g) - len(list_distinct(g)) >= 0: dedup never lengthens a "
        "list."
    ),
    "rater_agreement_kappa": (
        "CASE-guarded sign-magnitude: branch 1 requires nn*agree >= "
        "expct, branch 2 divides expct - nn*agree under the opposite "
        "guard — each branch's numerator is non-negative by its guard. "
        "This IS the house signed_exact_div pattern, spelled as CASE."
    ),
    "target_encode_loo": (
        "sy - y >= 0: sy is the group sum INCLUDING the row's own y, "
        "and events.value >= 0 by data contract (min is 0.0 at every "
        "SF; y = round(value, 6))."
    ),
    "text_quality": (
        "length(text) - length(regexp_replace(text, strip-class, '')) "
        ">= 0: removing characters never lengthens a string."
    ),
    "window_functions_suite": (
        "rn - 1 >= 0: row_number() starts at 1."
    ),
    "corpus_snapshot_churn": (
        "in_a/in_b are 0/1 flags, so (1 - in_a) and (1 - in_b) are >= 0 "
        "and the numerator is a sum of products of non-negatives."
    ),
    "ngram_collision_audit": (
        "n_distinct_grams - n_buckets_used >= 0: every used bucket "
        "holds at least one distinct gram, so buckets_used <= grams "
        "(pigeonhole)."
    ),
    "pass_at_k_eval": (
        "f*(f-1)*...*(f-k+1) with f = 16 - sum(0/1 flags over exactly "
        "16 rows) >= 0: the factors are CONSECUTIVE descending "
        "integers, so when f < k the factor 0 is in the product "
        "(product = 0, pass@k = 1) and when f >= k all factors are "
        "positive — the numerator is never negative (the standard "
        "pass@k falling-factorial identity)."
    ),
}


def _floordiv_numerator(sql: str, pos: int) -> str:
    """The operand left of a `//` at pos: a bare token, or a balanced
    paren group including any function name glued to it."""
    i = pos - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i < 0:
        return ""
    if sql[i] == ")":
        depth, j = 0, i
        while j >= 0:
            if sql[j] == ")":
                depth += 1
            elif sql[j] == "(":
                depth -= 1
                if depth == 0:
                    break
            j -= 1
        k = j - 1
        while k >= 0 and (sql[k].isalnum() or sql[k] in "_."):
            k -= 1
        return sql[k + 1 : i + 1]
    j = i
    while j >= 0 and (sql[j].isalnum() or sql[j] in "_."):
        j -= 1
    return sql[j + 1 : i + 1]


def _mask_safe_spans(expr: str) -> str:
    """Blank out spans whose minus signs cannot make the numerator
    negative: single-quoted string literals and abs(...) bodies (abs of
    anything is non-negative)."""
    out = list(expr)
    # string literals ('' escapes handled by re-entering string state)
    in_str = False
    for i, ch in enumerate(expr):
        if ch == "'":
            in_str = not in_str
        elif in_str:
            out[i] = " "
    expr2 = "".join(out)
    # abs(...) spans, innermost-out via repeated scan
    low = expr2.lower()
    for m in re.finditer(r"\babs\s*\(", low):
        depth, j = 0, m.end() - 1
        while j < len(expr2):
            if expr2[j] == "(":
                depth += 1
            elif expr2[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        for k in range(m.start(), min(j + 1, len(expr2))):
            out[k] = " "
    return "".join(out)


def _has_binary_minus(expr: str) -> bool:
    """True if expr (token or paren group, incl. leading func name)
    contains a BINARY minus at ANY paren depth, after masking string
    literals and abs() spans and skipping DuckDB lambda arrows (->) —
    the static marker of a possibly-negative numerator. Any-depth
    because `(10^6 * (a - b)) // d` nests the risky minus one level
    down (the exact shape of the kappa/te_loo class)."""
    body = _mask_safe_spans(expr)
    for idx, ch in enumerate(body):
        if ch != "-":
            continue
        if idx + 1 < len(body) and body[idx + 1] == ">":
            continue  # lambda arrow
        prev = body[:idx].rstrip()
        if prev and (prev[-1].isalnum() or prev[-1] in ")_"):
            return True
    return False


def lint_signed_divs(oracles: dict[str, str]) -> int:
    """FLAG any oracle `//` whose numerator has a top-level binary
    minus and is not abs()/greatest()-wrapped, unless allowlisted; also
    FLAG stale allowlist entries whose present oracle has no
    signed-risk `//` left (deletion-rot is lint_removed_keys)."""
    n = 0
    flagged_names = set()
    for name, sql in oracles.items():
        for m in re.finditer(r"//", sql):
            num = _floordiv_numerator(sql, m.start())
            low = num.lower()
            if low.startswith(("abs(", "greatest(")):
                continue
            if _has_binary_minus(num):
                flagged_names.add(name)
                if name not in SIGNED_DIV_ALLOWLIST:
                    print(
                        f"FLAG  {name}: `//` on a possibly-negative "
                        f"numerator {num[:60]!r} — migrate to "
                        "signed_exact_div / sign(x)*(abs(x)//d) or add a "
                        "SIGNED_DIV_ALLOWLIST justification"
                    )
                    n += 1
    for name in sorted(SIGNED_DIV_ALLOWLIST):
        if name in oracles and name not in flagged_names:
            print(
                f"FLAG  {name}: stale SIGNED_DIV_ALLOWLIST entry (no "
                "signed-risk `//` left in its oracle) — remove the entry"
            )
            n += 1
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from __spark_entry__ import oracle_sql, queries
    from apache_spark_link_prediction_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    n_flagged = (
        lint_rounds(oracles)
        + lint_signed_divs(oracles)
        + lint_removed_keys(oracles)
    )
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            sdtypes = dict(fn(spark, sf_dir).dtypes)
            rows = con.execute(f"DESCRIBE SELECT * FROM ({oracles[name]})").fetchall()
            ddtypes = {r[0]: r[1] for r in rows}
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"ERROR {name}: {e}")
            n_flagged += 1
            continue
        has_decimal_out = False
        for col in sorted(set(sdtypes) & set(ddtypes)):
            s, d = norm_spark(sdtypes[col]), norm_duck(ddtypes[col])
            if s != d:
                print(f"FLAG  {name}.{col}: spark={sdtypes[col]} ({s}) duckdb={ddtypes[col]} ({d})")
                n_flagged += 1
            if s == d == "decimal":
                has_decimal_out = True
                ss, ds = decimal_scale(sdtypes[col]), decimal_scale(ddtypes[col])
                if ss != ds:
                    print(
                        f"FLAG  {name}.{col}: decimal SCALE mismatch "
                        f"spark={sdtypes[col]} duckdb={ddtypes[col]} — "
                        "renders differently under the hash comparator"
                    )
                    n_flagged += 1
        if has_decimal_out and (nb := bare_rounds(oracles[name])):
            # WARN, not FLAG (ADVICE r12): the count is query-wide, so a
            # round() feeding an unrelated DOUBLE column alongside a
            # decimal sum would false-positive and block end_of_round on
            # a correctly pinned query. Scale mismatches on the decimal
            # columns themselves (the real hash hazard) are still FLAGs
            # above; this heuristic only nudges a human to look.
            print(
                f"WARN  {name}: {nb} bare round() with DECIMAL output — "
                "if the round() produces the decimal column, pin with "
                "CAST(round(...) AS DECIMAL(p,s)) on both sides"
            )
    print(f"\n{n_flagged} type divergences" if n_flagged else "\nall types parity")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
