"""Synthetic-scale correctness probe: multiply the single-table
fixtures by N and run the decimal-heavy oracles at a scale the driver
never tests.

Round-5 history: this probe (x10 on sf0.1 ≈ sf1) caught the
decimal->double conversion divergence on q01's sum_charge that no
shipped fixture was big enough to trigger — once a scale-6 decimal
sum's unscaled value exceeds 2^53, Spark's BigDecimal conversion and
DuckDB's int128/10^k float path can differ by one ulp. Run it again
whenever the decimal/aggregate helpers change.

Usage: python tools/scale_probe.py [base_sf_dir] [multiplier]
(defaults: /root/testdata/sf0.1 x10; builds /tmp/kaylee_scale_probe)
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: tables worth multiplying (fact tables the money/time aggs scan)
MULTIPLIED = ("lineitem", "customer", "events", "documents", "orders")

#: id columns made UNIQUE across copies (id + copy * offset) instead
#: of plainly duplicated: the time-series shelf (e22-e27) orders
#: windows by (ts, event_id), so a duplicated event_id would leave the
#: sort non-total and the probe nondeterministic; offsetting also
#: makes the x10 corpus REAL scale growth for doc-keyed stats (t21's
#: dfs actually grow x10 instead of collapsing under DISTINCT).
ID_OFFSET = {
    "events": ("event_id", 10_000_000),
    "documents": ("doc_id", 1_000_000),
    # unique orderkeys keep a28's per-(row, replicate) bootstrap draws
    # distinct across copies — duplicated keys would make the x10
    # corpus 10 exact repeats of every Poisson weight instead of real
    # sample growth
    "orders": ("o_orderkey", 100_000_000),
}

#: single-table group-by queries whose semantics survive row
#: multiplication (counts/sums scale by N; no cross-table joins to
#: desynchronize); q27/a07 etc. join unmultiplied dims and are instead
#: covered by the ROUND-lockstep they share with these.
PROBE_QUERIES = (
    "q01_pricing_summary",
    "q06_revenue_forecast",
    "q08_nation_having",
    "q14_conditional_agg",
    "q23_date_trunc",
    "a04_stat_moments",
    "a05_pivot",
    "e01_tumbling_window",
    "e02_sliding_window",
    "t01_lang_stats",
    # third-session additions: single-table decimal/window shapes whose
    # semantics survive row multiplication (sums/counts scale by N;
    # a17's per-row z and e15's slope are scale-invariant; t14's
    # cutoff membership changes with N but both engines see the same
    # multiplied data)
    "a17_zscore_outliers",
    "e15_trend",
    "e17_rollup_cascade",
    "t14_vocabulary",
    # fourth-session additions: events-table holistic shapes (exact
    # percentiles of a x10-duplicated multiset are unchanged, counts
    # scale by N; probes the interpolation + 6dp-rounding recipe at a
    # per-group cardinality no shipped fixture reaches)
    "a21_mad_outliers",
    "a22_equidepth_histogram",
    # fifth-session addition: a02's exact side (COUNT DISTINCT and
    # exact percentiles of a x10-duplicated multiset are unchanged;
    # the sketch bound booleans must stay TRUE at 10x the input, which
    # probes HLL/quantile-summary merge behavior at a row count no
    # shipped fixture reaches)
    "a02_approx_sketches",
    # round-7 additions: the round-6 stats/time-series shelf, which
    # previously had scale ARGUMENTS but no measurement (VERDICT r6
    # item 6). The lineitem/events stats are order-independent exact-
    # moment aggregates (average-rank ties for a24, DISTINCT baskets
    # for a25, decimal moments for a26/a27), so plain duplication is
    # a valid 10x input; the per-key window family (e22-e27) needs the
    # event_id offset above to keep its (ts, event_id) sorts total —
    # each user's series then carries 10 events per timestamp, which
    # also stress-tests e23's degenerate-window sd=0 gate and z clamp
    # at a density no shipped fixture reaches.
    "a24_spearman_corr",
    "a25_association_rules",
    "a26_welch_ttest",
    "a27_benford_screen",
    "e22_interpolate",
    "e23_rolling_anomaly",
    "e24_ewma",
    "e25_markov_transitions",
    "e26_autocorrelation",
    "e27_cusum_shift",
    # t21 over the doc_id-offset x10 corpus: dfs and pair counts grow
    # 10x for real (no DISTINCT collapse), probing the df-gate and the
    # literal-N PMI arithmetic at ~50k docs
    "t21_pmi_collocations",
    # w06 over x10-duplicated customers: the rev<->customer join fans
    # out 10 identical (nation, custkey, rev_dec) rows, so the rank
    # window must stay deterministic under maximal ties
    "w06_pareto_abc",
    # later round-7 additions. e28/e29 ride the event_id offset (total
    # (ts, event_id) sorts; 10 events per user-timestamp stresses the
    # SCD2 run tie-break and the seasonal decimal moments); a28 rides
    # the o_orderkey offset (15k real orders per priority -> 150k:
    # replicate means tighten, the rank-based CI must stay exact);
    # a29 joins the x10 customer fan-out; d17/t23/t24 run the document
    # shelf at ~50k docs — d17's distinct-shingle sets collapse the
    # duplication (same matrix, 10x the scan), t23's per-doc entropy
    # recurs per copy, t24's LM counts scale 10x for real (the
    # unrounded-mean recipe at a vocabulary no fixture reaches).
    "e28_scd2_history",
    "e29_seasonal_anomaly",
    "a28_bootstrap_ci",
    "a29_unpivot",
    "d17_corpus_similarity",
    "t23_char_entropy",
    "t24_dsir_score",
    # final round-7 batch. t25's row-local profile recurs per doc copy;
    # d19 is the stress case: every copied doc makes EVERY window
    # cross-doc shared (support 10x, shared_frac -> 1.0 everywhere) —
    # the support agg and its co-partitioned join at 5.5M window
    # occurrences; a30's KS num = |i*m - j*n| reaches ~4e10 with the
    # HUGEINT/decimal(38) significance compare exercised for real;
    # a31's bin counts scale 10x (the add-1 smoothing must still
    # bit-match); e30 rides the event_id offset — 10 purchases per
    # original ts PIT-join against a 10x-deep SCD2 dimension under the
    # (ts, event_id) tie-break; t26's manifest re-buckets the offset
    # doc_ids (shard totals are real new arithmetic, not 10 repeats);
    # p02's budget walk sees copy-0 ids first (offsets sort after), so
    # the kept prefix changes ONLY via the oracle-shared window; g07
    # reruns on an UNCHANGED graph (offset order keys never join the
    # un-offset lineitem copies; distinct-order counts are invariant) —
    # it probes the 10x scan feeding the same trajectory.
    "t25_repeated_ngrams",
    "d19_duplicate_windows",
    "a30_ks_test",
    "a31_psi_drift",
    "e30_pit_join",
    "t26_shard_manifest",
    "p02_pretraining_mix",
    "g07_label_propagation",
    # latest round-7 batch. w07's customer x orders fan-out multiplies
    # every customer's revenue 100x (10 customer copies x 10 order
    # copies via the un-offset custkey join) — the decimal(38,2) rank
    # formula must absorb it; q30's qty sums grow 10x so nearly every
    # order clears the 250 threshold (the top-100 tie-break does the
    # work); q31's dormant set replicates 10x per customer copy; e31
    # scores 10x-deep day bins against the same reference day; d20
    # re-screens at a 10x corpus (m grows with |corpus|, so positions
    # re-derive — the oracle replays the bigger filter bit-for-bit).
    "w07_gini_concentration",
    "q30_large_volume_orders",
    "q31_dormant_rich_customers",
    "e31_psi_timeline",
    "d20_bloom_prescreen",
    # round-9 addition. t27 over the x10 corpus: every phrase count
    # scales 10x so every SHARE is invariant — the heavy set must be
    # IDENTICAL at x10 while the MG pass-1 summaries see 10x the rows
    # (trim pressure grows for real; pass-2 exactness must hold).
    "t27_heavy_phrases",
    # round-10 additions. a32 decodes ~16.7k full PNGs whose dims/seed
    # derive from the OFFSET doc_ids (real new pixel arithmetic, not 10
    # repeats — the oracle enumerates a 10x lattice); e33's variant
    # k-bucket counts scale 10x with per-copy re-parse of the same
    # props domain; t28's pair counts scale 10x so the greedy merge
    # SEQUENCE is invariant (ties break identically) while every
    # round's count grows — the loop must land the same 5 rules.
    "a32_png_pixel_stats",
    "e33_variant_extract",
    "t28_bpe_train",
    # a33 like a32: offset doc_ids give real new sample arithmetic
    "a33_wav_sample_stats",
    # t29: offset ids give 10x REAL candidates for the same k=100 —
    # the quantized-ln boundary behavior at a selection pressure no
    # shipped fixture reaches
    "t29_weighted_sample",
    # round-11 additions. t30: the batched disjoint selection must
    # pick the same 6 rules at x10 (counts scale, ties invariant);
    # q32: x10 fan-out changes WHICH orders are multi-supplier — the
    # semi/anti pair must agree with the oracle's EXISTS algebra on
    # real new data; a34: the analyze-time schema is scale-blind but
    # the typed-NULL path sees 10x the payloads
    "t30_bpe_train_batched",
    "q32_sole_fault_suppliers",
    "a34_polymorphic_udtf",
    # d22: x10 text copies multiply candidate pairs ~100x but the
    # output stays <= k rows per src — the bounded-rung property at
    # the scale where d16's full enumeration measured 979x output
    "d22_containment_topk",
    # a35: the Arrow-kernel profile recurs per doc copy (offset ids
    # give 10x real rows through the RecordBatch path)
    "a35_arrow_batch_stats",
    # round-13 mergeable stores: x10 is where the integer register
    # envelopes earn their keep — a39's per-shard S2 and a41/q39's
    # DECIMAL(38,0)/HUGEINT merges see 10x the magnitude, and the
    # merge_exact booleans re-prove shard-merge ≡ direct on real new
    # data; q38's 5·n·q < Σq threshold sees 10x the per-part counts
    "a39_moment_store",
    "a40_quantile_store",
    "a41_comoment_store",
    "q38_small_quantity_revenue",
    "q39_important_part_values",
    # t31: training invariance (t28's argument) plus the apply chain
    # over 10x real docs — per-doc counts are new arithmetic, not
    # repeats, because the offset ids join nothing
    "t31_bpe_apply",
    # late round-11 additions. w08: user_ids are NOT offset, so x10
    # events leave the distinct (user, day) set unchanged — the WAU
    # curve must be INVARIANT while the dedup exchange sees 1M rows;
    # e34: 10 purchases per original ts carry the same last touch
    # under the (ts, event_id) tie-break — attributed revenue scales
    # exactly 10x; a36: counts scale 10x so U scales 100x — the
    # decimal(38,0) denominator-cleared significance compare is
    # exercised near 1e31 for real; a37: duplicate observations are
    # idempotent on MAX registers — n_exact, estimate and BOTH
    # booleans must be bit-identical to the sf0.1 run; a38: severe
    # incidents multiply 10x (offset event_ids are real new incident
    # rows at the SAME seconds) so every overlap pair recurs 10x and
    # the bucketed join carries ~5M pairs; q33: pair quantities scale
    # 10x so the 2*early > total decimal comparison is RATIO-invariant
    # (same qualifying pairs, 10x the scan); q34: the bucketed write
    # re-pays its one shuffle over 6M rows and the zero-Exchange read
    # join must still reconcile to the raw-parquet oracle.
    "w08_sliding_distinct_users",
    "e34_last_touch_attribution",
    "a36_mann_whitney",
    "a37_hll_distinct_store",
    "a38_interval_overlap_join",
    "q33_front_loaded_supply",
    "q34_bucketed_colocated_join",
    # round-12 additions. q37: lineitem keys are duplicated (not
    # offset) so MAX-derived box bounds are x10-INVARIANT while the
    # box matches 10x the rows — the Z-clustered write re-pays its
    # range shuffle over 6M rows and the footer-stats roundtrip must
    # reconcile to the raw-parquet oracle; e38: the orders key offset
    # gives 10x REAL change keys (each (k+i*1e8)%7==0 slice is new
    # arithmetic), so the streamed copy-on-write chain merges ~857k
    # changes across its micro-batches and must still equal the
    # one-shot batch upsert oracle.
    "q37_zorder_box_scan",
    "e38_streamed_upsert_snapshot",
    # p03: offset doc_ids make the x10 corpus 10x REAL documents, so
    # every observed counter (input, quality survivors, char mass,
    # distinct hashes) scales for real — the observe() path must agree
    # with DuckDB's filtered aggregates at 50k docs
    "p03_observed_funnel",
    # a39: offset event_ids give 10x real observations, so every
    # register (n, S1, S2 in cents) scales for real and the shard-
    # merge ≡ direct booleans are exercised at 10x magnitudes
    "a39_moment_store",
)


def build(
    base: str,
    out: str,
    multiplier: int,
    multiplied: tuple = MULTIPLIED,
    id_offset: dict | None = None,
) -> None:
    from pyspark.sql import functions as F

    from kaylee_spark.session import get_spark
    from kaylee_spark.sources import TABLES

    if id_offset is None:
        id_offset = ID_OFFSET
    spark = get_spark("scale_probe", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in multiplied:
        dst = f"{out}/{t}.parquet"
        if os.path.lexists(dst):
            (shutil.rmtree if os.path.isdir(dst) else os.remove)(dst)
        df = spark.read.parquet(f"{base}/{t}.parquet")
        big = df.crossJoin(
            spark.range(multiplier).select(F.col("id").alias("_copy"))
        )
        if t in id_offset:
            col, off = id_offset[t]
            big = big.withColumn(col, F.col(col) + F.col("_copy") * F.lit(off))
        big = big.drop("_copy")
        # single FILE, not a directory: DuckDB's view creation reads
        # '<path>' exactly like the shipped fixtures
        tmp = f"{out}/_tmp_{t}"
        big.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
        shutil.rmtree(tmp)
        print(f"built {t} x{multiplier}")
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{base}/{t}.parquet", dst)


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    multiplier = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = "/tmp/kaylee_scale_probe"
    build(base, out, multiplier)
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracle.py")
    return subprocess.call([sys.executable, tool, out, *PROBE_QUERIES])


if __name__ == "__main__":
    raise SystemExit(main())
