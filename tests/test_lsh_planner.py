"""LSH parameter planner tests (SURVEY §4.2's named optimizer scope):
S-curve math invariants, reproduction of the shipped configs, planted-
corpus recall floors at two scales, and the Sigma df^2 cost model
against ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaylee_spark.operators import dedup as D
from kaylee_spark.operators.lsh_planner import (
    BandingPlan,
    candidate_pairs_bound,
    minhash_plan,
    minhash_recall,
    plan_max_df,
    shingle_df_histogram,
    signlsh_plan,
    signlsh_recall,
)


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7, 0.9])
@pytest.mark.parametrize("target", [0.9, 0.99])
def test_minhash_plan_meets_recall_within_budget(threshold, target):
    plan = minhash_plan(threshold, target_recall=target, max_hashes=128)
    assert plan.bands * plan.rows == plan.num_hashes <= 128
    assert plan.recall_at_threshold >= target
    assert minhash_recall(threshold, plan.bands, plan.rows) >= target
    # the S-curve must discriminate: clearly-below-threshold pairs
    # are strictly less likely to surface than threshold pairs
    assert plan.fp_rate < plan.recall_at_threshold


def test_minhash_plan_prefers_sharper_curves_with_budget():
    """More hash budget must never produce a WORSE false-candidate
    rate — the planner trades hashes for S-curve sharpness."""
    tight = minhash_plan(0.5, target_recall=0.99, max_hashes=16)
    wide = minhash_plan(0.5, target_recall=0.99, max_hashes=64)
    assert wide.fp_rate <= tight.fp_rate


def test_minhash_plan_reproduces_shipped_d04_config():
    """The config wired into d04/d13 (resolve_banding's default)."""
    plan = minhash_plan(0.5, target_recall=0.99, max_hashes=64)
    assert (plan.bands, plan.rows, plan.num_hashes) == (17, 2, 34)
    assert D.resolve_banding(None, None, 0.5) == (34, 17)
    # explicit configs pass through untouched
    assert D.resolve_banding(32, 16, 0.5) == (32, 16)


def test_resolve_banding_honors_half_pinned_budget():
    """A pinned num_hashes with bands=None is a BUDGET, not a value to
    silently discard: the planner must plan within it (and a bigger
    budget must not plan worse than the 64-hash default)."""
    nh_default, _ = D.resolve_banding(None, None, 0.5)
    nh_128, bands_128 = D.resolve_banding(128, None, 0.5)
    assert nh_128 <= 128
    assert nh_128 >= nh_default  # the larger budget was actually used
    assert nh_128 % bands_128 == 0  # still a valid bands x rows grid
    # a tiny pinned budget binds
    nh_8, _ = D.resolve_banding(8, None, 0.5)
    assert nh_8 <= 8
    # bands without num_hashes is underdetermined -> error, not a guess
    with pytest.raises(ValueError):
        D.resolve_banding(None, 16, 0.5)


def test_hamming_plan_defaults_to_classic_pigeonhole():
    """Unknown corpus size (and fixture-scale sizes) -> the classic
    radius+1 split, i.e. exactly the shipped d05 designs."""
    from kaylee_spark.operators.lsh_planner import hamming_plan

    plan = hamming_plan(3, 62)
    assert (plan.blocks, plan.tables) == (4, 4)
    assert hamming_plan(6, 62).blocks == 7  # d05's max_hamming=6 design
    assert hamming_plan(3, 62, n_docs=5_000).blocks == 4


def test_hamming_plan_deepens_at_scale():
    """At 10^9 docs the collision term dominates: the planner must
    move to deeper blocking (longer keys, more tables) and that design
    must genuinely beat the classic one under the same cost model."""
    from kaylee_spark.operators.lsh_planner import hamming_plan

    n = 10**9
    deep = hamming_plan(3, 62, n_docs=n)
    assert deep.blocks > 4
    assert deep.keyed_bits > 15
    classic_cost = 4 * n + 4 * (n * (n - 1) / 2) / 2**15
    assert deep.cost < classic_cost / 100
    # recall is structural (pigeonhole), not probabilistic: every
    # design the planner can emit keys C(blocks, radius) wildcards
    assert deep.tables == __import__("math").comb(deep.blocks, 3)
    with pytest.raises(ValueError):
        hamming_plan(-1, 62)
    with pytest.raises(ValueError):
        hamming_plan(70, 62)


def test_signlsh_plan_reproduces_shipped_s02_config():
    """The shipped ANN config (4 planes x 12 tables, 1-bit probe) is
    the planner's own choice at recall 0.9999 / cosine 0.45 / 48 bits
    — and the multi-probe term is what affords the 4-plane depth:
    without probing the same recall forces shallower 2-plane tables
    with a strictly worse false-candidate rate."""
    plan = signlsh_plan(0.45, target_recall=0.9999, max_bits=48, probe_bits=1)
    assert (plan.bands, plan.rows) == (12, 4)  # (tables, planes)
    assert plan.recall_at_threshold >= 0.9999
    flat = signlsh_plan(0.45, target_recall=0.9999, max_bits=48, probe_bits=0)
    assert flat.rows < plan.rows and flat.fp_rate > plan.fp_rate


def test_signlsh_recall_monotone_in_probing_and_tables():
    base = signlsh_recall(0.4, n_tables=8, n_planes=4, probe_bits=0)
    probed = signlsh_recall(0.4, n_tables=8, n_planes=4, probe_bits=1)
    more_tables = signlsh_recall(0.4, n_tables=16, n_planes=4, probe_bits=0)
    assert base < probed <= 1.0
    assert base < more_tables <= 1.0


def _planted_corpus(spark, n_base: int, seed_words: int = 30):
    """n_base originals + one mutated near-copy each (J well above
    0.5) + unrelated filler; deterministic arithmetic, no RNG."""
    rows = []
    for i in range(n_base):
        words = [f"w{(i * 7 + j) % seed_words}x{i}" for j in range(20)]
        rows.append((2 * i, " ".join(words)))
        mutated = list(words)
        mutated[3] = f"mut{i}"  # one token swap: 3-gram J ~ 0.7
        rows.append((2 * i + 1, " ".join(mutated)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("n_base", [25, 100])
def test_planner_banding_recall_floor_on_planted_corpus(spark, n_base):
    """The planner's default banding must find >= its target fraction
    of true J>=0.5 pairs on planted near-dup corpora — at two corpus
    scales, since recall is per-pair but bucket collisions shift with
    corpus size."""
    docs = _planted_corpus(spark, n_base)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert len(exact) >= n_base  # the plants are really there
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_verified_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.99, f"planner banding recall {recall} at n_base={n_base}"
    # verified pipeline can't hallucinate: every emitted pair is exact
    assert got <= exact


def test_candidate_pairs_bound_matches_ground_truth(spark):
    docs = _planted_corpus(spark, 20)
    sh = D.hashed_shingles(docs, "doc_id", "text", 3).withColumnRenamed("sh64", "shingle")
    hist = shingle_df_histogram(sh)
    assert sum(n for _, n in hist) == sh.select("shingle").distinct().count()
    # the bound with no cap == the actual inverted-index join size
    truth = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(F.sum(F.expr("df * (df - 1) / 2")).alias("s"))
        .collect()[0]["s"]
    )
    max_df = max(df for df, _ in hist)
    assert candidate_pairs_bound(hist, max_df) == int(truth)


def test_plan_max_df_respects_budget_and_is_maximal():
    hist = [(1, 1000), (2, 100), (5, 10), (50, 2), (1000, 1)]
    # full cost: 100*1 + 10*10 + 2*1225 + 499500 = 502150
    cap, bound = plan_max_df(hist, pair_budget=10_000)
    assert cap == 50 and bound == 100 + 100 + 2450
    cap_all, bound_all = plan_max_df(hist, pair_budget=1_000_000)
    assert cap_all == 1000 and bound_all == 502150
    # a starvation budget still returns the df=2 evidence floor
    cap_min, bound_min = plan_max_df(hist, pair_budget=1)
    assert cap_min == 2 and bound_min == 100
    with pytest.raises(ValueError):
        plan_max_df(hist, 0)


def test_plan_max_df_confirms_shipped_jaccard_cap(spark, sf_dir):
    """DEFAULT_MAX_DF=1000 (d03/d12/d16's Sigma df^2 valve) must be
    consistent with the planner on the real fixture: the planner's
    choice at a 10M-candidate budget is at least the fixture's hottest
    shingle (cap not binding, as d03's docstring claims)."""
    from kaylee_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = D.hashed_shingles(docs, "doc_id", "text", 3).withColumnRenamed("sh64", "shingle")
    hist = shingle_df_histogram(sh)
    cap, bound = plan_max_df(hist, pair_budget=10_000_000)
    hottest = max(df for df, _ in hist)
    assert cap >= hottest, f"planner cap {cap} would bind below df={hottest}"
    assert bound <= 10_000_000


def test_plans_are_frozen_dataclasses():
    plan = minhash_plan(0.5)
    assert isinstance(plan, BandingPlan)
    with pytest.raises(Exception):
        plan.bands = 1


def test_hamming_plan_cost_model_matches_measured_candidates(spark):
    """The planner's expected-candidate model must track MEASURED
    bucket collisions on uniform signatures — the evidence that the
    blocking choice is real cost-based planning, not a formula nobody
    checked. 50k deterministic pseudo-uniform 62-bit signatures:
    classic 4-block keying (15 keyed bits) must produce ~1e5 collision
    pairs, the deep 6-block/20-table design (30 keyed bits) a few
    dozen — a >1000x measured reduction, each within a small factor of
    its model prediction."""
    import itertools

    from pyspark.sql import functions as F

    from kaylee_spark.operators.lsh_planner import HammingPlan, hamming_plan

    n, bits, radius = 50_000, 62, 3
    sigs = spark.range(n).select(
        # xxhash64 of the id, masked to 62 bits: uniform, deterministic
        F.shiftrightunsigned(F.xxhash64("id"), 2).alias("sig")
    )

    def measured_collisions(plan: HammingPlan) -> int:
        width = bits // plan.blocks
        subsets = list(itertools.combinations(range(plan.blocks), radius))
        masks = []
        for s in subsets:
            m = 0
            for j in range(plan.blocks):
                if j not in s:
                    m |= ((1 << width) - 1) << (j * width)
            masks.append(m - (1 << 64) if m >= (1 << 63) else m)
        banded = sigs.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            F.col("sig").bitwiseAND(F.lit(masks[t])).alias("key"),
                        )
                        for t in range(len(subsets))
                    ]
                )
            ).alias("tb")
        ).select("tb.table", "tb.key")
        occ = banded.groupBy("table", "key").agg(F.count(F.lit(1)).alias("c")).filter("c > 1")
        row = occ.select(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs")).first()
        return int(row["pairs"] or 0)

    classic = hamming_plan(radius, bits, n_docs=5_000)      # blocks = 4
    deep = hamming_plan(radius, bits, n_docs=10**9)         # deeper
    assert classic.blocks == 4 and deep.blocks > 4

    # re-predict at THIS n (the plans above carry their own n_docs)
    def predict(plan: HammingPlan) -> float:
        keyed = (bits // plan.blocks) * (plan.blocks - radius)
        return plan.tables * (n * (n - 1) / 2) / 2**keyed

    m_classic, m_deep = measured_collisions(classic), measured_collisions(deep)
    assert m_classic > 1000 * max(m_deep, 1)          # the reduction is real
    assert 0.5 * predict(classic) <= m_classic <= 2.0 * predict(classic)
    # the deep design's expectation is ~23 pairs; Poisson noise is
    # material at that count, so bound loosely but meaningfully
    assert m_deep <= 8 * predict(deep)
