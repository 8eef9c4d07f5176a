"""Timed ~sf1 bench tier: stage a persistent x10 synthetic fixture
(sf0.1 multiplied the scale_probe way, PLUS embeddings so the
similarity family scales too) and run the standard bench.py driver-50
loop against it, recording BENCH_SF1.json at the repo root.

Why this exists: the per-round bench runs at sf0.1, where several
expensive queries are stage-overhead-dominated (g01's fixed-point
loop, d15's in-query k-means) — the cost RANKING that drives
optimization flips at scale, and correctness-only probes
(scale_probe.py) time nothing. This tier is the timed evidence.

Linearity report: each query's sf1 time is compared against
``multiplier x`` its sf0.1 time from the newest BENCH_r*.json (or a
--baseline file). A query above ``--over-linear-factor`` (default 2)
times the linear expectation is flagged — flags land in the JSON under
"over_linear" and must be explained in BASELINE.md or fixed.

Caveats baked into the fixture (documented so the ratios are read
right): dimension tables (nation/region/part/supplier) stay at sf0.1
size — fact-side scans and joins grow x10, broadcast dims do not
(exactly the 100 TB shape); id-offset columns follow scale_probe so
window sorts stay total.

Usage: python tools/bench_sf1.py [--rebuild] [--passes N]
       [--multiplier N] [--baseline BENCH_rXX.json]
(fixture persists at /tmp/kaylee_sf1; ~25 min for 3 passes)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import ID_OFFSET, MULTIPLIED, build  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = "/tmp/kaylee_sf1"

#: scale_probe's fact tables + embeddings (vec_id offset keeps ids
#: unique so ANN bucket occupancy grows for real instead of stacking
#: 10 identical vectors in every bucket). Unlike scale_probe, customer
#: ALSO gets a key offset: the probe deliberately keeps duplicate
#: custkeys (w07's rank-tie stress depends on the fan-out), but for a
#: TIMED tier a PK-violating dimension makes every orders⋈customer
#: join x10 super-linear by construction (measured round 9: q26 32x,
#: q03 13.6x — fixture artifact, not plan). Offset copies never join
#: (orders reference the original keys), so the join stays PK-clean
#: and fact-side ratios mean what they look like.
BENCH_MULTIPLIED = tuple(MULTIPLIED) + ("embeddings",)
BENCH_ID_OFFSET = dict(
    ID_OFFSET,
    embeddings=("vec_id", 1_000_000),
    customer=("c_custkey", 10_000_000),
)


def newest_baseline() -> str | None:
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    return benches[-1] if benches else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true", help="rebuild the fixture")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--multiplier", type=int, default=10)
    ap.add_argument("--base-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--baseline", default=None, help="sf0.1 bench JSON to compare against")
    ap.add_argument("--over-linear-factor", type=float, default=2.0)
    args = ap.parse_args()

    marker = os.path.join(FIXTURE, f".built_x{args.multiplier}")
    if args.rebuild or not os.path.exists(marker):
        build(
            args.base_sf,
            FIXTURE,
            args.multiplier,
            multiplied=BENCH_MULTIPLIED,
            id_offset=BENCH_ID_OFFSET,
        )
        open(marker, "w").write("ok")
    else:
        print(f"fixture {FIXTURE} already built (use --rebuild to refresh)")

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=FIXTURE,
        SPARK_GRAFT_BENCH_PASSES=str(args.passes),
        # keep the committed sf0.1 detail file intact: this tier's
        # per-query detail belongs next to BENCH_SF1.json instead
        SPARK_GRAFT_BENCH_DETAIL=os.path.join(REPO, "BENCH_SF1_LOCAL.json"),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        raise SystemExit(f"bench.py failed rc={proc.returncode}")
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    result["sf"] = 1.0
    result["fixture"] = FIXTURE
    result["multiplier"] = args.multiplier
    out = os.path.join(REPO, "BENCH_SF1.json")
    # persist IMMEDIATELY — a bug in the comparison below must never
    # cost the 20-minute timed run (it did once)
    with open(out, "w") as f:
        f.write(json.dumps(result) + "\n")

    baseline_path = args.baseline or newest_baseline()
    if baseline_path and os.path.exists(baseline_path):
        data = json.loads(open(baseline_path).read())
        # driver-recorded BENCH_r*.json wraps the bench line in "parsed"
        base = (data.get("parsed") or data).get("queries", {})
        ratios, over = {}, {}
        for name, t1 in sorted(result["queries"].items()):
            t0 = base.get(name)
            if not t0:
                continue
            ratio = round(t1 / t0, 2)
            ratios[name] = ratio
            if ratio > args.multiplier * args.over_linear_factor:
                over[name] = ratio
        result["baseline"] = os.path.basename(baseline_path)
        result["vs_baseline_ratio"] = ratios
        result["over_linear"] = over
        print(f"\n{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
        for name, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
            flag = "  <-- OVER-LINEAR" if name in over else ""
            print(
                f"{name:34s} {base[name]:8.3f} {result['queries'][name]:8.3f} "
                f"{r:7.2f}{flag}"
            )

    with open(out, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(f"\nwrote {out}: total {result['value']}s over {len(result['queries'])} queries")
    if result.get("errors"):
        print(f"ERRORS: {result['errors']}")


if __name__ == "__main__":
    main()
