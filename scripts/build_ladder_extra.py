#!/usr/bin/env python3
"""Build the `extra.json` side input for assemble_bench_sf1.py.

Carries forward the non-ladder records of the previous BENCH_sf1.json
(event-family and streaming x10 sections) and installs a fresh
oracle-stress record produced by this round's x10 gate re-run.

Usage: build_ladder_extra.py <prev_BENCH_sf1.json> <stress_line> <out.json>
  <stress_line> is the one-line summary printed by check_oracle.py
  against the x10 corpus (e.g. "128 pass, 0 fail, 1 no-oracle, 0 error").

Dev tool only — NOT part of the shipped library.
"""
import sys, json

prev = json.load(open(sys.argv[1]))
stress = sys.argv[2]
out = {k: prev[k] for k in ("event_family_x10", "streaming_x10")
       if k in prev}
# NOTE: the r8-early "x10_leg_note" (host-contention re-run) described
# THAT recording and is deliberately not carried into a fresh ladder —
# each record documents only its own run's anomalies.
out["oracle_stress_x10_r8"] = (
    "Full oracle gate re-run against the x10 disjoint-shard corpus "
    "after the round-8 additions (x27/x28 quality gates, x29 audit, "
    "skew-safe x26, DSIR x31, line-dedup x32, ANN-recall s06): "
    + stress + ". Excluded: none — every declared query ran; m04 "
    "remains the only no-oracle row by design.")
json.dump(out, open(sys.argv[3], "w"), indent=1)
print("wrote", sys.argv[3])
