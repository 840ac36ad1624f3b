#!/usr/bin/env python3
"""Build the `extra.json` side input for assemble_bench_sf1.py.

Carries forward the non-ladder records of the previous BENCH_sf1.json
(event-family and streaming x10 sections) and installs a fresh
oracle-stress record produced by this round's x10 gate re-run, plus
this recording's stability note.

Usage: build_ladder_extra.py <prev_BENCH_sf1.json> <stress_line> <out.json>
  <stress_line> is the one-line summary printed by check_oracle.py
  against the x10 corpus (e.g. "163 pass, 0 fail, 1 no-oracle, 0 error").

Dev tool only — NOT part of the shipped library.
"""
import sys, json

prev = json.load(open(sys.argv[1]))
stress = sys.argv[2]
out = {k: prev[k] for k in ("event_family_x10", "streaming_x10")
       if k in prev}
# NOTE: per-recording anomaly notes (stability, per-query flags) are
# NOT carried forward — each record documents only its own run.
out["oracle_stress_x10_r10"] = (
    "Full oracle gate re-run against the x10 disjoint-shard corpus "
    "at the r10 close (after the s17 persisted vector index — whose "
    "oracle is s08's SQL verbatim — the s18/s19 index-fed and "
    "store-fed MMR retrievers, and the Lloyd-trained coarse "
    "quantizer now replayed inside the s03/s08 oracles): "
    + stress + ". Excluded: none — every declared query ran; m04 "
    "remains the only no-oracle row by design.")
out["stability_note"] = (
    "The x3/x10/x30 legs and the final x1 leg ran back-to-back on a "
    "quiet host (no concurrent builds); an earlier x1 attempt that "
    "overlapped spec runs was discarded and re-recorded cleanly at "
    "the end of the session.")
json.dump(out, open(sys.argv[3], "w"), indent=1)
print("wrote", sys.argv[3])
