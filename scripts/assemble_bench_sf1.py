#!/usr/bin/env python3
"""Assemble BENCH_sf1.json from graft.Bench detail files.

Usage: assemble_bench_sf1.py <x1.json> <x3.json> <x10.json> [x30.json] [extra.json]

One harness (noop sink), one ladder: every query measured at
x1/x3/x10 (and since r8, x30) of the sf0.1 corpus (K disjoint shards
via graft.tools.UpscaleCorpus), plus x10/x1 and x30/x10 ratios.
`extra.json`, if given, is merged verbatim into the top level
(oracle-stress and streaming records).

Dev tool only — NOT part of the shipped library.
"""
import sys, json


def main():
    x1 = json.load(open(sys.argv[1]))
    x3 = json.load(open(sys.argv[2]))
    x10 = json.load(open(sys.argv[3]))
    x30 = None
    extra = {}
    rest = sys.argv[4:]
    if rest and "queries" in json.load(open(rest[0])):
        x30 = json.load(open(rest[0]))
        rest = rest[1:]
    if rest:
        extra = json.load(open(rest[0]))

    def ratio(name):
        a, b = x1["queries"].get(name, -1), x10["queries"].get(name, -1)
        if a <= 0 or b <= 0:
            return None
        # sub-second x1 times are dominated by fixed per-query overhead
        # (job scheduling, codegen cache hits); flag but still report
        return round(b / a, 2)

    def ratio30(name):
        # x30/x10 — 3x the data; a flattening family shows <3, a
        # bending one >3
        if x30 is None:
            return None
        a, b = x10["queries"].get(name, -1), x30["queries"].get(name, -1)
        if a <= 0 or b <= 0:
            return None
        return round(b / a, 2)

    names = sorted(x1["queries"])
    out = {
        "method": (
            "ONE harness for the whole ladder (x1/x3/x10, and since r8 an "
            "x30 leg): graft.Bench noop sink (full "
            "evaluation of every output column), min-of-3 reps, query order "
            "rotated per rep, cache cleared per run, local[32], untimed "
            "sf0.001 warmup. Corpus: K disjoint shards via "
            "graft.tools.UpscaleCorpus (per-replica letter rotation -> "
            "disjoint shingles; cyclic dim shift -> norms/cosines preserved; "
            "key shift by r*1e9 -> FK fan-out and per-user event streams "
            "preserved; events ts passes through as timestamp[us], the same "
            "Tables.eventsTs branch as the gate corpus), so true result "
            "cardinalities scale linearly by construction and any "
            "super-linear runtime is the plan's fault."),
        "excluded_by_design": (
            "d05_embedding_dups, s01_cosine_topk: documented all-pairs "
            "truth twins (quadratic oracle baselines); the scale paths are "
            "d07/s02/s03/s04. s06_ann_recall embeds s01's exact side by "
            "definition (it grades the index against ground truth) and is "
            "excluded with it. s12_hard_negatives is s01's plan with the "
            "class anti-predicate — the same documented quadratic mining "
            "twin (index-fed mining is the scale path) — and is excluded "
            "with them."),
        "queries_min_sec": {
            "sf0.1_x1": x1["queries"],
            "sf0.3_x3": x3["queries"],
            "sf1_x10": x10["queries"],
        },
        "totals_sec": {
            "sf0.1_x1": x1["value"],
            "sf0.3_x3": x3["value"],
            "sf1_x10": x10["value"],
        },
        "failed": {
            "sf0.1_x1": x1.get("failed", []),
            "sf0.3_x3": x3.get("failed", []),
            "sf1_x10": x10.get("failed", []),
        },
        "ratios_x10_vs_x1": {n: ratio(n) for n in names},
        **({} if x30 is None else {
            "queries_min_sec_sf3_x30": x30["queries"],
            "totals_sec_sf3_x30": x30["value"],
            "failed_sf3_x30": x30.get("failed", []),
            "ratios_x30_vs_x10": {n: ratio30(n) for n in names},
        }),
        "history": (
            "Pre-r7 sections (count-harness dedup ladder, the d07 banding "
            "quadratic found-and-fixed via autoBits, d09's "
            "occupancy-constant nlist) are retired to git history at "
            "commit ec0e4b2; their findings stand, their numbers were "
            "re-measured here under the noop harness."),
    }
    out.update(extra)
    json.dump(out, open("BENCH_sf1.json", "w"), indent=1)
    over = {n: r for n, r in out["ratios_x10_vs_x1"].items()
            if r is not None and r > 11.0
            and x1["queries"].get(n, 0) > 0.3}
    tot30 = "" if x30 is None else f" x30={x30['value']}s"
    print("wrote BENCH_sf1.json;",
          f"{len(names)} queries, totals x1={x1['value']}s "
          f"x10={x10['value']}s{tot30}")
    if over:
        print("SUPER-LINEAR (>11x, x1>0.3s):", over)
    if x30 is not None:
        over30 = {n: r for n, r in out["ratios_x30_vs_x10"].items()
                  if r is not None and r > 3.3
                  and x10["queries"].get(n, 0) > 0.3}
        if over30:
            print("SUPER-LINEAR x30/x10 (>3.3x, x10>0.3s):", over30)


if __name__ == "__main__":
    main()
