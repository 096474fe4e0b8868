#!/usr/bin/env python
"""Million-genome device clustering datapoint (the reference's flagship
scale: 1.13M GenBank genomes, reference README.md:258-262).

Runs the panel-streamed device labelprop engine (ops/labelprop.py) on N
synthetic clustered sketches end-to-end and checks the partition against
the PLANTED ground truth (member i belongs to cluster i % n_clusters; at
d=0.05 every intra-cluster pair is a direct neighbor and no cross pair
is, so the exact single-linkage partition provably equals the planted
one — this is what makes a million-genome correctness check affordable:
the exact host MST engine needs ~4 h for the same corpus on 2 cores).
For an honest same-machine comparison it also times the native C++ greedy
engine on the SAME sketches (a different algorithm — greedy star
clustering, the reference's own million-genome workhorse) and reports the
extrapolated native-MST time from the cached N=131072 baseline (quadratic
pair work: t_mst(N) ~ t_mst(131072) * (N/131072)^2 for this corpus).

Usage:  python scripts/million_bench.py [--n 1048576] [--skip-greedy]
Writes one JSON line; appends to .cache/million_bench.jsonl.
"""

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import rabbittclust_tpu  # noqa: F401,E402 — mallopt heap reuse
# must be active BEFORE the multi-GB corpus generation allocations

from bench import _load_baseline_cache, make_sketches, partition_digest


def planted_digest(n: int, n_clusters: int) -> str:
    clusters = [list(range(c, n, n_clusters)) for c in range(n_clusters)]
    return partition_digest(clusters)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--s", type=int, default=1000)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--skip-greedy", action="store_true")
    ap.add_argument("--panel-tiles", type=int, default=0)
    args = ap.parse_args()

    threshold, kmer_size = 0.05, 21
    t0 = time.perf_counter()
    hashes = make_sketches(n=args.n, s=args.s, n_clusters=args.clusters)
    t_gen = time.perf_counter() - t0
    print(f"-----generated {args.n} sketches in {t_gen:.1f} s",
          file=sys.stderr)

    from rabbittclust_tpu.ops import bitmap as bm
    from rabbittclust_tpu.ops.labelprop import (
        LP_STATS, threshold_clusters_device_lp)

    bm.reset_pull_stats()
    t0 = time.perf_counter()
    clusters = threshold_clusters_device_lp(
        hashes, threshold, kmer_size, panel_tiles=args.panel_tiles)
    t_device = time.perf_counter() - t0
    dig = partition_digest(clusters)
    truth = planted_digest(args.n, args.clusters)
    ok = dig == truth
    print(f"-----device labelprop: {t_device:.1f} s, "
          f"{len(clusters)} clusters, planted_match={ok}", file=sys.stderr)

    t_greedy = None
    if not args.skip_greedy:
        from rabbittclust_tpu.cluster.greedy import greedy_cluster
        t0 = time.perf_counter()
        g = greedy_cluster(hashes, threshold, kmer_size)
        t_greedy = time.perf_counter() - t0
        print(f"-----native greedy (2 cores): {t_greedy:.1f} s, "
              f"{len(g.clusters)} clusters", file=sys.stderr)

    # extrapolated exact-MST host time from the cached N=131072 baseline
    ent = _load_baseline_cache().get(
        f"n131072_s{args.s}_d{threshold}_k{kmer_size}_seed7")
    t_mst_extrap = (float(ent["t_min"]) * (args.n / 131072) ** 2
                    if ent else None)

    pairs = args.n * (args.n - 1) / 2
    out = {
        "metric": "million_scale_device_cluster",
        "n_genomes": args.n,
        "sketch_size": args.s,
        "t_device_s": round(t_device, 1),
        "pairs_per_s": round(pairs / t_device),
        "planted_match": ok,
        "clusters": len(clusters),
        "device_phases": {k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in LP_STATS.items()},
        "pack_stats": dict(bm.PACK_STATS),
        "device_pulled_bytes": bm.PULL_STATS["bytes"],
        "device_pulls": bm.PULL_STATS["pulls"],
        "bytes_per_round": (round(bm.PULL_STATS["bytes"] /
                                  max(LP_STATS["rounds"], 1))
                            if LP_STATS["rounds"] else None),
        "t_native_greedy_s": (round(t_greedy, 1)
                              if t_greedy is not None else None),
        "t_native_mst_extrapolated_s": (round(t_mst_extrap)
                                        if t_mst_extrap else None),
        "note": ("native greedy is a DIFFERENT algorithm (star clusters); "
                 "the exact-MST extrapolation assumes quadratic pair work "
                 "on this corpus"),
    }
    line = json.dumps(out)
    print(line)
    os.makedirs(".cache", exist_ok=True)
    with open(".cache/million_bench.jsonl", "a") as fp:
        fp.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
