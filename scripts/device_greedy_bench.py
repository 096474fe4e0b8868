#!/usr/bin/env python
"""One-shot device-greedy vs native-host timing on the live TPU.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/device_greedy_bench.py --n 16384

Same synthetic generator as scale_bench.py.  Prints one JSON line:
{"n", "t_host_s", "t_device_s", "t_device_warm_s", "pulled_bytes",
 "pulls", "partitions_equal"}.  Needs the axon TPU grant (run nothing
 else device-side concurrently).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_bench import make_sketches  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--threshold", type=float, default=0.05)
    ap.add_argument("--k", type=int, default=21)
    args = ap.parse_args()

    hashes = make_sketches(args.n)

    from rabbittclust_tpu.cluster.greedy import greedy_cluster
    t0 = time.perf_counter()
    host = greedy_cluster(hashes, args.threshold, args.k, backend="native")
    t_host = time.perf_counter() - t0

    from rabbittclust_tpu.ops import bitmap
    from rabbittclust_tpu.ops.greedy_device import greedy_cluster_device
    bitmap.reset_pull_stats()
    t0 = time.perf_counter()
    dev = greedy_cluster_device(hashes, args.threshold, args.k)
    t_dev = time.perf_counter() - t0
    stats = dict(bitmap.PULL_STATS)
    # warm rerun (compiles cached)
    t0 = time.perf_counter()
    dev2 = greedy_cluster_device(hashes, args.threshold, args.k)
    t_warm = time.perf_counter() - t0

    equal = (host.clusters == dev.clusters
             and host.representatives == dev.representatives
             and dev2.clusters == dev.clusters)
    print(json.dumps({
        "n": args.n, "t_host_s": round(t_host, 2),
        "t_device_s": round(t_dev, 2), "t_device_warm_s": round(t_warm, 2),
        "pulled_bytes": stats.get("bytes", 0), "pulls": stats.get("pulls", 0),
        "partitions_equal": bool(equal)}), flush=True)


if __name__ == "__main__":
    main()
