"""On-hardware TPU smoke tier (env-gated: RTC_TPU_TESTS=1).

The regular suite forces the CPU backend (conftest.py), so real-TPU
correctness was previously evidenced only through bench digests.  These
tests run a child process WITHOUT the CPU override so it grabs the real
backend (only one process may hold the axon TPU — everything happens in
the single child), and assert:

  * Pallas pair-count kernel == jnp path on the real backend
  * bitmap filter bound safety (no false negatives) on-device
  * a tiny end-to-end threshold clustering equals the host engine
  * the device KSSD sketcher is bit-identical on the real backend

Skipped by default: the tunnel TPU takes ~4 min per fresh compile and
only one process may hold it; enable explicitly with RTC_TPU_TESTS=1.
"""

import json
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import json
import numpy as np

import jax
import jax.numpy as jnp

out = {"backend": jax.default_backend(),
       "device_kind": jax.devices()[0].device_kind}

rng = np.random.default_rng(0)

# --- Pallas kernel == jnp on the real backend -------------------------
# (Mosaic requires the trailing block dim divisible by 128: use the
# production tile shapes, not toy ones)
from rabbittclust_tpu.ops.pack import pack_sketches
from rabbittclust_tpu.ops.intersect import pair_counts_row
hashes = [np.unique(rng.integers(0, 2 ** 28, size=rng.integers(40, 100))
                    .astype(np.uint32)) for _ in range(128)]
packed = pack_sketches(hashes, use64=False, pad_n_to=128)
block = packed.row_block(0, 8)
c_jnp = np.asarray(pair_counts_row(block, packed, gj_tile=128,
                                   backend="jnp"))
if jax.default_backend() == "tpu":
    c_pl = np.asarray(pair_counts_row(block, packed, gj_tile=128,
                                      backend="pallas"))
    assert np.array_equal(c_jnp, c_pl), "pallas != jnp on real backend"
    out["pallas_equals_jnp"] = True

# --- bitmap filter bound safety on-device ------------------------------
from rabbittclust_tpu.ops.bitmap import candidate_pairs_threshold
from rabbittclust_tpu.distance.mash import mash_distance, size_ratio_limit
base = np.unique(rng.integers(0, 2 ** 28, size=300).astype(np.uint32))
h2 = []
for i in range(64):
    keep = base[rng.random(len(base)) < 0.8]
    extra = np.unique(rng.integers(0, 2 ** 28,
                                   size=320 - len(keep)).astype(np.uint32))
    h2.append(np.unique(np.concatenate([keep, extra])))
ii, jj, common = candidate_pairs_threshold(h2, 0.05, 21, bits=2048,
                                           row_block=64)
got = set(zip(ii.tolist(), jj.tolist()))
sizes = np.array([len(h) for h in h2])
radio = size_ratio_limit(0.05, 20)
missing = 0
for a in range(64):
    for b in range(a):
        c = len(np.intersect1d(h2[a], h2[b], assume_unique=True))
        if c == 0 or max(sizes[a], sizes[b]) > radio * min(sizes[a],
                                                           sizes[b]):
            continue
        d = mash_distance(np.array([c]), np.array([sizes[a]]),
                          np.array([sizes[b]]), 21)[0]
        if d <= 0.05 and (a, b) not in got:
            missing += 1
assert missing == 0, f"filter dropped {missing} true pairs on-device"
out["filter_no_false_negatives"] = True

# --- tiny end-to-end device clustering == host -------------------------
from rabbittclust_tpu.ops.cluster_fast import threshold_clusters_device
from rabbittclust_tpu.cluster.mst import (
    compute_mst, cut_forest, clusters_from_forest)
cd = threshold_clusters_device(h2, 0.05, 21, bits=2048, row_block=64)
res = compute_mst(h2, 0.05, 21)
chost = clusters_from_forest(cut_forest(res.mst, 0.05), len(h2))
assert sorted(map(sorted, cd)) == sorted(map(sorted, chost))
out["e2e_clusters_match_host"] = True

# --- device KSSD sketcher bit-identical on real backend ----------------
import random
random.seed(5)
from rabbittclust_tpu.sketch.kssd import (
    KssdParams, get_shuffle_table, kssd_kmer_hashes_numpy)
from rabbittclust_tpu.ops.sketch_device import device_kmer_hashes
p = KssdParams.from_kmer_size(21, 3)
table = get_shuffle_table(p.half_subk)
seq = bytes(random.choice(b"ACGTN") for _ in range(20000))
a = np.unique(kssd_kmer_hashes_numpy(seq, p, table))
b = np.unique(device_kmer_hashes(seq, p, chunk=8192))
assert np.array_equal(a, b), "device sketcher != host on real backend"
out["device_sketch_bit_identical"] = True

print("SMOKE_RESULT " + json.dumps(out), flush=True)
"""


@pytest.mark.skipif(os.environ.get("RTC_TPU_TESTS") != "1",
                    reason="RTC_TPU_TESTS=1 required (real-TPU smoke)")
def test_tpu_smoke_suite():
    env = dict(os.environ)
    # let the child use the REAL platform (drop the CPU overrides)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", _CHILD],
                          capture_output=True, text=True, env=env,
                          cwd=repo,
                          timeout=float(os.environ.get(
                              "RTC_TPU_TEST_TIMEOUT", "3600")))
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("SMOKE_RESULT ")][-1]
    info = json.loads(line.split(" ", 1)[1])
    assert info.get("filter_no_false_negatives")
    assert info.get("e2e_clusters_match_host")
    assert info.get("device_sketch_bit_identical")
    if info["backend"] == "tpu":
        assert info.get("pallas_equals_jnp")
