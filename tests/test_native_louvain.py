"""Native Louvain/Leiden hot loops == the pure-NumPy oracle, bit-identically.

The native rtc_louvain_one_level / rtc_leiden_refine_moves replicate
cluster/leiden.py's _one_level_py / _refine python move loop: same node
order, same first-occurrence link order, same float64 expression trees.
Membership must match EXACTLY (not just NMI) on every graph, including
tie-heavy integer-weight graphs."""

import numpy as np
import pytest

from rabbittclust_tpu.cluster import leiden as L
from rabbittclust_tpu.utils import native as native_mod


pytestmark = pytest.mark.skipif(native_mod.load_native() is None,
                                reason="native library unavailable")


def _random_graph(rng, n, p, weights="uniform"):
    iu, ju = np.triu_indices(n, k=1)
    keep = rng.random(len(iu)) < p
    frm, to = iu[keep].astype(np.int64), ju[keep].astype(np.int64)
    if weights == "uniform":
        w = rng.random(len(frm))
    elif weights == "ties":  # tiny integer weights: heavy tie pressure
        w = rng.integers(1, 4, size=len(frm)).astype(np.float64)
    else:  # planted: two blocks with strong intra-weight
        blk = (frm < n // 2) == (to < n // 2)
        w = np.where(blk, 0.9 + 0.1 * rng.random(len(frm)),
                     0.05 * rng.random(len(frm)))
    return frm, to, w.astype(np.float64)


@pytest.mark.parametrize("algo", ["louvain", "leiden", "edge_parallel"])
def test_native_matches_numpy(algo, monkeypatch):
    rng = np.random.default_rng(17)
    fn = {"louvain": L.louvain, "leiden": L.leiden,
          "edge_parallel": L.louvain_edge_parallel}[algo]
    for trial in range(8):
        n = int(rng.integers(30, 260))
        p = float(rng.uniform(0.02, 0.3))
        weights = ["uniform", "ties", "planted"][trial % 3]
        g = _random_graph(rng, n, p, weights)
        res = float(rng.choice([0.7, 1.0, 1.6]))
        monkeypatch.delenv("RTC_LOUVAIN", raising=False)
        m_nat = fn(n, g, res)
        monkeypatch.setenv("RTC_LOUVAIN", "numpy")
        m_py = fn(n, g, res)
        assert np.array_equal(m_nat, m_py), (
            f"{algo} mismatch: trial={trial} n={n} p={p:.3f} "
            f"weights={weights} res={res}")


def test_one_level_with_init(monkeypatch):
    """The init-seeded path (Leiden levels) must also match, including the
    comm_tot sizing quirk (max(n, init.max()+1))."""
    rng = np.random.default_rng(3)
    n = 120
    g = _random_graph(rng, n, 0.1, "ties")
    frm, to, w = g
    deg_w = np.zeros(n)
    np.add.at(deg_w, frm, w)
    np.add.at(deg_w, to, w)
    two_m = deg_w.sum()
    src = np.concatenate([frm, to])
    dst = np.concatenate([to, frm])
    ww2 = np.concatenate([w, w])
    order = np.argsort(src, kind="stable")
    src, dst, ww2 = src[order], dst[order], ww2[order]
    adj_idx = np.zeros(n + 1, dtype=np.int64)
    np.add.at(adj_idx, src + 1, 1)
    adj_idx = np.cumsum(adj_idx)
    init = rng.integers(0, 10, size=n).astype(np.int64)
    init[0] = 150  # force comm_tot_len > n
    monkeypatch.delenv("RTC_LOUVAIN", raising=False)
    c_nat, i_nat = L._one_level(n, adj_idx, dst, ww2, deg_w, two_m, 1.0,
                                init=init)
    c_py, i_py = L._one_level_py(n, adj_idx, dst, ww2, deg_w, two_m, 1.0,
                                 init=init)
    assert i_nat == i_py
    assert np.array_equal(c_nat, c_py)
