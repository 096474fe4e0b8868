"""Inverted index module (dict + CSR forms, folder roundtrip)."""

import numpy as np
import pytest

from rabbittclust_tpu.index import CsrIndex, InvertedIndex


@pytest.fixture()
def hashes():
    rng = np.random.default_rng(0)
    return [np.unique(rng.integers(0, 500, size=60).astype(np.uint32))
            for _ in range(12)]


def brute_counts(hashes, q, n):
    out = np.zeros(n, dtype=np.int64)
    for g, h in enumerate(hashes):
        out[g] = len(np.intersect1d(q, h))
    return out


def test_dict_index_probe(hashes):
    idx = InvertedIndex.build(hashes)
    counts = idx.probe(hashes[3])
    expect = brute_counts(hashes, hashes[3], len(hashes))
    for g in range(len(hashes)):
        assert counts.get(g, 0) == expect[g]


def test_csr_index_probe(hashes):
    idx = CsrIndex.build(hashes)
    for q in (hashes[0], hashes[7]):
        got = idx.probe_counts(q, len(hashes))
        assert np.array_equal(got, brute_counts(hashes, q, len(hashes)))
    # posting membership
    for g, h in enumerate(hashes):
        for hv in h.tolist()[:5]:
            assert g in idx.posting(hv)


def test_csr_folder_roundtrip(tmp_path, hashes):
    idx = CsrIndex.build(hashes)
    idx.save(str(tmp_path), use64=False)
    idx2 = CsrIndex.from_folder(str(tmp_path), use64=False)
    assert np.array_equal(idx.uniq, idx2.uniq)
    assert np.array_equal(idx.offsets, idx2.offsets)
    assert np.array_equal(idx.gids, idx2.gids)
