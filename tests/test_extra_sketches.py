"""WMinHash / HyperLogLog / OrderMinHash sketch types."""

import random

import numpy as np
import pytest

from rabbittclust_tpu.sketch.extra import (
    HllSketch,
    hll_cardinality,
    hll_distance,
    hll_sketch,
    omh_distance,
    omh_sketch,
    wminhash_distance,
    wminhash_sketch,
)
from tests.helpers import mutate, rand_seq


@pytest.fixture()
def seq_pairs():
    rng = random.Random(11)
    a = rand_seq(rng, 20000).encode()
    near = mutate(rng, a.decode(), 0.01).encode()
    far = rand_seq(rng, 20000).encode()
    return a, near, far


def test_wminhash(seq_pairs):
    a, near, far = seq_pairs
    sa = wminhash_sketch(a)
    sn = wminhash_sketch(near)
    sf = wminhash_sketch(far)
    assert wminhash_distance(sa, sa) == 0.0
    assert wminhash_distance(sa, sn) < wminhash_distance(sa, sf)
    assert wminhash_distance(sa, sf) > 0.9


def test_hll_cardinality(seq_pairs):
    a, _, _ = seq_pairs
    s = hll_sketch(a, k=21)
    est = hll_cardinality(s)
    # ~20k distinct canonical 21-mers; HLL(1024 regs) has ~3% error
    assert 0.85 * 19980 < est < 1.15 * 19980


def test_hll_distance(seq_pairs):
    a, near, far = seq_pairs
    sa, sn, sf = (hll_sketch(x) for x in (a, near, far))
    assert hll_distance(sa, sa) == 0.0
    d_near = hll_distance(sa, sn)
    d_far = hll_distance(sa, sf)
    assert d_near < 0.05 < d_far


def test_omh(seq_pairs):
    a, near, far = seq_pairs
    sa = omh_sketch(a)
    sn = omh_sketch(near)
    sf = omh_sketch(far)
    assert omh_distance(sa, sa) == 0.0
    assert omh_distance(sa, sn) < omh_distance(sa, sf)
    assert omh_distance(sa, sf) == 1.0


def test_omh_order_sensitivity():
    """OMH distinguishes permuted sequences with identical k-mer content."""
    rng = random.Random(5)
    blocks = [rand_seq(rng, 2000) for _ in range(10)]
    s1 = "".join(blocks).encode()
    s2 = "".join(reversed(blocks)).encode()
    d_same = omh_distance(omh_sketch(s1), omh_sketch(s1))
    d_perm = omh_distance(omh_sketch(s1), omh_sketch(s2))
    assert d_same == 0.0
    assert d_perm > 0.0
