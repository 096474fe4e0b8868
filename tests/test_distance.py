"""Mash/AAF math against hand-computed values (reference src/MST.cpp:514-540)."""

import math

import numpy as np

from rabbittclust_tpu.distance.mash import (
    aaf_distance,
    mash_distance,
    min_common_for_pair,
    min_jaccard_for_threshold,
    size_ratio_limit,
)


def test_mash_distance_basic():
    # j = 50/(100+100-50) = 1/3; D = -(1/21) ln(2/3 / (4/3)) = ln2/21
    d = mash_distance(np.array([50]), np.array([100]), np.array([100]), 21)
    assert abs(d[0] - math.log(2) / 21) < 1e-15


def test_mash_distance_edges():
    d = mash_distance(np.array([100, 0]), np.array([100, 100]),
                      np.array([100, 100]), 21)
    assert d[0] == 0.0 and d[1] == 1.0
    # empty sketches -> denom 0 -> jaccard 0 -> dist 1
    d = mash_distance(np.array([0]), np.array([0]), np.array([0]), 21)
    assert d[0] == 1.0


def test_aaf_distance():
    # c = 30/ min(60, 100) = 0.5; D = -(1/20) ln 0.5
    d = aaf_distance(np.array([30]), np.array([60]), np.array([100]), 20)
    assert abs(d[0] - (-1 / 20) * math.log(0.5)) < 1e-15
    d = aaf_distance(np.array([60, 0]), np.array([60, 5]), np.array([80, 9]), 20)
    assert d[0] == 0.0 and d[1] == 1.0


def test_size_ratio_limit():
    # R = int(2 e^{dk} - 1); reference truncates to int (MST.cpp:224)
    assert size_ratio_limit(0.05, 19) == int(2 * math.exp(0.05 * 19) - 1)
    assert size_ratio_limit(0.0, 19) == 1


def test_greedy_bounds():
    jm = min_jaccard_for_threshold(0.05, 21)
    x = math.exp(-0.05 * 21)
    assert abs(jm - x / (2 - x)) < 1e-15
    assert min_common_for_pair(jm, 1000, 900) == math.ceil(jm * 1900 / (1 + jm))
