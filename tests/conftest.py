import os

# Multi-device tests run on a virtual CPU mesh; must be set before jax init.
# The environment's axon sitecustomize registers the TPU platform at
# interpreter start, so JAX_PLATFORMS env alone is not enough — override the
# config explicitly.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import random

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    random.seed(1234)
    np.random.seed(1234)


@pytest.fixture(scope="session")
def synthetic_genomes(tmp_path_factory):
    """4 clusters x 5 mutated copies of a 30 kb seed (simulate-longSequence
    semantics, reference benchmark/simulate)."""
    from tests.helpers import make_clustered_genomes
    tmp = tmp_path_factory.mktemp("genomes")
    return make_clustered_genomes(tmp, n_clusters=4, per_cluster=5,
                                  length=30000, mutation=0.01, seed=7)
