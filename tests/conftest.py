"""Test configuration: force an 8-device CPU mesh before JAX loads.

Real-TPU behaviour is validated by bench.py / __graft_entry__.py on
hardware; unit tests run on the CPU backend so they are hermetic and can
exercise multi-chip sharding on a virtual mesh.
"""

import os

# Force the CPU backend: the sandbox exports JAX_PLATFORMS=axon and a
# sitecustomize that registers the axon TPU backend whenever
# PALLAS_AXON_POOL_IPS is set, so a plain setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# Rewrite any pre-existing device-count flag rather than asserting on it
# later: the suite is built around an 8-device mesh.
import re

flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+", "", flags
).strip()
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax

# sitecustomize may have imported jax already (axon register()), in
# which case the env var above came too late; the config update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    if jax.default_backend() != "cpu" or len(jax.devices()) != 8:
        pytest.exit(
            "test suite needs the 8-device CPU backend but got "
            f"{jax.default_backend()} x{len(jax.devices())}; a process "
            "that imported jax before conftest.py pinned XLA_FLAGS is "
            "the usual cause",
            returncode=3,
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_seq(rng, n: int, n_frac: float = 0.0) -> str:
    bases = np.array(list("ACGT"))
    s = bases[rng.integers(0, 4, size=n)]
    if n_frac > 0:
        mask = rng.random(n) < n_frac
        s[mask] = "N"
    return "".join(s)


def mutate(rng, seq: str, sub=0.1, ins=0.05, dele=0.05) -> str:
    """Derive a homologous sequence (for realistic alignment paths)."""
    out = []
    bases = "ACGT"
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(bases[rng.integers(0, 4)])
        else:
            out.append(ch)
        if rng.random() < ins:
            out.append(bases[rng.integers(0, 4)])
    if not out:
        out.append("A")
    return "".join(out)
