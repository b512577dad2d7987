"""Test environment: force the CPU backend with an 8-device virtual mesh.

Must run before the first ``import jax`` anywhere: clearing
``PALLAS_AXON_POOL_IPS`` disables the axon TPU plugin registration in
sitecustomize, and the XLA flag splits the host into 8 virtual devices so
sharding tests exercise real multi-device partitioning (SURVEY §4:
multi-device tests via a simulated mesh are the addition the reference lacks).
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-selects its TPU platform via jax.config at
# interpreter startup, so the env var alone is not enough — override the
# config knob back to cpu before any backend is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from laplace_gnn_recommendation_tpu.parallel.mesh import build_mesh

    assert len(jax.devices()) == 8, jax.devices()
    return build_mesh(data_axis=2, model_axis=4)
