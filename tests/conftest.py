"""Test harness: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per the SURVEY §4 test strategy.
This must run before any JAX backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from sunet_tf_tpu.config import Config, tiny_config  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> Config:
    cfg = tiny_config()
    return cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32"))


@pytest.fixture(scope="session")
def tiny_model(tiny_cfg):
    from sunet_tf_tpu.models.sunet import build_model

    return build_model(tiny_cfg, seed=0)
