"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Single-CPU host: torch OMP threads and XLA's thread pool fight over one
# core and stall compilation by minutes if both spin up.
os.environ.setdefault("OMP_NUM_THREADS", "1")
# Hard-set (the ambient environment may pin JAX_PLATFORMS to the TPU):
# tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env is set)

# jax may already be imported (the machine's sitecustomize registers a TPU
# PJRT plugin and jax snapshots JAX_PLATFORMS at import), so override via
# config, which works any time before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# XLA:CPU's default matmul path may use reduced precision (bf16 dot); tests
# compare against fp32 torch, so force full precision under pytest.
jax.config.update("jax_default_matmul_precision", "highest")
# 1-CPU host: persistent compile cache makes repeated test runs bearable.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
