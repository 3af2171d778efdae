"""Test configuration: CPU backend with 8 virtual devices.

Per SURVEY.md §4.2: tests run on the CPU backend (fast, deterministic,
float64 available for oracles) with 8 virtual devices so every `shard_map`
/ mesh code path is exercised exactly as it would be on a v5e-8 slice.
Benchmarks (bench.py) run on the real TPU chip instead.

NOTE: this harness's sitecustomize imports jax and registers the `axon`
TPU-tunnel backend before conftest runs, and pre-sets JAX_PLATFORMS=axon —
plain env vars here are too late.  `jax.config.update` still works because
no backend has been initialized yet at collection time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: XLA compiles dominate suite wall time (the
# problems themselves are tiny); repeat runs hit the disk cache instead.
jax.config.update("jax_compilation_cache_dir", "/tmp/rsba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
