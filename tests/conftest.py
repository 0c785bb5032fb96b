"""Test configuration: force the CPU backend with 8 virtual devices so mesh /
sharding tests run without TPU hardware, matching the driver's
dryrun_multichip validation environment.

The axon sitecustomize hook sets ``jax_platforms="axon,cpu"`` at interpreter
start, which overrides the JAX_PLATFORMS env var — so we override the config
value itself (the backend initializes lazily, well after conftest import)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip recompilation. Keyed by
# a CPU-feature fingerprint — XLA:CPU AOT artifacts compiled on a host with
# different vector extensions replay with shifted numerics (or SIGILL) when
# the underlying machine changes, which broke golden-parity tolerances once.
def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as fh:
            flags = next((ln for ln in fh if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_test_cache_{_cpu_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
