"""Test harness: run everything on a virtual 8-device CPU mesh so that
multi-chip sharding tests work without TPU hardware (SURVEY.md §4d).

Note: this environment pins JAX_PLATFORMS=axon (TPU); popping the env var and
updating jax config before first backend use is the reliable override.
"""

import os
import sys

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# single-core hosts serialize the virtual devices' compute; the default
# 20 s/40 s CPU-collective rendezvous timeouts can abort multi-device steps
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip most CPU compiles
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
