"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding logic is exercised on
host CPU devices instead (the TPU-world analogue of a fake distributed
backend — see SURVEY.md section 4).

NOTE: this environment imports jax at interpreter startup (sitecustomize ->
axon plugin), so JAX_PLATFORMS in os.environ is already consumed by the time
conftest runs; we must go through jax.config.update. XLA_FLAGS is read
lazily at backend creation, so setting it here still works as long as no
test touched a device yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU even though the shell pre-sets JAX_PLATFORMS=axon (the TPU
# plugin): tests must be hermetic and able to fake an 8-device mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: OFF by default for the test suite.
# XLA:CPU AOT executable (de)serialization is not reliable on every host:
# three full-suite runs segfaulted INSIDE jax's compilation_cache — twice in
# get_executable_and_time (deserialize) and once in put_executable_and_time
# (serialize), always around the largest CPU programs (full-scale TP
# shard_map, train step) — and cpu_aot_loader logs machine-feature
# mismatches for entries written by other hosts of the same build (the
# cache key does not include the CPU microarch). Correctness of a suite run
# beats warm-start speed, so caching is opt-in for local iteration:
#   MVTPU_TEST_CACHE=1 python -m pytest tests/ -q
# The opt-in dir is fingerprinted by the host's CPU flags so foreign-host
# entries are invisible rather than fatal. TPU bench/diag scripts keep the
# shared ~/.cache/mvtpu_jax (TPU executables come from the remote compile
# helper and are host-independent).
if os.environ.get("MVTPU_TEST_CACHE"):
    import hashlib

    def _cpu_fingerprint() -> str:
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        return hashlib.md5(line.encode()).hexdigest()[:10]
        except OSError:
            pass
        return "generic"

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/mvtpu_jax_cpu_{_cpu_fingerprint()}"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"


# The modules that compile the LARGEST XLA:CPU programs (full-scale 24L
# shard_map TP decode, sharded train steps) run FIRST: four full-suite runs
# segfaulted inside the XLA:CPU compiler / executable (de)serialization
# when exactly these programs compiled ~30 minutes into an aged process
# (hundreds of live executables, fragmented heap), while every module
# passes standalone in a fresh process. Front-loading them compiles the big
# programs while the process is young; within-file and all other ordering
# is preserved.
_HEAVY_FIRST = [
    "test_tp_decode.py",
    "test_tts_tp.py",
    "test_sharding.py",
    "test_training.py",
    "test_trainer_e2e.py",
]


def pytest_collection_modifyitems(session, config, items):
    def rank(item):
        name = os.path.basename(str(item.fspath))
        if name in _HEAVY_FIRST:
            return (0, _HEAVY_FIRST.index(name))
        return (1, 0)

    items.sort(key=rank)
