"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports.

This is the standard JAX fake-multi-device trick (SURVEY.md §4): sharding /
collective tests run on an 8-device CPU mesh, substituting for multi-chip TPU
hardware. bench.py (real-TPU benchmark) deliberately does NOT import this.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
# tests must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    # Cap codegen at AVX2: with AVX512, XLA:CPU tags compiled executables
    # with pseudo-features (+prefer-no-scatter/+prefer-no-gather) that the
    # host feature check never reports, so every persistent-cache load is
    # rejected and recompiled. Capped at AVX2 the cache actually hits
    # (~30% faster repeat runs); these tests are compile-bound, not
    # vector-width-bound.
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# jaxtyping's pytest plugin imports jax before this conftest runs, so the env
# var alone is too late — update the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated on the single
# test CPU; caching compiled executables across runs cuts repeat wall-clock
# drastically (first run pays full price).
_cache_dir = os.environ.get(
    "WEALY_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache"),
)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass  # older jax without these knobs

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_decode_model():
    """Shared tiny Whisper (1 enc / 2 dec layers, width 32, full vocab) for
    the decode-path suites (beam, longform). ONE init + identical params
    across modules, so jitted decode traces of the same shapes are reused
    instead of re-traced per module (the ROADMAP suite-wall-time fix).
    Returns (model, params, cfg); encoder-state fixtures stay per-module
    (they differ in batch size)."""
    import jax.numpy as jnp

    from wealy_tpu.models.whisper.config import WhisperConfig
    from wealy_tpu.models.whisper.model import Whisper

    cfg = WhisperConfig(
        n_mels=8,
        n_audio_ctx=16,
        n_audio_state=32,
        n_audio_head=2,
        n_audio_layer=1,
        n_vocab=51865,
        n_text_ctx=64,
        n_text_state=32,
        n_text_head=2,
        n_text_layer=2,
    )
    model = Whisper(cfg, dtype=jnp.float32)
    mel0 = jnp.zeros((1, cfg.n_mels, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(3), mel0, jnp.zeros((1, 4), jnp.int32)
    )["params"]
    return model, params, cfg


if os.environ.get("WEALY_RSS_LOG"):
    # Peak-RSS bisection aid: append "peak_mb test_id" after every test so a
    # jump identifies which test drove the pytest process's high-water mark
    # (WEALY_RSS_LOG=/path). Diagnostic only — off unless the env var is set.
    import resource

    @pytest.hookimpl(hookwrapper=True)
    def pytest_runtest_teardown(item):
        yield
        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
        with open(os.environ["WEALY_RSS_LOG"], "a") as f:
            f.write(f"{peak:.0f} {item.nodeid}\n")
