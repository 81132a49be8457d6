"""Make the JAX_PLATFORMS env var authoritative for the CLIs.

Some images install a sitecustomize that registers a TPU plugin AND sets
the `jax_platforms` config directly, which silently overrides the
JAX_PLATFORMS environment variable — `JAX_PLATFORMS=cpu python main.py`
would still run on the TPU.  Every CLI calls `honor_env_platform()`
before touching jax so the documented env-var contract actually holds.
(tests/conftest.py and __graft_entry__.py do the same dance inline.)
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    """If JAX_PLATFORMS is set, force jax.config to match it.

    Must be called before any jax device/backend use.  No-op when the
    env var is unset (the platform stays whatever the image default is,
    e.g. the TPU plugin).
    """
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)


def enable_compile_cache(cache_dir: str = None) -> None:
    """Point JAX's persistent compilation cache at a shared directory.

    Full-model train-step compiles take minutes on TPU; with the cache,
    a rerun of the same shapes (train resume, eval after train, repeated
    bench) loads the compiled program in seconds.  Same default location
    as `serve.WireframePredictor`; set WIREFRAME_XLA_CACHE="" to disable.

    The default directory is user-scoped (ADVICE r2): a fixed
    world-writable /tmp path could be pre-created/poisoned by another
    user of the host.  The min-compile-time knob is only set when the
    user has not configured it themselves.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("WIREFRAME_XLA_CACHE", default_cache_dir())
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # cache flags unavailable on this jax — run without
        pass


def default_cache_dir() -> str:
    """Per-user persistent XLA cache location."""
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else "u"
    return os.path.join(tempfile.gettempdir(),
                        f"wireframe_tpu_xla_cache_{uid}")
