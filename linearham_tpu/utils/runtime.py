"""Production runtime configuration: compile cache + precision resolution.

The reference has no compilation step at all (ahead-of-time C++); here a
fresh process pays an XLA compile per (family-shape, chunk-size) bucket,
which can run to minutes at production shapes.  Every production entry
point (CLI, pipeline, workflow, bench) therefore enables JAX's persistent
compilation cache so the cost is paid once per machine, not once per run.

Precision policy (VERDICT round-1 item 3): production TPU runs use f32 so
the Pallas pruning kernel engages; CPU conformance runs use f64 so the
reference's golden log-likelihoods (quoted to ~1e-10) match exactly.
"""

from __future__ import annotations

import os
from typing import Optional

_CACHE_ENABLED = False

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "linearham_tpu", "jax_cache")


def enable_persistent_cache(cache_dir: Optional[str] = None) -> str:
    """Turn on JAX's on-disk compilation cache (idempotent).

    Order of precedence for the directory: explicit argument,
    ``LINEARHAM_CACHE_DIR``, then ``~/.cache/linearham_tpu/jax_cache``.
    Set ``LINEARHAM_CACHE_DIR=off`` to disable entirely.
    """
    global _CACHE_ENABLED
    import jax

    cache_dir = cache_dir or os.environ.get("LINEARHAM_CACHE_DIR") \
        or DEFAULT_CACHE_DIR
    if cache_dir == "off":
        return cache_dir
    if _CACHE_ENABLED:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Anything over a second is worth keeping; the fused phylo step
    # compiles in minutes at production shapes.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _CACHE_ENABLED = True
    return cache_dir


def on_tpu() -> bool:
    """True when the default JAX device is a TPU.

    Checks the device's platform AND device_kind rather than only the
    backend's platform name: TPU plugin backends may register under
    other names, and `jax.default_backend() == "tpu"` would silently
    miss them — routing production runs onto the f64 XLA fallback path
    at a ~100x slowdown.  (The axon remote-TPU relay does report
    platform 'tpu'; this guard is for plugin backends that don't.)
    """
    import jax

    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return ("tpu" in (getattr(d, "platform", "") or "").lower()
            or "tpu" in (getattr(d, "device_kind", "") or "").lower())


def resolve_dtype(precision: Optional[str] = None):
    """Map a --precision flag onto a jnp dtype.

    ``f32``/``f64`` are explicit; ``None``/``auto`` picks f32 on TPU (the
    production configuration, where the Pallas pruning kernel engages) and
    f64 elsewhere (CPU conformance against the reference goldens).
    Requesting f64 enables the x64 mode it needs.
    """
    import jax
    import jax.numpy as jnp

    if precision in (None, "auto"):
        precision = "f32" if on_tpu() else "f64"
    if precision in ("f32", "float32"):
        return jnp.float32
    if precision in ("f64", "float64"):
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        return jnp.float64
    raise ValueError(f"unknown precision {precision!r} "
                     "(expected f32, f64, or auto)")
