"""Persistent XLA compilation cache for fresh-process cold starts.

A fresh demo/serving process pays the full XLA compile at its first frame
(measured 212-278 s through the bench tunnel — bench_details.json:
demo_coldstart), and ``--from_export`` does not help because *compile*, not
trace, dominates.  JAX's persistent compilation cache keys the compiled
executable on (HLO, compile options, backend version) and reloads it from
disk, so every process after the first skips the compile entirely.  The
reference has no equivalent: its demos re-instantiate torch from opt.pkl
and re-trace CUDA kernels every launch (image_demo.py:54-56).

Enabled by default in the demo CLIs (``cli/image_demo.py``,
``cli/video_demo.py``) and opt-in for training via
``traineval --compilation_cache``; ``OBMAN_COMPCACHE=0`` disables,
``OBMAN_COMPCACHE_DIR`` overrides the location.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "obman_train_tpu", "jax_cache"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit arg > ``$OBMAN_COMPCACHE_DIR`` >
    ``~/.cache/obman_train_tpu/jax_cache``.  ``OBMAN_COMPCACHE=0`` (or
    ``off``/``false``) disables entirely.  Must run before the first jit
    compilation to help that compile; safe to call any time.  Returns the
    cache dir, or None when disabled/unavailable.
    """
    if os.environ.get("OBMAN_COMPCACHE", "1").lower() in ("0", "off", "false"):
        return None
    cache_dir = cache_dir or os.environ.get("OBMAN_COMPCACHE_DIR") or DEFAULT_DIR
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every executable: the demos' jits compile in seconds on CPU
        # but minutes through the TPU tunnel, and the default 1 s / small-
        # entry thresholds would skip exactly the entries we want warm.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knobs, read-only FS, ...
        return None
    return cache_dir
