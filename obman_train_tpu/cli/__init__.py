"""CLI entry points (reference: top-level scripts traineval.py, demos,
simulate/intersect drivers).

Every jax-touching CLI calls :func:`apply_platform_override` before first
device use so ``OBMAN_PLATFORM=cpu`` reliably pins the backend even in
images whose sitecustomize imports jax (and registers a PJRT plugin) at
interpreter start — there the ``JAX_PLATFORMS`` env var is consulted too
early to override from a caller, and only the config API works.
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    """Pin jax to ``$OBMAN_PLATFORM`` (e.g. ``cpu``) if set.

    Must run before the first device/backend use; a no-op when the env var
    is unset.  Same trap as bench.py's ``OBMAN_BENCH_CPU``: merely setting
    ``JAX_PLATFORMS`` does NOT switch backends in this image.
    """
    platform = os.environ.get("OBMAN_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
