"""Backend selection helper.

The environment's axon TPU plugin (sitecustomize) preloads jax and wins the
backend race even when the caller exported ``JAX_PLATFORMS=cpu``; honoring
the env var therefore needs an explicit ``jax.config`` update *before* the
first computation.  Call :func:`honor_jax_platforms_env` at every process
entry point (CLI, drivers, scripts).
"""

from __future__ import annotations

import os

import jax


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
