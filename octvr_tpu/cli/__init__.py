"""CLI entry points.

``apply_platform_env()``: the hosted 'axon' TPU plugin ignores
JAX_PLATFORMS, so tests/headless runs set OCTVR_PLATFORM=cpu and every
CLI applies it through jax.config BEFORE the backend initializes."""

import os


def apply_platform_env():
    plat = os.environ.get("OCTVR_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
