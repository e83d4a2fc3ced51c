"""Platform selection helper for this machine's axon TPU shim.

The host sitecustomize force-updates jax_platforms to "axon,cpu" in every
interpreter, which silently overrides a user's JAX_PLATFORMS=cpu. CLIs call
`honor_jax_platforms_env()` right after importing jax so an explicit env
choice wins again.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    env = os.environ.get("JAX_PLATFORMS", "").lower()
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)
        from jax._src import xla_bridge as xb

        if xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
