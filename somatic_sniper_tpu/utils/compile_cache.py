"""Persistent XLA compilation cache for the device (fast) path.

On a tunneled accelerator a single fresh executable build/load can take
50-110 s (measured on the dev host's TPU link), which dwarfs the actual
call time (~30 ms steady-state).  The fast path has a tiny, stable
shape set (one combined (B, D) slab per window plus rare deep chunks),
so JAX's persistent compilation cache turns every run after the first
into a 2-3 s warm start — per machine, across processes.

Enabled automatically by the CLI and by ``runner.get_device_tables``
(i.e., before the first device dispatch).  Resolution order:

- an already-configured ``jax_compilation_cache_dir`` is respected;
- ``$JAX_COMPILATION_CACHE_DIR`` / ``$SNIPER_JAX_CACHE`` if set;
- else ``$XDG_CACHE_HOME|~/.cache`` / ``somatic_sniper_tpu/jax``.

Set ``SNIPER_JAX_CACHE=0`` to disable.
"""

from __future__ import annotations

import os
from pathlib import Path

_done = False


def enable_persistent_cache() -> None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    global _done
    if _done:
        return
    _done = True
    override = os.environ.get("SNIPER_JAX_CACHE")
    if override == "0":
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return  # user/bench already configured one
    except AttributeError:
        return
    try:
        # Path.home() raises in HOME-less environments (cron/containers);
        # the whole path computation stays inside the guard
        cache = (
            override
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or str(
                Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
                / "somatic_sniper_tpu" / "jax"
            )
        )
        Path(cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
