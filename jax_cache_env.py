"""Persistent-XLA-compile-cache env setup. Import BEFORE jax.

Importing this module (idempotently) points JAX's persistent compilation
cache at a stable location and zeroes the min-compile-time threshold: through
the axon tunnel the CLIENT-side compile step is sub-second (the real
multi-minute compile happens remotely), so the 1 s default threshold would
silently cache nothing. One definition — a cache-policy tweak must not need
editing every entry script (bench.py, __graft_entry__.py, tools/*).

jax-free on purpose: safe to import from any entry point before jax.
"""

import os


def setup() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


setup()
