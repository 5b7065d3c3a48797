"""Probe the persistent XLA compile cache without compiling.

`--scan_layers=auto` wants to unroll the encoder layer loop whenever the
per-step win outruns the extra compile time. Compile time is ~zero when the
unrolled program is already in the persistent compile cache
(`jax_compilation_cache_dir`, set by util/tpu_setup.py) — e.g. warmed by an
earlier run of the same config, or by bench.py's isolated phase moments
before its Trainer phase. This module answers "would compiling this lowered
program be a cache hit?" by running `lowered.compile()` with the actual
backend-compile entry point interposed: on a persistent-cache hit JAX
deserializes the executable and the entry point is never reached; on a miss
we raise before XLA spends minutes compiling.

A True return also leaves the deserialized executable in process caches, so
the subsequent real compile of the same program is warm twice over.
"""

from typing import Optional


class _WouldCompile(Exception):
    """Raised by the interposer to abort an actual XLA compilation."""


def lowered_is_cached(lowered) -> Optional[bool]:
    """True/False = persistent-cache hit/miss for `lowered.compile()`.
    None = the probe could not run (old/unknown JAX internals); callers
    must treat None as "unknown" and fall back to their static heuristic."""
    try:
        from jax._src import compiler
    except Exception:
        return None
    orig = getattr(compiler, "backend_compile_and_load", None)
    if orig is None:
        return None

    def _interpose(*args, **kwargs):
        raise _WouldCompile()

    compiler.backend_compile_and_load = _interpose
    try:
        lowered.compile()
        return True
    except _WouldCompile:
        return False
    except Exception:
        return None
    finally:
        compiler.backend_compile_and_load = orig
