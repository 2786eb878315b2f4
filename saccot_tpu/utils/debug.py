"""Debug guards (SURVEY.md section 5, race-detection row).

Data races are impossible inside XLA's functional model and there is no
hand-written multithreaded native code on the compute path, so the
sanitizer surface of a C++ framework doesn't exist here. What remains
worth guarding: NaN propagation through branchless masked math, and seed
discipline. `nan_guard()` flips on jax_debug_nans for a scope; tests and
drivers use fixed seeds throughout (numpy Generator / jax.random keys).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Raise on any NaN produced inside the scope (jax_debug_nans)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
