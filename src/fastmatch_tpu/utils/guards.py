"""Runtime guards (SURVEY.md §6.2 "race detection/sanitizers").

JAX is functional, so data races are designed out; the failure modes that
remain in this engine are *indexing* bugs in gather-heavy code (descriptor
indexing, the BA observation table) and NaN poisoning. Two flag-gated guards:

- ``checked(fn)``: wrap a jittable function with ``jax.experimental.checkify``
  (index + float + user checks). The wrapper throws a Python error with the
  failing check's message instead of silently clamping an out-of-bounds
  gather — run the test suite with FASTMATCH_CHECKIFY=1 to sweep the whole
  engine under it.
- ``debug_nans()``: context manager enabling jax's debug_nans within a scope.

Production paths pay nothing: guards only activate when explicitly wrapped
or when the environment flag is set.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
from jax.experimental import checkify


def checkify_enabled() -> bool:
    return os.environ.get("FASTMATCH_CHECKIFY", "") not in ("", "0")


_ERRORS = checkify.index_checks | checkify.float_checks | checkify.user_checks


def checked(fn, errors=None):
    """Return a version of ``fn`` that runs under checkify and raises on the
    first failed check (out-of-bounds gather/scatter, nan/inf production,
    explicit ``checkify.check`` calls)."""
    cfn = checkify.checkify(fn, errors=errors or _ERRORS)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def maybe_checked(fn, errors=None):
    """``checked(fn)`` when FASTMATCH_CHECKIFY is set, else ``fn`` unchanged —
    the zero-cost production default."""
    return checked(fn, errors) if checkify_enabled() else fn


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans: any nan materialized inside raises immediately
    with the offending primitive's traceback."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
