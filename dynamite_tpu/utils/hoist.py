"""
Constant-hoisting jit.

JAX lowers device arrays captured by closure into the program as *literal
MLIR constants* (verified on jax 0.9: a 16 MB captured array produces a
32 MB module). Kernel engines here legitimately capture large tables — the
ELL column/value tables (ops/ell.py), Explicit-subspace state maps — and
inlining them makes compilation payloads explode (on remote-compile
backends the request is simply rejected).

``hjit`` is a drop-in jit replacement for such functions: on first call per
input signature it runs ``jax.closure_convert`` to split the captured
arrays out of the jaxpr, then jits the converted function with the tables
as ordinary runtime arguments.
"""

from functools import wraps

import jax


def hjit(fn, **jit_kwargs):
    """jit with closure-captured device arrays hoisted to arguments.

    The wrapped callable must be traceable (pure) like any jit target.
    Conversion is cached per (shape, dtype) signature of the positional
    arguments, like jit's own compilation cache. Extra keyword arguments
    (e.g. ``out_shardings``) are forwarded to jax.jit.
    """
    cache = {}

    @wraps(fn)
    def wrapper(*args):
        key = tuple(
            (x.shape, str(x.dtype)) if hasattr(x, 'shape') else x
            for x in jax.tree_util.tree_leaves(args))
        entry = cache.get(key)
        if entry is None:
            closed, consts = jax.closure_convert(fn, *args)
            entry = (jax.jit(closed, **jit_kwargs), consts)
            cache[key] = entry
        jf, consts = entry
        return jf(*args, *consts)

    return wrapper
