"""Shared test helpers: jitted init/apply wrappers.

Eager (op-by-op) dispatch compiles each primitive separately, which is very
slow on the CPU test backend. Jitting whole init/apply programs compiles once
and hits the persistent compilation cache across test runs.
"""

from functools import partial

import jax


def jit_init(module, *args, **kwargs):
    statics = tuple(k for k in kwargs)
    return jax.jit(partial(module.init, **kwargs))(*args)


def jit_apply(module, variables, *args, method=None, mutable=False, **kwargs):
    def f(variables, *a):
        return module.apply(variables, *a, method=method, mutable=mutable, **kwargs)
    return jax.jit(f)(variables, *args)
