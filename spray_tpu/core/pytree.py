"""Pytree registration for intersector-style classes.

Why this exists (measured on TPU, 2026-08-18): a jitted frame function that
CLOSES OVER an intersector embeds its BVH arrays as HLO constants; XLA then
streams those constants into the kernel on EVERY execution (copy-start/done
pairs feeding the pallas custom call) — a 21-domain scene re-uploaded ~122MB
per intersect, making the frame ~80x slower than the same kernel with the
arrays passed as jit arguments.  Registering intersectors as pytrees lets
every jit boundary take them as ARGUMENTS (device-resident buffers), which is
the supported JAX idiom for 'model state' anyway.

Usage:
    @register_intersector_pytree(
        leaves=("bounds", "meta", "w"), aux=("nn", "interpret"))
    class MyIntersector: ...

Fields not listed in either tuple are dropped on unflatten (set to None):
they must be host-only conveniences, never used inside traced code.
"""

from __future__ import annotations

import jax


def register_intersector_pytree(leaves, aux=(), drop=()):
    """Class decorator: register with `leaves` as child arrays and `aux` as
    static (hashable!) treedef data.  `drop` fields become None on unflatten."""

    def wrap(cls):
        def flatten(obj):
            return (
                tuple(getattr(obj, f) for f in leaves),
                tuple(getattr(obj, f) for f in aux),
            )

        def unflatten(aux_vals, children):
            obj = object.__new__(cls)
            for f, v in zip(leaves, children):
                object.__setattr__(obj, f, v)
            for f, v in zip(aux, aux_vals):
                object.__setattr__(obj, f, v)
            for f in drop:
                object.__setattr__(obj, f, None)
            return obj

        jax.tree_util.register_pytree_node(cls, flatten, unflatten)
        return cls

    return wrap
