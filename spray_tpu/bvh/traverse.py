"""Reference (pure-jnp) stackful BVH traversal — slow-but-correct device path.

Role (SURVEY.md §7.2 step 2): the correctness anchor for the Pallas traversal
kernels and the autodiff-friendly fallback.  One ray = one lax.while_loop with a
fixed-depth explicit stack; a wavefront is vmap over rays.  XLA compiles this
fine anywhere (CPU/TPU) but it gathers per-ray — the Pallas packet kernels are
the fast path.

Encoding matches spray_tpu.bvh.builder.FlatBVH: child_node >= 0 internal,
-1 empty, <= -2 leaf with first tri -(v + 2) and child_count tris (leaf runs are
contiguous and padded, so leaves are dynamic_slice'able).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geom
from ..core.pytree import register_intersector_pytree
from ..core.types import Hits
from .builder import FlatBVH, build_bvh, reordered_tri_arrays

STACK_DEPTH = 96


@dataclasses.dataclass(frozen=True)
class DeviceBVH:
    """FlatBVH + leaf-ordered triangle SoA, resident on device."""

    child_lo: jnp.ndarray  # (N, B, 3)
    child_hi: jnp.ndarray  # (N, B, 3)
    child_node: jnp.ndarray  # (N, B)
    child_count: jnp.ndarray  # (N, B)
    v0: jnp.ndarray  # (Tp, 3)
    e1: jnp.ndarray
    e2: jnp.ndarray
    orig_id: jnp.ndarray  # (Tp,) i32, -1 padding
    leaf_size: int

    @classmethod
    def build(cls, vertices, faces, leaf_size=16, branching=8):
        bvh = build_bvh(vertices, faces, leaf_size=leaf_size, branching=branching)
        v0, e1, e2, orig = reordered_tri_arrays(vertices, faces, bvh)
        return cls.from_flat(bvh, v0, e1, e2, orig)

    @classmethod
    def from_flat(cls, bvh: FlatBVH, v0, e1, e2, orig):
        return cls(
            child_lo=jnp.asarray(bvh.child_lo),
            child_hi=jnp.asarray(bvh.child_hi),
            child_node=jnp.asarray(bvh.child_node),
            child_count=jnp.asarray(bvh.child_count),
            v0=jnp.asarray(v0),
            e1=jnp.asarray(e1),
            e2=jnp.asarray(e2),
            orig_id=jnp.asarray(orig),
            leaf_size=bvh.leaf_size,
        )


jax.tree_util.register_pytree_node(
    DeviceBVH,
    lambda b: (
        (b.child_lo, b.child_hi, b.child_node, b.child_count, b.v0, b.e1, b.e2,
         b.orig_id),
        b.leaf_size,
    ),
    lambda aux, ch: DeviceBVH(*ch, leaf_size=aux),
)


def _leaf_intersect(bvh, first, o, d, tmin, best_t, any_hit):
    """Intersect one padded leaf run starting at `first` (leaf_size tris).

    Indexed gather, NOT dynamic_slice: under vmap (one start index per ray) a
    batched dynamic_slice lowered to a broadcast of the WHOLE triangle array
    per ray — a f32[rays, tris, 3] compile-time allocation that OOM'd HBM at
    16K rays x 29K tris (r3 bench).  A fancy-index gather batches as a plain
    (rays, leaf_size, 3) gather."""
    ls = bvh.leaf_size
    idx = first + jnp.arange(ls, dtype=jnp.int32)
    v0 = bvh.v0[idx]
    e1 = bvh.e1[idx]
    e2 = bvh.e2[idx]
    ids = bvh.orig_id[idx]
    t, u, v, ok = geom.moller_trumbore(o, d, v0, e1, e2, jnp)
    ok = ok & (ids >= 0) & (t >= tmin) & (t < best_t)
    t = jnp.where(ok, t, geom.INF)
    j = jnp.argmin(t)
    return t[j], ids[j], u[j], v[j], ok[j]


def _traverse_one(bvh, o, d, tmin, tmax, any_hit):
    """Nearest-hit (or any-hit) traversal for a single ray."""
    inv_d = jnp.float32(1.0) / jnp.where(
        jnp.abs(d) > jnp.float32(1e-12), d, jnp.float32(1e-12)
    )
    ro_inv = o * inv_d

    def cond(state):
        sp, _, best_t, _, _, _, found = state
        live = sp > 0
        if any_hit:
            live = live & ~found
        return live

    def body(state):
        sp, stack, best_t, best = state[0], state[1], state[2], state[3]
        best_u, best_v, found = state[4], state[5], state[6]
        sp = sp - 1
        node = stack[sp]
        lo = bvh.child_lo[node]
        hi = bvh.child_hi[node]
        t_entry, hit = geom.ray_aabb(
            ro_inv, inv_d, lo, hi, tmin, jnp.minimum(tmax, best_t), jnp
        )
        kind = bvh.child_node[node]
        hit = hit & (kind != -1)

        # Leaves: loop over the B child slots, intersect leaf runs.
        def leaf_body(j, carry):
            best_t, best, best_u, best_v, found = carry
            is_leaf = hit[j] & (kind[j] <= -2)

            def do_leaf(carry):
                best_t, best, best_u, best_v, found = carry
                first = -(kind[j] + 2)
                t, pid, u, v, ok = _leaf_intersect(
                    bvh, first, o, d, tmin, jnp.minimum(tmax, best_t), any_hit
                )
                upd = ok & (t < best_t)
                return (
                    jnp.where(upd, t, best_t),
                    jnp.where(upd, pid, best),
                    jnp.where(upd, u, best_u),
                    jnp.where(upd, v, best_v),
                    found | ok,
                )

            return jax.lax.cond(is_leaf, do_leaf, lambda c: c,
                                (best_t, best, best_u, best_v, found))

        best_t, best, best_u, best_v, found = jax.lax.fori_loop(
            0, kind.shape[0], leaf_body, (best_t, best, best_u, best_v, found)
        )

        # Internal children: push (unordered; best_t culling prunes later).
        def push_body(j, carry):
            sp, stack = carry
            is_int = hit[j] & (kind[j] >= 0)
            stack = jnp.where(
                is_int, stack.at[sp].set(kind[j]), stack
            )
            return sp + is_int.astype(jnp.int32), stack

        sp, stack = jax.lax.fori_loop(0, kind.shape[0], push_body, (sp, stack))
        return (sp, stack, best_t, best, best_u, best_v, found)

    stack0 = jnp.zeros(STACK_DEPTH, jnp.int32)
    init = (
        jnp.int32(1), stack0, tmax, jnp.int32(-1),
        jnp.float32(0), jnp.float32(0), jnp.bool_(False),
    )
    _, _, best_t, best, best_u, best_v, found = jax.lax.while_loop(
        cond, body, init
    )
    return best_t, best, best_u, best_v, found


@register_intersector_pytree(leaves=("bvh",))
class BVHIntersector:
    """Drop-in intersector (same interface as BruteIntersector) over a DeviceBVH."""

    def __init__(self, scene=None, bvh: DeviceBVH = None, leaf_size=16,
                 branching=8):
        if bvh is None:
            bvh = DeviceBVH.build(
                np.asarray(scene.vertices), np.asarray(scene.faces),
                leaf_size=leaf_size, branching=branching,
            )
        self.bvh = bvh

    def intersect(self, o, d, tmin, tmax):
        f = jax.vmap(
            lambda o_, d_, a, b: _traverse_one(self.bvh, o_, d_, a, b, False)
        )
        t, prim, u, v, found = f(o, d, tmin, tmax)
        return Hits(
            t=jnp.where(found, t, tmax),
            prim=jnp.where(found, prim, -1).astype(jnp.int32),
            u=u, v=v, valid=found,
        )

    def occluded(self, o, d, tmax):
        n = o.shape[0]
        tmin = jnp.full(n, jnp.float32(0.0))
        f = jax.vmap(
            lambda o_, d_, a, b: _traverse_one(self.bvh, o_, d_, a, b, True)
        )
        _, _, _, _, found = f(o, d, tmin, tmax)
        return found
