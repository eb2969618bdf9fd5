"""Decompose the ~3.3us/visit traversal cost into components (host-fenced).

Each kernel runs NITER while-loop iterations in one grid step; cost/iter =
(t(2N) - t(N)) / N to cancel fixed overheads.  Components:

  pop:        SMEM stack pop scalar chain only
  pop+slab:   + (8,P) slab test, result folded into a vector acc (no sync)
  pop+slab+sync: + bitmask vector->scalar extraction per iter
  pop+slab+sync+push: + SMEM push of the mask (the full internal-node visit)
  cond2:      same but wrapped in a 2-way lax.cond alternating branches
  leaf:       MXU cluster matmul + decode + min-reduce per iter (no scalars)
  leaf+cond:  leaf behind the same lax.cond structure as the real kernel
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 512
C = 128
NN = 512  # nodes
NC = 256  # clusters
F32 = jnp.float32


def run(kind, niter):
    def kernel(bounds_ref, w_ref, rays_ref, out_ref, stack_ref):
        r = rays_ref[...]
        ox, oy, oz = r[0:1, 0:P], r[1:2, 0:P], r[2:3, 0:P]
        dx, dy, dz = r[0:1, P:], r[1:2, P:], r[2:3, P:]
        eps = F32(1e-12)
        idx = F32(1.0) / jnp.where(jnp.abs(dx) > eps, dx, eps)
        idy = F32(1.0) / jnp.where(jnp.abs(dy) > eps, dy, eps)
        idz = F32(1.0) / jnp.where(jnp.abs(dz) > eps, dz, eps)
        od8 = r[0:4]
        tlo = jnp.zeros((1, P), F32)

        stack_ref[0] = 255

        def slab(nid, thi):
            b = bounds_ref[nid]
            lox, loy, loz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
            hix, hiy, hiz = b[:, 3:4], b[:, 4:5], b[:, 5:6]
            t0x = (lox - ox) * idx
            t1x = (hix - ox) * idx
            t0y = (loy - oy) * idy
            t1y = (hiy - oy) * idy
            t0z = (loz - oz) * idz
            t1z = (hiz - oz) * idz
            tmin_ = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tlo),
            )
            tmax_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(jnp.maximum(t0z, t1z), thi),
            )
            return tmin_ <= tmax_  # (8, P)

        def leafwork(cid, best):
            wmat = w_ref[cid]
            odp = jax.lax.dot_general(
                wmat, od8, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            op, dp = odp[:, 0:P], odp[:, P:]
            ou, ov, ow = op[0:C], op[C:2*C], op[2*C:]
            du, dv, dw = dp[0:C], dp[C:2*C], dp[2*C:]
            dw_ok = jnp.abs(dw) > F32(1e-20)
            t = -ow / jnp.where(dw_ok, dw, F32(1.0))
            u = ou + t * du
            v = ov + t * dv
            ok = dw_ok & (t >= 0) & (t < best) & (u >= 0) & (v >= 0) & (u + v <= 1)
            tm = jnp.where(ok, t, jnp.inf)
            trow = jnp.min(tm, axis=0, keepdims=True)
            return jnp.minimum(best, trow)

        def body(i, carry):
            sp, acc, best = carry
            nid = jax.lax.rem(stack_ref[jax.lax.rem(sp, 32)] + i, NN)
            sp2 = sp
            if kind == "pop":
                stack_ref[jax.lax.rem(sp + 1, 64)] = nid
                sp2 = sp + (nid & 1)
                return sp2, acc, best
            if kind.startswith("pop+slab"):
                hit = slab(nid, jnp.full((1, P), 1e30, F32))
                acc = acc + jnp.sum(hit.astype(F32), axis=0, keepdims=True)
                if "sync" in kind:
                    anyv = jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True)
                    wts = jnp.int32(1) << jax.lax.broadcasted_iota(
                        jnp.int32, (8, 1), 0
                    )
                    m = jnp.sum(anyv * wts)
                    if "push" in kind:
                        @pl.when(m != 0)
                        def _():
                            stack_ref[jax.lax.rem(sp + 1, 64)] = m & 255
                        sp2 = sp + (m & 1)
                return sp2, acc, best
            if kind == "cond2":
                def a_case(ops):
                    sp, acc, best = ops
                    hit = slab(nid, jnp.full((1, P), 1e30, F32))
                    anyv = jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True)
                    wts = jnp.int32(1) << jax.lax.broadcasted_iota(
                        jnp.int32, (8, 1), 0
                    )
                    m = jnp.sum(anyv * wts)
                    @pl.when(m != 0)
                    def _():
                        stack_ref[jax.lax.rem(sp + 1, 64)] = m & 255
                    return sp + (m & 1), acc, best
                def b_case(ops):
                    sp, acc, best = ops
                    return sp, acc, leafwork(jax.lax.rem(nid, NC), best)
                return jax.lax.cond((nid & 1) == 0, a_case, b_case,
                                    (sp, acc, best))
            if kind.startswith("leaf"):
                cid = jax.lax.rem(nid, NC)
                if kind == "leaf+cond":
                    def a_case(ops):
                        sp, acc, best = ops
                        return sp, acc, leafwork(cid, best)
                    def b_case(ops):
                        return ops
                    return jax.lax.cond((i & 1) == 0, a_case, a_case,
                                        (sp, acc, best))
                return sp, acc, leafwork(cid, best)
            raise ValueError(kind)

        sp, acc, best = jax.lax.fori_loop(
            0, niter, body,
            (jnp.int32(0), jnp.zeros((1, P), F32),
             jnp.full((1, P), 1e30, F32)),
        )
        out_ref[...] = acc + best + jnp.float32(sp)

    np.random.seed(0)
    bounds = jnp.asarray(np.random.rand(NN, 8, 6).astype(np.float32))
    w = jnp.asarray(np.random.randn(NC, 4, 3 * C).astype(np.float32))
    rays = jnp.asarray(np.random.randn(6, 2 * P).astype(np.float32))
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    ))
    out = f(bounds, w, rays)
    _ = float(jnp.sum(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(bounds, w, rays)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    kinds = ["pop", "pop+slab", "pop+slab+sync", "pop+slab+sync+push",
             "cond2", "leaf", "leaf+cond"]
    n1, n2 = 16384, 65536  # big enough to swamp the ~30ms tunnel roundtrip
    for kind in kinds:
        t1 = run(kind, n1)
        t2 = run(kind, n2)
        per = (t2 - t1) / (n2 - n1)
        print(f"{kind:20s} {per*1e9:8.0f} ns/iter   "
              f"(t{n1}={t1*1e3:.2f}ms t{n2}={t2*1e3:.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
