"""Round-4: leaf-visit cost variants (host-fenced, cost/iter via t(2N)-t(N)).

The leaf visit (~1us: K=32 split-bf16 matmul + (C,P) elementwise decode +
sublane reduces) dominates the frame.  Variants:

  base     : r3 kernel decode (masked-t + min + eq/select/min argmin)
  keyed    : pack (t_bits & ~127 | row) -> ONE int min reduce gives t AND row
             (argmin pass eliminated; t quantized to 128 ulp, ~1.5e-5 rel —
             hits are re-derived exactly outside the kernel)
  guard    : base + pop-time cluster-AABB slab pre-test that skips the
             matmul+decode when no lane's window reaches the cluster
             (guard_hit / guard_miss measure both outcomes)
  mm_only  : matmul + single reduce only (floor)

Each at packet width P in {512, 256, 128}.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128
NC = 256
F32 = jnp.float32
INF_KEY = np.int32(0x7F800000)  # +inf bitpattern: beats every finite key


def _split3(x):
    def bf16_exact(v):
        i = jax.lax.bitcast_convert_type(v, jnp.int32)
        return jax.lax.bitcast_convert_type(
            i & jnp.int32(-65536), jnp.float32
        )
    h = bf16_exact(x)
    r = x - h
    m = bf16_exact(r)
    l = bf16_exact(r - m)
    return h, m, l


def _stack_w32(w):
    h, m, l = _split3(w)
    return jnp.concatenate([h, h, m, h, l, m, m, l], axis=0)


def _stack_od32(od):
    h, m, l = _split3(od)
    return jnp.concatenate([h, m, h, l, h, m, l, m], axis=0)


def make_fn(kind, niter, p):
    def kernel(bounds_ref, w_ref, rays_ref, out_ref):
        r = rays_ref[...]
        od32 = _stack_od32(r[0:4])
        row = jax.lax.broadcasted_iota(jnp.int32, (C, p), 0)
        tlo = jnp.zeros((1, p), F32)

        def mm(cid):
            wmat = _stack_w32(w_ref[cid])
            odp = jax.lax.dot_general(
                wmat, od32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            op, dp = odp[:, 0:p], odp[:, p:]
            return (op[0:C], op[C:2*C], op[2*C:],
                    dp[0:C], dp[C:2*C], dp[2*C:])

        def leaf_base(cid, best_t, best_code):
            ou, ov, ow, du, dv, dw = mm(cid)
            dw_ok = jnp.abs(dw) > F32(1e-20)
            t = -ow / jnp.where(dw_ok, dw, F32(1.0))
            u = ou + t * du
            v = ov + t * dv
            ok = (dw_ok & (t >= tlo) & (t < best_t) & (u >= 0) & (v >= 0)
                  & (u + v <= 1))
            tm = jnp.where(ok, t, jnp.inf)
            trow = jnp.min(tm, axis=0, keepdims=True)
            improved = trow < best_t
            jsel = jnp.min(
                jnp.where(tm == trow, row, jnp.int32(C)), axis=0,
                keepdims=True,
            )
            code = cid * C + jsel
            return (jnp.where(improved, trow, best_t),
                    jnp.where(improved, code, best_code))

        def leaf_keyed_recip(cid, best_t, best_code):
            # division replaced by approx reciprocal + ONE Newton step
            # (~2 ulp): the f32 divide lowers to a longer Newton chain
            ou, ov, ow, du, dv, dw = mm(cid)
            dw_ok = jnp.abs(dw) > F32(1e-20)
            dws = jnp.where(dw_ok, dw, F32(1.0))
            r0 = pl.reciprocal(dws, approx=True)
            r = r0 * (F32(2.0) - dws * r0)
            t = -ow * r
            u = ou + t * du
            v = ov + t * dv
            ok = (dw_ok & (t >= tlo) & (t < best_t) & (u >= 0) & (v >= 0)
                  & (u + v <= 1))
            tb = jax.lax.bitcast_convert_type(
                jnp.maximum(t, F32(0.0)), jnp.int32
            )
            key = (tb & jnp.int32(-128)) | row
            key = jnp.where(ok, key, INF_KEY)
            kmin = jnp.min(key, axis=0, keepdims=True)
            t_up = jax.lax.bitcast_convert_type(
                (kmin & jnp.int32(-128)) + jnp.int32(128), jnp.float32
            )
            improved = t_up < best_t
            code = cid * C + (kmin & 127)
            return (jnp.where(improved, t_up, best_t),
                    jnp.where(improved, code, best_code))

        def leaf_keyed(cid, best_t, best_code):
            ou, ov, ow, du, dv, dw = mm(cid)
            dw_ok = jnp.abs(dw) > F32(1e-20)
            t = -ow / jnp.where(dw_ok, dw, F32(1.0))
            u = ou + t * du
            v = ov + t * dv
            ok = (dw_ok & (t >= tlo) & (t < best_t) & (u >= 0) & (v >= 0)
                  & (u + v <= 1))
            tb = jax.lax.bitcast_convert_type(t, jnp.int32)
            key = (tb & jnp.int32(~127)) | row
            key = jnp.where(ok, key, INF_KEY)
            kmin = jnp.min(key, axis=0, keepdims=True)
            # t_up >= true t: never over-culls later clusters
            t_up = jax.lax.bitcast_convert_type(
                (kmin & jnp.int32(~127)) + jnp.int32(128), jnp.float32
            )
            improved = t_up < best_t
            code = cid * C + (kmin & 127)
            return (jnp.where(improved, t_up, best_t),
                    jnp.where(improved, code, best_code))

        def body(i, carry):
            best_t, best_code, acc = carry
            cid = jax.lax.rem(i, NC)
            if kind == "mm_only":
                ou, ov, ow, du, dv, dw = mm(cid)
                acc = acc + jnp.min(ow, axis=0, keepdims=True)
                return best_t, best_code, acc
            if kind in ("guard_hit", "guard_miss"):
                b = bounds_ref[jax.lax.rem(cid, 8)]
                # slab the cluster box against the live window (pop-time
                # re-check): guard_miss uses boxes no ray reaches
                lox, loy, loz = b[0, 0], b[0, 1], b[0, 2]
                hix, hiy, hiz = b[0, 3], b[0, 4], b[0, 5]
                ox, oy, oz = r[0:1, 0:p], r[1:2, 0:p], r[2:3, 0:p]
                dx = r[0:1, p:]
                dy = r[1:2, p:]
                dz = r[2:3, p:]
                eps = F32(1e-12)
                idx = F32(1.0) / jnp.where(jnp.abs(dx) > eps, dx, eps)
                idy = F32(1.0) / jnp.where(jnp.abs(dy) > eps, dy, eps)
                idz = F32(1.0) / jnp.where(jnp.abs(dz) > eps, dz, eps)
                t0x, t1x = (lox - ox) * idx, (hix - ox) * idx
                t0y, t1y = (loy - oy) * idy, (hiy - oy) * idy
                t0z, t1z = (loz - oz) * idz, (hiz - oz) * idz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tlo),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best_t),
                )
                reach = jnp.sum((tn <= tf).astype(jnp.int32))
                bt2, bc2 = jax.lax.cond(
                    reach > 0,
                    lambda o: leaf_base(cid, o[0], o[1]),
                    lambda o: o,
                    (best_t, best_code),
                )
                return bt2, bc2, acc
            if kind == "keyed":
                bt, bc = leaf_keyed(cid, best_t, best_code)
            elif kind == "keyed_recip":
                bt, bc = leaf_keyed_recip(cid, best_t, best_code)
            else:
                bt, bc = leaf_base(cid, best_t, best_code)
            return bt, bc, acc

        init = (
            jnp.full((1, p), 1e30, F32),
            jnp.full((1, p), -1, jnp.int32),
            jnp.zeros((1, p), F32),
        )
        best_t, best_code, acc = jax.lax.fori_loop(0, niter, body, init)
        out_ref[0:1] = best_t + acc
        out_ref[1:2] = best_code.astype(F32)

    @jax.jit
    def call(bounds, w, rays):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, p), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(bounds, w, rays)

    return call


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.normal(size=(NC, 4, 3 * C)).astype(np.float32))
    for p in (256,):
        rays = rng.normal(size=(6, 2 * p)).astype(np.float32)
        rays[4] = 0.0
        rays[5] = 1e30
        rays = jnp.asarray(rays)
        for kind in ("mm_only", "keyed", "keyed_recip"):
            if kind == "guard_hit":
                bounds = jnp.asarray(
                    np.tile([-1e30, -1e30, -1e30, 1e30, 1e30, 1e30],
                            (8, 1, 1)).astype(np.float32).reshape(8, 1, 6))
            else:
                bounds = jnp.asarray(
                    np.tile([5e29, 5e29, 5e29, 6e29, 6e29, 6e29],
                            (8, 1, 1)).astype(np.float32).reshape(8, 1, 6))
            times = {}
            for niter in (20000, 40000):
                f = make_fn(kind, niter, p)
                out = f(bounds, w, rays)
                float(jnp.sum(out))  # warm + fence
                best = 1e30
                for _ in range(4):
                    t0 = time.time()
                    out = f(bounds, w, rays)
                    float(jnp.sum(out))  # fence EVERY call (tunnel RTT)
                    best = min(best, time.time() - t0)
                times[niter] = best
            per = (times[40000] - times[20000]) / 20000
            print(f"P={p:4d} {kind:10s} {per*1e9:8.0f} ns/visit", flush=True)


if __name__ == "__main__":
    main()
