"""Round-5: pre-stacked bf16 cluster pages vs the r4 keyed decode.

VERDICT r4 next#1: the per-visit `_stack_w32` split assembly dominates even
the matmul-only floor (358 of 490 ns/visit @256).  Variant `prestack` stores
the K=32 stacked operand as an actual bf16 page (NC, 32, 3C) built once —
the leaf visit feeds it straight to the MXU with zero operand prep.  Same
keyed single-reduce decode + Newton-reciprocal t as production r4.

Cost/iter via t(2N)-t(N) differencing, host-fenced readback (the only
reliable fence under the axon tunnel).
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

C = 128
NC = 256
F32 = jnp.float32
INF_KEY = np.int32(0x7F800000)


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
    prestacked = kind.startswith("prestack")
    hml = kind.startswith("hml")

    def kernel(w_ref, rays_ref, out_ref):
        r = rays_ref[...]
        od32 = _stack_od32(r[0:4])
        if prestacked or hml:
            od32 = od32.astype(jnp.bfloat16)
        row = jax.lax.broadcasted_iota(jnp.int32, (C, p), 0)
        tlo = jnp.zeros((1, p), F32)

        def mm(cid):
            if prestacked:
                wmat = w_ref[cid]
            elif hml:
                # compact (12, 3C) bf16 page [h|m|l]: concat-only per-visit
                # assembly (no split computation), 0.75x the f32 page DMA
                pg = w_ref[cid]
                h, m, l = pg[0:4], pg[4:8], pg[8:12]
                wmat = jnp.concatenate([h, h, m, h, l, m, m, l], axis=0)
            else:
                wmat = _stack_w32(w_ref[cid])
            odp = jax.lax.dot_general(
                wmat, od32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            op, dp = odp[:, 0:p], odp[:, p:]
            return (op[0:C], op[C:2*C], op[2*C:],
                    dp[0:C], dp[C:2*C], dp[2*C:])

        def leaf(cid, best_t, best_code):
            ou, ov, ow, du, dv, dw = mm(cid)
            dw_ok = jnp.abs(dw) > F32(1e-20)
            dws = jnp.where(dw_ok, dw, F32(1.0))
            r0 = pl.reciprocal(dws, approx=True)
            rr = r0 * (F32(2.0) - dws * r0)
            t = -ow * rr
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

        def body(i, carry):
            best_t, best_code, acc = carry
            cid = jax.lax.rem(i, NC)
            if kind.endswith("mm_only"):
                ou, ov, ow, du, dv, dw = mm(cid)
                acc = acc + jnp.min(ow, axis=0, keepdims=True)
                return best_t, best_code, acc
            bt, bc = leaf(cid, best_t, best_code)
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
    def call(w, rays):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, p), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, rays)

    return call


def main():
    from spray_tpu.kernels.traverse import stack_w_pages

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.normal(size=(NC, 4, 3 * C)).astype(np.float32))
    wk = stack_w_pages(w)  # (NC, 32, 3C) bf16
    import jax.numpy as _jnp

    def hml_pages(wf):
        h, m, l = _split3(wf)
        return _jnp.concatenate([h, m, l], axis=-2).astype(_jnp.bfloat16)

    wh = hml_pages(w)  # (NC, 12, 3C) bf16
    print("page bytes: f32", w.nbytes, "prestacked bf16", wk.nbytes,
          "hml bf16", wh.nbytes)
    for p in (256, 128):
        rays = rng.normal(size=(6, 2 * p)).astype(np.float32)
        rays[4] = 0.0
        rays[5] = 1e30
        rays = jnp.asarray(rays)
        for kind in ("keyed_recip", "prestack", "hml", "hml_mm_only"):
            pages = (wk if kind.startswith("prestack")
                     else wh if kind.startswith("hml") else w)
            times = {}
            for niter in (20000, 40000):
                f = make_fn(kind, niter, p)
                out = f(pages, rays)
                float(jnp.sum(out))  # warm + fence
                best = 1e30
                for _ in range(4):
                    t0 = time.time()
                    out = f(pages, rays)
                    float(jnp.sum(out))
                    best = min(best, time.time() - t0)
                times[niter] = best
            per = (times[40000] - times[20000]) / 20000
            print(f"P={p:4d} {kind:18s} {per*1e9:8.0f} ns/visit", flush=True)


if __name__ == "__main__":
    main()
