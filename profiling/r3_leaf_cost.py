"""Decompose the 3.4us leaf visit: matmul passes vs decode vs reduce.

Variants (all fori_loop over NITER iterations, cid varies per iter):
  leaf_highest : dot_general HIGHEST (6 bf16 passes) + full decode  [baseline]
  leaf_default : dot_general DEFAULT (1 bf16 pass, lossy) + decode
  leaf_3pass   : manual hi/lo split 3-pass f32 emulation + decode
  mm_only      : HIGHEST matmul + min-reduce only (no decode)
  decode_only  : decode on a loop-carried fake odp (no matmul)
  leaf2        : TWO clusters per dot_general (M=768), full decode -> /2
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
NC = 256
F32 = jnp.float32


def decode(odp, best, c):
    op, dp = odp[:, 0:P], odp[:, P:]
    ou, ov, ow = op[0:c], op[c:2*c], op[2*c:]
    du, dv, dw = dp[0:c], dp[c:2*c], dp[2*c:]
    dw_ok = jnp.abs(dw) > F32(1e-20)
    t = -ow / jnp.where(dw_ok, dw, F32(1.0))
    u = ou + t * du
    v = ov + t * dv
    ok = dw_ok & (t >= 0) & (t < best) & (u >= 0) & (v >= 0) & (u + v <= 1)
    tm = jnp.where(ok, t, jnp.inf)
    trow = jnp.min(tm, axis=0, keepdims=True)
    return jnp.minimum(best, trow)


def run(kind, niter):
    def kernel(w_ref, od_ref, out_ref):
        od8 = od_ref[...]
        dn = (((0,), (0,)), ((), ()))

        def body(i, best):
            cid = jax.lax.rem(i, NC)
            if kind == "leaf2":
                cid2 = jax.lax.rem(i + 1, NC)
                wmat = jnp.concatenate(
                    [w_ref[cid], w_ref[cid2]], axis=1
                )  # (4, 6C)
                odp = jax.lax.dot_general(
                    wmat, od8, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (6C, 2P)
                best = decode(odp[0:3*C], best, C)
                return decode(odp[3*C:], best, C)
            wmat = w_ref[cid]
            if kind == "leaf_3pass":
                wh = (wmat.astype(jnp.bfloat16)).astype(F32)
                wl = wmat - wh
                oh = (od8.astype(jnp.bfloat16)).astype(F32)
                ol = od8 - oh
                d_ = jax.lax.Precision.DEFAULT
                odp = (
                    jax.lax.dot_general(wh, oh, dn,
                                        preferred_element_type=F32,
                                        precision=d_)
                    + jax.lax.dot_general(wh, ol, dn,
                                          preferred_element_type=F32,
                                          precision=d_)
                    + jax.lax.dot_general(wl, oh, dn,
                                          preferred_element_type=F32,
                                          precision=d_)
                )
                return decode(odp, best, C)
            prec = (jax.lax.Precision.DEFAULT if kind == "leaf_default"
                    else jax.lax.Precision.HIGHEST)
            if kind == "decode_only":
                odp = od8[0:4].repeat(96, axis=0) + best[0:1, 0:1]
                return decode(odp, best, C)
            odp = jax.lax.dot_general(
                wmat, od8, dn, preferred_element_type=jnp.float32,
                precision=prec,
            )
            if kind == "mm_only":
                return jnp.minimum(
                    best, jnp.min(odp[:, 0:P], axis=0, keepdims=True)
                )
            return decode(odp, best, C)

        out_ref[...] = jax.lax.fori_loop(
            0, niter, body, jnp.full((1, P), 1e30, F32)
        )

    np.random.seed(0)
    w = jnp.asarray(np.random.randn(NC, 4, 3 * C).astype(np.float32))
    od = jnp.asarray(np.random.randn(4, 2 * P).astype(np.float32))
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32)
    ))
    out = f(w, od)
    _ = float(jnp.sum(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(w, od)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n1, n2 = 16384, 65536
    for kind in ("leaf_highest", "leaf_default", "leaf_3pass", "mm_only",
                 "decode_only", "leaf2"):
        t1 = run(kind, n1)
        t2 = run(kind, n2)
        per = (t2 - t1) / (n2 - n1)
        div = 2.0 if kind == "leaf2" else 1.0
        print(f"{kind:14s} {per*1e9/div:8.0f} ns/cluster  "
              f"(t{n1}={t1*1e3:.1f}ms t{n2}={t2*1e3:.1f}ms)", flush=True)


if __name__ == "__main__":
    main()
