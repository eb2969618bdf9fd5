"""K-stacked split-bf16 matmul: one MXU pass with f32-class accuracy?

The Woop cluster test needs C = W^T @ OD with K=4.  HIGHEST (6-pass) costs
3.4us/cluster; DEFAULT (1-pass bf16) is 886ns but wrong by ~0.4% rel.
Idea: 3-way bf16 split of both operands, top-6 cross terms STACKED ALONG K
(K=24, one bf16 pass, f32 accumulate in the MXU):
    W' rows = [Wh Wh Wm Wm Wl Wm]  (parts of W)
    O' rows = [Oh Om Oh Ol Oh Om]  (parts of OD)
    sum_k W'[k] O'[k] = WhOh + WhOm + WmOh + WhOl + WlOh + WmOm
Error ~ 2^-35 x magnitude — f32-exact for geometry.  Measures ns/cluster and
max |err| vs HIGHEST on realistic-magnitude data.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

P = 512
C = 128
NC = 256
F32 = jnp.float32


def split3(x):
    h = x.astype(jnp.bfloat16).astype(F32)
    r = x - h
    m = r.astype(jnp.bfloat16).astype(F32)
    l = (r - m).astype(jnp.bfloat16)
    return h.astype(jnp.bfloat16), m.astype(jnp.bfloat16), l


def stack_k(w, od):
    """w (4, M) f32, od (4, N) f32 -> (24, M) bf16, (24, N) bf16."""
    wh, wm, wl = split3(w)
    oh, om, ol = split3(od)
    wk = jnp.concatenate([wh, wh, wm, wm, wl, wm], axis=0)
    ok = jnp.concatenate([oh, om, oh, ol, oh, om], axis=0)
    return wk, ok


def decode(odp, best, c):
    op, dp = odp[:, 0:P], odp[:, P:]
    ou, ov, ow = op[0:c], op[c:2*c], op[2*c:]
    du, dv, dw = dp[0:c], dp[c:2*c], dp[2*c:]
    dw_ok = jnp.abs(dw) > F32(1e-20)
    t = -ow / jnp.where(dw_ok, dw, F32(1.0))
    u = ou + t * du
    v = ov + t * dv
    ok = dw_ok & (t >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
    tm = jnp.where(ok, t, jnp.inf)
    trow = jnp.min(tm, axis=0, keepdims=True)
    return jnp.minimum(best, trow)


def run_speed(kind, niter):
    dn = (((0,), (0,)), ((), ()))

    def kernel(w_ref, od_ref, out_ref):
        od_all = od_ref[...]

        def body(i, best):
            cid = jax.lax.rem(i, NC)
            wmat = w_ref[cid]
            if kind == "k24":
                odp = jax.lax.dot_general(
                    wmat, od_all, dn, preferred_element_type=F32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            else:
                odp = jax.lax.dot_general(
                    wmat, od_all, dn, preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            return decode(odp, best, C)

        out_ref[...] = jax.lax.fori_loop(
            0, niter, body, jnp.full((1, P), 1e30, F32)
        )

    np.random.seed(0)
    w = np.random.randn(NC, 4, 3 * C).astype(np.float32) * 50
    od = np.random.randn(4, 2 * P).astype(np.float32) * 20
    if kind == "k24":
        wk, odk = jax.vmap(lambda wi: stack_k(wi, jnp.asarray(od)))(
            jnp.asarray(w)
        )
        wk = np.asarray(wk)
        odk = np.asarray(odk[0])
        args = (jnp.asarray(wk), jnp.asarray(odk))
    else:
        args = (jnp.asarray(w), jnp.asarray(od))
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32)
    ))
    out = f(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    # accuracy first (plain XLA, same arithmetic)
    np.random.seed(1)
    dn = (((0,), (0,)), ((), ()))
    w = jnp.asarray(np.random.randn(4, 3 * C).astype(np.float32) * 50)
    od = jnp.asarray(np.random.randn(4, 2 * P).astype(np.float32) * 20)
    exact = jax.lax.dot_general(
        w, od, dn, preferred_element_type=F32,
        precision=jax.lax.Precision.HIGHEST,
    )
    wk, odk = stack_k(w, od)
    approx = jax.lax.dot_general(
        wk, odk, dn, preferred_element_type=F32,
        precision=jax.lax.Precision.DEFAULT,
    )
    default = jax.lax.dot_general(
        w, od, dn, preferred_element_type=F32,
        precision=jax.lax.Precision.DEFAULT,
    )
    scale = float(jnp.max(jnp.abs(exact)))
    err24 = float(jnp.max(jnp.abs(approx - exact)))
    errd = float(jnp.max(jnp.abs(default - exact)))
    print(f"magnitude ~{scale:.1f}; max|err| k24={err24:.3e} "
          f"default={errd:.3e}  (rel: {err24/scale:.2e} vs {errd/scale:.2e})",
          flush=True)

    n1, n2 = 16384, 65536
    for kind in ("highest", "k24"):
        t1 = run_speed(kind, n1)
        t2 = run_speed(kind, n2)
        per = (t2 - t1) / (n2 - n1)
        print(f"{kind:8s} {per*1e9:8.0f} ns/cluster", flush=True)


if __name__ == "__main__":
    main()
