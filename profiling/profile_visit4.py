import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

P, C, NC = 512, 128, 256

def mk(niter, slicemode):
    def kernel(w_ref, od_ref, out_ref):
        def body(i, acc):
            cid = jax.lax.rem(i, NC)
            if slicemode == "ds":
                wmat = w_ref[cid]
            elif slicemode == "static":
                wmat = w_ref[0]
            odp = jax.lax.dot_general(wmat, od_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            op = odp[:, 0:P]; dp = odp[:, P:]
            ow = op[2*C:3*C]; dw = dp[2*C:3*C]
            ou = op[0:C]; du = dp[0:C]; ov = op[C:2*C]; dv = dp[C:2*C]
            dw_ok = jnp.abs(dw) > 1e-20
            t = -ow / jnp.where(dw_ok, dw, 1.0)
            u = ou + t * du; v = ov + t * dv
            ok = dw_ok & (t >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
            return jnp.minimum(acc, jnp.min(jnp.where(ok, t, np.inf), axis=0, keepdims=True))
        out_ref[...] = jax.lax.fori_loop(0, niter, body, jnp.full((1, P), np.inf, jnp.float32))
    return kernel

np.random.seed(0)
w = jnp.asarray(np.random.randn(NC, 4, 3 * C).astype(np.float32))
od = jnp.asarray(np.random.randn(4, 2 * P).astype(np.float32))
for slicemode in ("ds", "static"):
    for niter in (256, 384, 512, 768, 1024):
        f = jax.jit(pl.pallas_call(mk(niter, slicemode), out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32)))
        out = f(w, od); out.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.time(); out = f(w, od); out.block_until_ready()
            ts.append(time.time() - t0)
        tot = min(ts)
        print(f"{slicemode} niter={niter}: {tot*1e3:.3f} ms, {tot/niter*1e9:.0f} ns/iter", flush=True)
