"""Verify visit microbench scales with NITER (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

P = 512
C = 128
NC = 256

def mk(niter, b, prec):
    def kernel(w_ref, od_ref, out_ref):
        def body(i, acc):
            cid = jax.lax.rem(i, NC // b) * b
            ws = [w_ref[cid + k] for k in range(b)]
            wmat = jnp.concatenate(ws, axis=1)
            dn = (((0,), (0,)), ((), ()))
            odp = jax.lax.dot_general(
                wmat, od_ref[...], dn, preferred_element_type=jnp.float32,
                precision=prec)
            op = odp[:, 0:P]; dp = odp[:, P:]
            best = acc
            for k in range(b):
                s = k*3*C
                ou, ov, ow = op[s:s+C], op[s+C:s+2*C], op[s+2*C:s+3*C]
                du, dv, dw = dp[s:s+C], dp[s+C:s+2*C], dp[s+2*C:s+3*C]
                dw_ok = jnp.abs(dw) > 1e-20
                t = -ow / jnp.where(dw_ok, dw, 1.0)
                u = ou + t * du; v = ov + t * dv
                ok = dw_ok & (t >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
                best = jnp.minimum(best, jnp.min(jnp.where(ok, t, np.inf), axis=0, keepdims=True))
            return best
        acc = jax.lax.fori_loop(0, niter, body, jnp.full((1, P), np.inf, jnp.float32))
        out_ref[...] = acc
    return kernel

np.random.seed(0)
w = jnp.asarray(np.random.randn(NC, 4, 3 * C).astype(np.float32))
od = jnp.asarray(np.random.randn(4, 2 * P).astype(np.float32))
for b, prec, niters in [
    (1, jax.lax.Precision.HIGHEST, (512, 4096)),
    (4, jax.lax.Precision.HIGHEST, (512, 4096)),
    (4, jax.lax.Precision.DEFAULT, (512, 4096)),
    (8, jax.lax.Precision.HIGHEST, (512, 2048)),
]:
    for niter in niters:
        f = jax.jit(pl.pallas_call(mk(niter, b, prec),
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32)))
        out = f(w, od); out.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.time(); out = f(w, od); out.block_until_ready()
            ts.append(time.time() - t0)
        tot = min(ts)
        print(f"b={b} prec={str(prec)[10:]} niter={niter}: {tot*1e3:.3f} ms, "
              f"{tot/niter*1e9:.0f} ns/iter, {tot/(niter*b)*1e9:.0f} ns/visit, sum={float(out.sum()):.3e}", flush=True)
