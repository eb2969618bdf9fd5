"""Microbench: per-cluster-visit cost in a Pallas fori loop (dev tool).

Measures the serial floor of one 'visit' (cluster intersection against a
512-ray packet) under different shapes:
  - matmul (4,3C)x(4,2P) HIGHEST vs DEFAULT precision
  - stacked B clusters per iteration
  - decode-only (VPU elementwise) cost
  - empty-loop iteration overhead
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 512
C = 128
NITER = 512
NC = 256  # resident clusters in VMEM (256*6KB = 1.6MB)


def mk_kernel(body_fn, n_out_rows=1):
    def kernel(w_ref, od_ref, out_ref):
        def body(i, acc):
            return body_fn(i, acc, w_ref, od_ref)
        acc0 = jnp.zeros((n_out_rows, P), jnp.float32)
        acc = jax.lax.fori_loop(0, NITER, body, acc0)
        out_ref[...] = acc
    return kernel


def run(name, body_fn, n_out_rows=1):
    w = jnp.asarray(np.random.randn(NC, 4, 3 * C).astype(np.float32))
    od = jnp.asarray(np.random.randn(4, 2 * P).astype(np.float32))
    f = pl.pallas_call(
        mk_kernel(body_fn, n_out_rows),
        out_shape=jax.ShapeDtypeStruct((n_out_rows, P), jnp.float32),
    )
    g = jax.jit(f)
    out = g(w, od); out.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time(); out = g(w, od); out.block_until_ready()
        ts.append(time.time() - t0)
    per = min(ts) / NITER * 1e9
    print(f"{name}: {min(ts)*1e3:.3f} ms total, {per:.0f} ns/iter", flush=True)


def matmul_visit(prec, b):
    def body(i, acc, w_ref, od_ref):
        cid = jax.lax.rem(i, NC // b) * b
        wmat = w_ref[pl.ds(cid, b)].reshape(4, b * 3 * C) if False else None
        # gather b clusters stacked on rows: (4, b*3C)
        ws = [w_ref[cid + k] for k in range(b)]
        wmat = jnp.concatenate(ws, axis=1)  # (4, b*3C)
        dn = (((0,), (0,)), ((), ()))
        odp = jax.lax.dot_general(
            wmat, od_ref[...], dn, preferred_element_type=jnp.float32,
            precision=prec,
        )  # (b*3C, 2P)
        return acc + odp[0:1, 0:P]
    return body


def decode_only(i, acc, w_ref, od_ref):
    # emulate the elementwise decode on (C, P) blocks
    cid = jax.lax.rem(i, NC)
    w0 = w_ref[cid]  # (4, 3C)
    op = jnp.broadcast_to(od_ref[0:1, 0:P], (C, P)) + w0[0, 0]
    dp = jnp.broadcast_to(od_ref[1:2, 0:P], (C, P)) + w0[0, 1]
    dw_ok = jnp.abs(dp) > 1e-20
    t = -op / jnp.where(dw_ok, dp, 1.0)
    u = op + t * dp
    v = op - t * dp
    ok = dw_ok & (t >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
    tm = jnp.where(ok, t, np.inf)
    return jnp.minimum(acc, jnp.min(tm, axis=0, keepdims=True))


def empty(i, acc, w_ref, od_ref):
    return acc + jnp.float32(i)


def full_visit(prec, b):
    mm = matmul_visit(prec, b)
    def body(i, acc, w_ref, od_ref):
        cid = jax.lax.rem(i, NC // b) * b
        ws = [w_ref[cid + k] for k in range(b)]
        wmat = jnp.concatenate(ws, axis=1)
        dn = (((0,), (0,)), ((), ()))
        odp = jax.lax.dot_general(
            wmat, od_ref[...], dn, preferred_element_type=jnp.float32,
            precision=prec,
        )  # (b*3C, 2P)
        op = odp[:, 0:P]
        dp = odp[:, P:]
        best = acc
        for k in range(b):
            ou = op[k*3*C:(k*3*C)+C]; ov = op[k*3*C+C:k*3*C+2*C]; ow = op[k*3*C+2*C:k*3*C+3*C]
            du = dp[k*3*C:(k*3*C)+C]; dv = dp[k*3*C+C:k*3*C+2*C]; dw = dp[k*3*C+2*C:k*3*C+3*C]
            dw_ok = jnp.abs(dw) > 1e-20
            t = -ow / jnp.where(dw_ok, dw, 1.0)
            u = ou + t * du
            v = ov + t * dv
            ok = dw_ok & (t >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
            tm = jnp.where(ok, t, np.inf)
            best = jnp.minimum(best, jnp.min(tm, axis=0, keepdims=True))
        return best
    return body


H = jax.lax.Precision.HIGHEST
D = jax.lax.Precision.DEFAULT
run("empty loop           ", empty)
run("matmul B=1 HIGHEST   ", matmul_visit(H, 1))
run("matmul B=1 DEFAULT   ", matmul_visit(D, 1))
run("matmul B=4 HIGHEST   ", matmul_visit(H, 4))
run("matmul B=4 DEFAULT   ", matmul_visit(D, 4))
run("matmul B=8 DEFAULT   ", matmul_visit(D, 8))
run("decode only          ", decode_only)
run("full visit B=1 HIGH  ", full_visit(H, 1))
run("full visit B=4 HIGH  ", full_visit(H, 4))
run("full visit B=4 DEF   ", full_visit(D, 4))
