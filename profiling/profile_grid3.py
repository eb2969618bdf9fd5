"""Scratch accumulator + VPU Moller-Trumbore visit cost (real timing)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NV = 8192
P = 512
S = 2562
C = 128
np.random.seed(0)
rays = jnp.asarray(np.random.randn(P, 6, 1024).astype(np.float32))
tri9 = jnp.asarray(np.random.randn(S, 9, 8 * C).astype(np.float32))
in_t = jnp.asarray((np.random.rand(P, 1, 512) * 100 + 50).astype(np.float32))
pkt_of = jnp.asarray(np.repeat(np.arange(P, dtype=np.int32), NV // P))
sn_of = jnp.asarray(np.random.randint(0, S, NV).astype(np.int32))
nvp = NV // P
first = jnp.asarray(np.tile((np.arange(nvp) == 0).astype(np.int32), P))
last = jnp.asarray(np.tile((np.arange(nvp) == nvp - 1).astype(np.int32), P))

ray_dyn = pl.BlockSpec((1, 6, 1024), lambda v, pr, sr, fr, lr: (pr[v], 0, 0), memory_space=pltpu.VMEM)
tri_dyn = pl.BlockSpec((1, 9, 8 * C), lambda v, pr, sr, fr, lr: (sr[v], 0, 0), memory_space=pltpu.VMEM)
int_spec = pl.BlockSpec((1, 1, 512), lambda v, pr, sr, fr, lr: (pr[v], 0, 0), memory_space=pltpu.VMEM)

def run(name, in_specs, kernel, args, scratch):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(NV,), in_specs=in_specs,
        out_specs=int_spec, scratch_shapes=scratch)
    f = jax.jit(pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((P, 1, 512), jnp.float32)))
    out = f(*args); _ = np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*args); _ = np.asarray(out)
        ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms = {min(ts)/NV*1e9:.0f} ns/step", flush=True)

def k_scratch(pr, sr, fr, lr, rays_ref, it_ref, out_ref, acc):
    v = pl.program_id(0)
    @pl.when(fr[v] != 0)
    def _():
        acc[...] = it_ref[0]
    acc[...] = jnp.minimum(acc[...], rays_ref[0, 0:1, 0:512] + 200.0)
    @pl.when(lr[v] != 0)
    def _():
        out_ref[0] = acc[...]

def mt_cluster(o, d, t9, k, tmin, cur):
    s = k * C
    def col(r):
        return t9[r, s:s+C].reshape(C, 1)
    v0x, v0y, v0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)
    ox, oy, oz = o
    dx, dy, dz = d
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t >= tmin) & (t < cur)
    return jnp.where(ok, t, np.inf)

def k_mt(pr, sr, fr, lr, rays_ref, tri_ref, it_ref, out_ref, acc):
    v = pl.program_id(0)
    r = rays_ref[0]
    o = (r[0:1, 0:512], r[1:2, 0:512], r[2:3, 0:512])
    d = (r[0:1, 512:], r[1:2, 512:], r[2:3, 512:])
    tmin = r[4:5, 0:512]
    @pl.when(fr[v] != 0)
    def _():
        acc[...] = it_ref[0]
    t9 = tri_ref[0]
    cur = acc[...]
    best = cur
    for k in range(8):
        tm = mt_cluster(o, d, t9, k, tmin, best)
        best = jnp.minimum(best, jnp.min(tm, axis=0, keepdims=True))
    acc[...] = best
    @pl.when(lr[v] != 0)
    def _():
        out_ref[0] = acc[...]

args4 = (pkt_of, sn_of, first, last)
run("J scratch acc, no compute", [ray_dyn, int_spec], k_scratch,
    args4 + (rays, in_t), [pltpu.VMEM((1, 512), jnp.float32)])
run("K VPU MT 8 clusters/step ", [ray_dyn, tri_dyn, int_spec], k_mt,
    args4 + (rays, tri9, in_t), [pltpu.VMEM((1, 512), jnp.float32)])
