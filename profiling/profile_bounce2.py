"""Instrument the cascade: rounds + live counts per phase (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core import geom, rng as rngmod
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels import binned as B
from spray_tpu.kernels.common import tile_swizzle_order

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
npix = SIZE*SIZE
bi = B.BinnedIntersector(scene, k=4)
ids = jnp.asarray(tile_swizzle_order(SIZE, SIZE))
z = jnp.zeros(npix)
o, d = geom.camera_rays(camera, ids, z, z, jnp)
tmin = jnp.zeros(npix); tmax = jnp.full(npix, np.inf)
f = jax.jit(lambda o, d, a, b, i: i.intersect(o, d, a, b))
h = f(o, d, tmin, tmax, bi)
normals = geom.face_normals(jnp.asarray(scene.vertices), jnp.asarray(scene.faces), jnp)

@jax.jit
def mk_bounce(o, d, h):
    n = normals[jnp.maximum(h.prim, 0)]
    sgn = jnp.where(geom.dot(n, d, jnp) < 0, 1.0, -1.0)
    n = n * sgn[..., None]
    t_safe = jnp.where(h.valid, h.t, 1.0)
    p = o + t_safe[..., None] * d + n * 1e-3
    u1 = rngmod.uniform(0, ids, 0, 7, jnp); u2 = rngmod.uniform(0, ids, 0, 8, jnp)
    local = geom.cosine_hemisphere(u1, u2, jnp)
    nd = geom.local_to_world(local, n, jnp)
    win = jnp.where(h.valid, np.inf, 0.0)
    return p, nd, win

o2, d2, win = mk_bounce(o, d, h)
tmin2 = jnp.zeros(npix)
# replicate intersect() preprocessing
tmax_eff = bi._clamp_exit(o2, d2, tmin2, win)
o_, d_, tmin_, tmax_ = bi._pad_flat(o2, d2, tmin2, tmax_eff)
perm = bi._perm(o_, d_, tmin_, tmax_)
o_, d_, tmin_, tmax_ = o_[perm], d_[perm], tmin_[perm], tmax_[perm]

# run phases manually with diagnostics
tri9, cbox, sbox = bi.tri9, bi.cbox, bi.sbox
npad = o_.shape[0]; p = npad // B.PACKET
best_t = tmax_; best_code = jnp.full(npad, -1, jnp.int32)
idx = jnp.arange(npad, dtype=jnp.int32)
state = (o_, d_, tmin_, best_t, best_code, idx)
sizes = B._phase_sizes(p, bi.k, sbox.shape[0])
print("sizes:", sizes, flush=True)
phase_j = jax.jit(B._phase_nearest, static_argnames=("p_sub", "k", "last_phase", "interpret"))
for i, (p_sub, kk) in enumerate(sizes):
    last = i == len(sizes)-1
    cap_next = 0 if last else sizes[i+1][0] * B.PACKET
    t0 = time.time()
    out = phase_j(tri9, cbox, sbox, state, p_sub=p_sub, k=kk,
                  cap_next=cap_next, last_phase=last, interpret=False)
    _ = np.asarray(out[3]); dt1 = time.time() - t0
    t0 = time.time()
    out = phase_j(tri9, cbox, sbox, state, p_sub=p_sub, k=kk,
                  cap_next=cap_next, last_phase=last, interpret=False)
    _ = np.asarray(out[3]); dt2 = time.time() - t0
    state = out
    _, _, tf, bt, _, _ = state
    live = int(np.asarray((bt > tf).sum()))
    print(f"phase {i}: p_sub={p_sub} k={kk} first {dt1:.2f}s steady {dt2:.2f}s live_after={live}", flush=True)
    state = B._compact(state, (bt <= tf).astype(jnp.int32))
