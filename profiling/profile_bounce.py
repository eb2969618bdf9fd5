"""Isolate bounce-pass intersect cost + candidate stats (dev tool)."""
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
o, d = camera_rays = geom.camera_rays(camera, ids, z, z, jnp)
tmin = jnp.zeros(npix); tmax = jnp.full(npix, np.inf)

# primary hits -> bounce rays (cosine hemisphere, like the integrator)
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

p, nd, win = mk_bounce(o, d, h)
print("bounce rays live:", int(np.asarray(win > 0).sum()), flush=True)

# candidate stats for sorted bounce wavefront
key = B.sort_key(p, nd, jnp.zeros(npix), win, bi.world_lo, bi.world_hi)
perm = jnp.argsort(key, stable=True)
aug, _ = B._rays_to_aug(p[perm], nd[perm], jnp.zeros(npix)[perm], win[perm])
@jax.jit
def stats(aug, sbox):
    iv = B.packet_intervals(aug)
    entry = B.supernode_entries(iv, sbox)
    return jnp.sum(jnp.isfinite(entry), axis=1)
cnt = np.asarray(stats(aug, bi.sbox))
print("bounce candidates/packet: mean %.0f p50 %.0f p90 %.0f max %d" % (
    cnt.mean(), np.percentile(cnt,50), np.percentile(cnt,90), cnt.max()), flush=True)
print("rounds ub (k=4):", int(np.ceil(cnt.max()/4)), flush=True)

# time the bounce intersect
t0 = time.time(); h2 = f(p, nd, jnp.zeros(npix), win, bi); _ = np.asarray(h2.t)
print("bounce intersect compile+first", time.time()-t0, flush=True)
ts = []
for _ in range(3):
    t0 = time.time(); h2 = f(p, nd, jnp.zeros(npix), win, bi)
    _ = np.asarray(h2.t); ts.append(time.time()-t0)
print(f"bounce nearest: {min(ts)*1e3:.1f} ms -> {npix/min(ts)/1e6:.2f} Mrays/s", flush=True)
