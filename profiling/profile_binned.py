"""Binned tracer vs multidomain routed on the bench scene (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core.geom import camera_rays
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.binned import BinnedIntersector
from spray_tpu.kernels.common import tile_swizzle_order

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
npix = SIZE*SIZE
K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
t0 = time.time()
bi = BinnedIntersector(scene, k=K)
print(f"built binned (k={K}, S={bi.sbox.shape[0]}) in {time.time()-t0:.1f}s", flush=True)
ids = jnp.asarray(tile_swizzle_order(SIZE, SIZE))
z = jnp.zeros(npix)
o, d = camera_rays(camera, ids, z, z, jnp)
tmin = jnp.zeros(npix); tmax = jnp.full(npix, np.inf)
f = jax.jit(lambda o, d, a, b, i: i.intersect(o, d, a, b))
t0 = time.time()
h = f(o, d, tmin, tmax, bi); jax.block_until_ready(h.t)
print(f"compile+first {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(5):
    t0 = time.time(); h = f(o, d, tmin, tmax, bi)
    tt = np.asarray(h.t); ts.append(time.time()-t0)
print(f"nearest: {min(ts)*1e3:.2f} ms -> {npix/min(ts)/1e6:.1f} Mrays/s; hits {int(np.asarray(h.valid).sum())}", flush=True)
# correctness vs the existing multidomain intersector
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
mi = MultiDomainClusterIntersector(scene)
fm = jax.jit(lambda o, d, a, b, i: i.intersect(o, d, a, b))
hm = fm(o, d, tmin, tmax, mi)
v1, v2 = np.asarray(h.valid), np.asarray(hm.valid)
print("valid mismatch:", int(np.sum(v1 != v2)), flush=True)
m = v1 & v2
t1, t2 = np.asarray(h.t)[m], np.asarray(hm.t)[m]
print("max |t| diff:", float(np.abs(t1-t2).max()), flush=True)
# occlusion timing
fo = jax.jit(lambda o, d, b, i: i.occluded(o, d, b))
occ = fo(o, d, tmax, bi); occ = np.asarray(occ)
ts = []
for _ in range(5):
    t0 = time.time(); occ2 = fo(o, d, tmax, bi); _ = np.asarray(occ2); ts.append(time.time()-t0)
print(f"anyhit: {min(ts)*1e3:.2f} ms -> {npix/min(ts)/1e6:.1f} Mrays/s; occ {int(occ.sum())}", flush=True)
