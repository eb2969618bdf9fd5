"""Find binned-vs-multidomain t mismatches and adjudicate with brute force."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core.geom import camera_rays
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.binned import BinnedIntersector
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
from spray_tpu.kernels.common import tile_swizzle_order
from spray_tpu.core import geom

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
npix = SIZE*SIZE
bi = BinnedIntersector(scene, k=4)
mi = MultiDomainClusterIntersector(scene)
ids = jnp.asarray(tile_swizzle_order(SIZE, SIZE))
z = jnp.zeros(npix)
o, d = camera_rays(camera, ids, z, z, jnp)
tmin = jnp.zeros(npix); tmax = jnp.full(npix, np.inf)
f = jax.jit(lambda o, d, a, b, i: i.intersect(o, d, a, b))
h1 = f(o, d, tmin, tmax, bi)
h2 = f(o, d, tmin, tmax, mi)
t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
p1, p2 = np.asarray(h1.prim), np.asarray(h2.prim)
v1 = np.asarray(h1.valid)
bad = v1 & (np.abs(t1 - t2) > 1e-3)
print("mismatched rays:", int(bad.sum()), "of", int(v1.sum()), flush=True)
idxs = np.nonzero(bad)[0][:5]
on, dn = np.asarray(o), np.asarray(d)
verts = np.asarray(scene.vertices); faces = np.asarray(scene.faces)
tv = verts[faces.reshape(-1)].reshape(-1, 3, 3)
v0 = tv[:, 0]; e1 = tv[:, 1] - tv[:, 0]; e2 = tv[:, 2] - tv[:, 0]
for i in idxs:
    t, u, v, ok = geom.moller_trumbore(on[i][None, :], dn[i][None, :], v0, e1, e2, np)
    tmin_true = np.where(ok & (t >= 0), t, np.inf).min()
    amin = int(np.where(ok & (t >= 0), t, np.inf).argmin())
    print(f"ray {i}: binned t={t1[i]:.4f} prim={p1[i]}  multi t={t2[i]:.4f} prim={p2[i]}  true t={tmin_true:.4f} prim={amin}", flush=True)
