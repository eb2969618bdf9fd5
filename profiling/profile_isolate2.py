"""Re-measure multidomain intersect honestly (force host materialization)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core.geom import camera_rays
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
from spray_tpu.kernels.common import tile_swizzle_order

SIZE = 512
t0 = time.time()
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
print("scene built", time.time()-t0, flush=True)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
npix = SIZE*SIZE
t0 = time.time()
mi = MultiDomainClusterIntersector(scene)
print("intersector built", time.time()-t0, "n_domains", mi.n_domains, flush=True)
for order_name, ids in (("tiled", jnp.asarray(tile_swizzle_order(SIZE, SIZE))),
                        ("raster", jnp.arange(npix, dtype=jnp.uint32))):
    z = jnp.zeros(npix)
    o, d = camera_rays(camera, ids, z, z, jnp)
    tmin = jnp.zeros(npix); tmax = jnp.full(npix, np.inf)
    f = jax.jit(lambda o, d, a, b, i: i.intersect(o, d, a, b).t)
    t0 = time.time()
    out = f(o, d, tmin, tmax, mi); _ = np.asarray(out)
    print("compile+first", time.time()-t0, flush=True)
    ts = []
    for _i in range(5):
        t0 = time.time(); out = f(o, d, tmin, tmax, mi)
        s = float(np.asarray(out).sum()); ts.append(time.time() - t0)
    print(f"  {order_name}: {min(ts)*1e3:.2f} ms  (sum {s:.3e})  -> {npix/min(ts)/1e6:.1f} Mrays/s", flush=True)
