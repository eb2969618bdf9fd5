"""Bisect b0 sample_wavefront internals (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax
import jax.numpy as jnp

from spray_tpu.core.camera import make_camera
from spray_tpu.core import geom, rng
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector
from spray_tpu.integrators import device

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
mi = MultiDomainClusterIntersector(scene)
arrays = device.device_scene_arrays(scene)
npix = SIZE * SIZE
ids = jnp.arange(npix, dtype=jnp.uint32)

def bench(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time(); out = f(*args); jax.block_until_ready(out)
    c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*args); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms (compile {c:.1f}s)", flush=True)

def mkrays(s):
    jx = rng.uniform(0, ids, s, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, ids, s, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    return geom.camera_rays(camera, ids, jx, jy, jnp)

bench("a: rays only", lambda s: mkrays(s), jnp.uint32(0))

def b(s, isect):
    o, d = mkrays(s)
    tmin = jnp.zeros(npix); tmax = jnp.full(npix, geom.INF)
    return isect.intersect(o, d, tmin, tmax)
bench("b: rays+intersect", b, jnp.uint32(0), mi)

def c(s, isect, arrays):
    hits = b(s, isect)
    return arrays["emission"][hits.prim]
bench("c: +emission gather", c, jnp.uint32(0), mi, arrays)

def dfn(s, isect, arrays):
    hits = b(s, isect)
    em = arrays["emission"][hits.prim]
    alive = jnp.ones(npix, bool)
    hit = alive & hits.valid
    tp = jnp.ones((npix, 3))
    rad = jnp.where((alive & ~hits.valid)[..., None], tp * jnp.asarray([0.,0.,0.]), 0)
    return rad + jnp.where(hit[..., None], tp * em, 0)
bench("d: full b0-equiv", dfn, jnp.uint32(0), mi, arrays)
