"""Inspect optimized HLO of the rays-only fn (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax
import jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core import geom, rng

SIZE = 512
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
npix = SIZE * SIZE
ids = jnp.arange(npix, dtype=jnp.uint32)

def mkrays(s):
    jx = rng.uniform(0, ids, s, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, ids, s, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    return geom.camera_rays(camera, ids, jx, jy, jnp)

t0 = time.time()
lowered = jax.jit(mkrays).lower(jnp.uint32(0))
print("lower:", time.time() - t0, flush=True)
t0 = time.time()
compiled = lowered.compile()
print("compile:", time.time() - t0, flush=True)
hlo = compiled.as_text()
print("HLO lines:", len(hlo.splitlines()))
# op histogram
import re, collections
ops = collections.Counter()
for line in hlo.splitlines():
    m = re.match(r"\s*%?[\w.-]+ = \S+ (\w+)\(", line)
    if m:
        ops[m.group(1)] += 1
for k, v in ops.most_common(20):
    print(f"{k}: {v}")
# timing
f = compiled
t0 = time.time(); out = f(jnp.uint32(0)); jax.block_until_ready(out)
print("first run:", time.time() - t0)
for _ in range(3):
    t0 = time.time(); out = f(jnp.uint32(0)); jax.block_until_ready(out)
    print("run:", time.time() - t0)
# also: trivial op timing for launch overhead
g = jax.jit(lambda x: x + 1.0).lower(jnp.zeros(npix)).compile()
jax.block_until_ready(g(jnp.zeros(npix)))
t0 = time.time()
for _ in range(10):
    jax.block_until_ready(g(jnp.zeros(npix)))
print("x+1 launch avg:", (time.time() - t0) / 10)
