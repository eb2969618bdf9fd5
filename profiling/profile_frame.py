"""Decompose bench frame time: fwd-only vs fwd+bwd, spp=1 vs 4 (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.render import make_pipeline

scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=512, height=512)

for name, bwd, spp, bounces in [
    ("fwd spp1 b0", False, 1, 0),
    ("fwd spp1 b2", False, 1, 2),
    ("fwd spp4 b2", False, 4, 2),
    ("bwd spp1 b0", True, 1, 0),
    ("bwd spp1 b2", True, 1, 2),
]:
    cfg = RenderConfig(spp=spp, bounces=bounces, integrator="pt", seed=0)
    pipe = make_pipeline(scene, camera, cfg, backward=bwd)
    t0 = time.time(); pipe.run(); c = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time(); pipe.run(); ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms (compile {c:.1f}s)", flush=True)
