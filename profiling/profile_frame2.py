"""Stage the binned-intersector frame: b0 -> b1 -> b2 (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.render import make_pipeline

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
for bounces in (0, 1, 2):
    cfg = RenderConfig(spp=1, bounces=bounces, integrator="pt", seed=0)
    pipe = make_pipeline(scene, camera, cfg, backward=False)
    t0 = time.time(); out = pipe.run(); img = np.asarray(out)
    print(f"b{bounces}: compile+first {time.time()-t0:.1f}s mean={img.mean():.4f}", flush=True)
    t0 = time.time(); out = pipe.run(); img = np.asarray(out)
    print(f"b{bounces}: steady {time.time()-t0:.3f}s", flush=True)
