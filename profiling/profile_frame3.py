"""b0 only with stage prints (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.render import make_pipeline

SIZE = 256
t0=time.time()
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
print("scene", time.time()-t0, flush=True)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
cfg = RenderConfig(spp=1, bounces=0, integrator="pt", seed=0)
t0=time.time()
pipe = make_pipeline(scene, camera, cfg, backward=False)
print("pipeline built", time.time()-t0, flush=True)
t0 = time.time(); out = pipe.run(); print("first run returned", time.time()-t0, flush=True)
img = np.asarray(out)
print(f"b0 first total mean={img.mean():.6f}", flush=True)
t0 = time.time(); out = pipe.run(); img = np.asarray(out)
print(f"b0 steady {time.time()-t0:.3f}s", flush=True)
