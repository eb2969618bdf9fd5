"""On-TPU in-situ (collective) renderer gate (VERDICT r4 next#7).

Promotes profiling/r4_insitu_tpu.py's mesh-of-1 measurement to a per-round
gate: the collective in-situ path (Pallas cluster kernels inside shard_map,
bucketed all_to_all router, epoch while_loop) must run COMPILED on the real
chip, stay within 3x of the non-collective fast path on the same scene
(r4 measured 1.39x; 3x is the regression alarm, not the target), and agree
with it to float-accumulation tolerance.

Run:  python tests_tpu/insitu_gate.py        (needs the TPU; ~2 min)
Exit code 0 = gate passed; prints one INSITU_GATE json line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent / ".." / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.dist.epochs import make_insitu_renderer
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector


def main():
    scene = wisp_cloud(n_blobs=8, tris_per_blob=16384, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=128, height=128,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=0)

    mesh = Mesh(np.array(jax.devices()[:1]), ("dev",))
    render = make_insitu_renderer(
        scene, camera, cfg, mesh, n_domains=8, bucket=1 << 14,
        backend="cluster",
    )
    img = render()  # compile + warm
    best = 1e30
    for _ in range(2):
        t0 = time.time()
        img = render()
        best = min(best, time.time() - t0)
    insitu_s = best

    from spray_tpu.integrators.device import (
        device_scene_arrays, make_render_fn,
    )

    isect = MultiDomainClusterIntersector(scene, n_domains=8)
    arrays = device_scene_arrays(scene)
    fn = make_render_fn(scene, camera, cfg, isect)
    ref = np.asarray(fn(arrays))  # warm
    best = 1e30
    for _ in range(2):
        t0 = time.time()
        ref = np.asarray(fn(arrays))
        best = min(best, time.time() - t0)
    direct_s = best

    diff = float(np.abs(np.asarray(img) - ref).max())
    ratio = insitu_s / direct_s
    # parity: same commits, same RNG; only the min-combine order can differ
    # -> float-accumulation-level tolerance
    ok = bool(diff <= 1e-4 and ratio <= 3.0)
    print("INSITU_GATE " + json.dumps({
        "ok": ok,
        "insitu_s": round(insitu_s, 3),
        "direct_s": round(direct_s, 3),
        "ratio": round(ratio, 2),
        "max_img_diff": diff,
        "epochs": render.last_stats["epochs"],
        "exchanged": render.last_stats["rays_exchanged"],
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
