"""Round-5: frame-level A/B of cluster page formats on the bench scene.

The r5_prestack microbench went noisy run-to-run (tunnel timing variance),
so the decision is made at the frame level: forward-only 512^2 spp1 bounces2
on the 2.6M-tri wisp bench, MultiDomainClusterIntersector, page format =
  f32   : compact (4, 3C) f32 pages, in-kernel split assembly (r4 prod)
  bf16k : pre-stacked (32, 3C) bf16 pages (r5)
Host-fenced min-of-N frame times.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.integrators.device import make_render_fn, device_scene_arrays
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector


def main():
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=512, height=512,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=0)

    isect = MultiDomainClusterIntersector(scene)  # bf16k pages (r5 default)
    # rebuild the compact f32 pages for the A side from the host build
    from spray_tpu.kernels.multidomain import build_cluster_domains

    st = build_cluster_domains(scene)
    w_f32 = jnp.asarray(st["w"])

    arrays = device_scene_arrays(scene)
    fn = make_render_fn(scene, camera, cfg, intersector=isect,
                        with_stats=True)

    w_bf16k = isect.w
    imgs = {}
    for routed in ("grid", "global"):
        isect.routed = routed
        for fmt, w in (("bf16k", w_bf16k), ("f32", w_f32)):
            isect.w = w
            t0 = time.time()
            img, nr = fn(arrays)
            s = float(jnp.sum(img))  # fence + warm
            warm = time.time() - t0
            best = 1e30
            for _ in range(3):
                t0 = time.time()
                img, nr = fn(arrays)
                s = float(jnp.sum(img))
                best = min(best, time.time() - t0)
            imgs[(routed, fmt)] = np.asarray(img)
            print(f"{routed:7s} {fmt:6s} frame_s={best:.3f} "
                  f"warm={warm:.1f} sum={s:.4f}", flush=True)
    ref = imgs[("grid", "bf16k")]
    for k, v in imgs.items():
        print(k, "byte-identical to grid/bf16k:", np.array_equal(ref, v))


if __name__ == "__main__":
    main()
