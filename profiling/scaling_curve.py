"""Mesh-scaling overhead curve (VERDICT r2 next#4/#7; BASELINE.md >=85%
host-scaling stand-in).

Real multi-host scaling cannot be measured on this machine (one TPU chip).
What CAN be measured: the distribution machinery's OVERHEAD as the mesh
grows.  On a virtual CPU mesh all 'devices' share the same host cores, so at
FIXED TOTAL WORK perfect sharding keeps wall time flat as ndev grows —
any rise is the cost of the collectives/routing the sharding adds
(strong-scaling overhead, the quantity the 85% target actually taxes).

Prints one JSON object:
  {"1": {...}, "2": {...}, ...} with frame_s and efficiency = t_1 / t_n
for BOTH distributed paths (rayshard DP grad step; in-situ epoch renderer).

Run on CPU:  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
             python profiling/scaling_curve.py
(bench.py --suite invokes it exactly that way and embeds the result.)
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
import jax.numpy as jnp

from spray_tpu.bvh.traverse import BVHIntersector
from spray_tpu.dist.epochs import make_insitu_renderer
from spray_tpu.dist.rayshard import make_sharded_render_grad, padded_pixel_ids
from spray_tpu.io.scenes import wisp_cloud


def timed(fn, iters=3):
    fn()  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    scene = wisp_cloud(n_blobs=4, tris_per_blob=1024, seed=5)
    camera = make_camera(
        eye=(10.0, 8.0, 14.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=64, height=64,
    )
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=0)
    devices = jax.devices()
    out = {}
    base = {}
    for ndev in (1, 2, 4, 8):
        if ndev > len(devices):
            break
        mesh = Mesh(np.array(devices[:ndev]), ("dev",))
        row = {}
        # bucket scales with the per-device shard so total exchange volume
        # stays constant: a FIXED bucket made the epoch body O(ndev) per
        # device (measured 0.79s -> 4.78s from 1 -> 8 devices)
        npix = camera.width * camera.height
        render = make_insitu_renderer(
            scene, camera, cfg, mesh, n_domains=8,
            bucket=max(128, npix // ndev), max_epochs=32,
        )
        row["insitu_frame_s"] = round(timed(render), 4)
        step = make_sharded_render_grad(
            scene, camera, cfg, mesh,
            make_intersector=lambda s: BVHIntersector(s),
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        ids, _ = padded_pixel_ids(camera, ndev)
        pix = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P("dev"))
        )
        params = {
            "vertices": jnp.asarray(scene.vertices),
            "albedo": jnp.asarray(scene.albedo),
        }
        row["rayshard_step_s"] = round(timed(lambda: step(params, pix)), 4)
        for k in ("insitu_frame_s", "rayshard_step_s"):
            if ndev == 1:
                base[k] = row[k]
            row[k[:-2] + "_eff"] = round(base[k] / max(row[k], 1e-9), 3)
        out[str(ndev)] = row
        print(f"# ndev={ndev}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
