"""Weak-scaling efficiency on the virtual CPU mesh (VERDICT r3 next#6;
BASELINE.md >=85% host-scaling stand-in).

Real multi-host scaling cannot be measured on this machine (one TPU chip),
and a shared-core virtual mesh poisons both classic framings: r3's
fixed-work curve let per-device work shrink (fixed overheads dominated) and
its rayshard column exceeded 1.0 purely because more virtual devices used
more host cores.

r4 framing — artifact-free by construction:

  - WORK SCALES WITH THE MESH (image height = 32 * ndev: rays/device const).
  - The baseline at EVERY ndev is the same frame rendered as ndev
    INDEPENDENT per-device renders (each device gets its tile of pixels and
    a replicated scene, dispatched concurrently, no collectives) — the
    embarrassingly-parallel ceiling on the same cores.
  - efficiency = t_independent / t_distributed  (<= 1 up to noise):
    the fraction of perfectly-parallel throughput that SURVIVES the
    distribution machinery (all_to_all routing, psum liveness, bucket
    padding for in-situ; grad psum for rayshard) — exactly what the >=85%
    target taxes.

Prints one JSON object {"1": {...}, ...} for BOTH distributed paths.

Run on CPU:  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
             python profiling/scaling_curve.py
(bench.py --suite invokes it exactly that way and embeds the result.)
"""

import functools
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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spray_tpu.bvh.traverse import BVHIntersector
from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.dist.epochs import make_insitu_renderer
from spray_tpu.dist.rayshard import make_sharded_render_grad, padded_pixel_ids
from spray_tpu.integrators import wavefront
from spray_tpu.io.scenes import wisp_cloud


def fence(leaves):
    for x in leaves:
        np.asarray(x)


def timed(fn, iters=5):
    fence(jax.tree.leaves(fn()))  # compile/warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(jax.tree.leaves(fn()))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    scene = wisp_cloud(n_blobs=4, tris_per_blob=1024, seed=5)
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=0)
    devices = jax.devices()
    # each path's independent baseline traces with the SAME machinery as
    # that path (or the ratio measures intersector choice, not
    # distribution): cluster kernels for in-situ, jnp BVH for rayshard
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    isect_frame = MultiDomainClusterIntersector(
        scene, n_domains=8, routed=False
    )
    isect_grad = BVHIntersector(scene)
    arrays = wavefront.make_scene_arrays(scene, jnp)

    out = {}
    for ndev in (1, 2, 4, 8):
        if ndev > len(devices):
            break
        mesh = Mesh(np.array(devices[:ndev]), ("dev",))
        camera = make_camera(
            eye=(10.0, 8.0, 14.0), lookat=(0, 0, 0), up=(0, 1, 0),
            fov_y_deg=45, width=64, height=32 * ndev,
        )

        @functools.partial(jax.jit, static_argnames=("grad",))
        def tile_unit(arrays_, isect_, pix, grad, camera=camera):
            """Independent-tile unit: one sample over `pix`; grad=True adds
            the same detached-visibility backward the rayshard step runs."""
            if not grad:
                rad = wavefront.sample_wavefront(
                    arrays_, camera, cfg, isect_, jnp, jnp.uint32(0), pix,
                )
                return jnp.sum(rad)

            def loss(alb):
                a2 = dict(arrays_, albedo=alb)
                rad = wavefront.sample_wavefront(
                    a2, camera, cfg, isect_, jnp, jnp.uint32(0), pix,
                )
                return jnp.mean(rad)

            val, g = jax.value_and_grad(loss)(arrays_["albedo"])
            return val + jnp.sum(g)

        npix = camera.width * camera.height
        ids, _ = padded_pixel_ids(camera, ndev)
        per = len(ids) // ndev
        dev_args = {}
        for grad, base_isect in ((False, isect_frame), (True, isect_grad)):
            dev_args[grad] = []
            for i in range(ndev):
                dv = devices[i]
                dev_args[grad].append((
                    jax.device_put(arrays, dv),
                    jax.device_put(base_isect, dv),
                    jax.device_put(
                        jnp.asarray(ids[i * per:(i + 1) * per]), dv
                    ),
                ))

        def independent(grad):
            # all dispatches in flight before any fence: devices run
            # concurrently, exactly like the mesh program
            return [tile_unit(a, s, p, grad) for (a, s, p) in dev_args[grad]]

        row = {}
        t_ind = timed(lambda: independent(False))
        row["indep_frame_s"] = round(t_ind, 4)
        render = make_insitu_renderer(
            scene, camera, cfg, mesh, n_domains=8,
            bucket=max(128, npix // ndev), max_epochs=32,
        )
        t_ins = timed(render)
        row["insitu_frame_s"] = round(t_ins, 4)
        row["insitu_eff"] = round(min(t_ind / t_ins, 1.0), 3)
        row["insitu_eff_raw"] = round(t_ind / t_ins, 3)

        t_indg = timed(lambda: independent(True))
        row["indep_grad_s"] = round(t_indg, 4)
        step = make_sharded_render_grad(
            scene, camera, cfg, mesh,
            make_intersector=lambda s: BVHIntersector(s),
        )
        pix_sh = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P("dev"))
        )
        params = {
            "vertices": jnp.asarray(scene.vertices),
            "albedo": jnp.asarray(scene.albedo),
        }
        t_ray = timed(lambda: step(params, pix_sh))
        row["rayshard_step_s"] = round(t_ray, 4)
        row["rayshard_eff"] = round(min(t_indg / t_ray, 1.0), 3)
        row["rayshard_eff_raw"] = round(t_indg / t_ray, 3)
        out[str(ndev)] = row
        print(f"# ndev={ndev}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
