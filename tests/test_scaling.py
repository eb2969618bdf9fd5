"""Weak-scaling efficiency regression gate (VERDICT r3 next#6; BASELINE.md
>=85% host-scaling target).

Methodology (see profiling/scaling_curve.py): work scales with the mesh and
the baseline is the SAME work run as independent per-device renders with the
SAME intersector machinery — efficiency = t_independent / t_distributed is
the fraction of embarrassingly-parallel throughput that survives the
distribution machinery.  This test keeps a coarse floor on the rayshard DP
path at 4 devices; the full curve (both paths, 1-8 devices) is produced by
bench.py --suite into BENCH_extra.json.
"""

import os
import time

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spray_tpu.bvh.traverse import BVHIntersector
from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.dist.rayshard import make_sharded_render_grad, padded_pixel_ids
from spray_tpu.integrators import wavefront
from spray_tpu.io.scenes import wisp_cloud


def _timed(fn, iters=3):
    for x in jax.tree.leaves(fn()):
        np.asarray(x)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for x in jax.tree.leaves(fn()):
            np.asarray(x)
        ts.append(time.perf_counter() - t0)
    return min(ts)


@pytest.mark.skipif(
    os.environ.get("SPRAY_PERF_TESTS", "") == "0",
    reason="wall-clock perf assertion; set SPRAY_PERF_TESTS=0 to skip on "
    "loaded/shared CI machines (ADVICE r4) — the floor check also runs in "
    "bench.py --suite",
)
def test_rayshard_weak_scaling_efficiency_floor():
    ndev = 4
    devices = jax.devices()[:ndev]
    mesh = Mesh(np.array(devices), ("dev",))
    scene = wisp_cloud(n_blobs=4, tris_per_blob=512, seed=5)
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=0)
    camera = make_camera(
        eye=(10.0, 8.0, 14.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=64, height=32 * ndev,
    )
    isect = BVHIntersector(scene)
    arrays = wavefront.make_scene_arrays(scene, jnp)
    ids, _ = padded_pixel_ids(camera, ndev)
    per = len(ids) // ndev

    @jax.jit
    def tile_grad(arrays_, isect_, pix):
        def loss(alb):
            rad = wavefront.sample_wavefront(
                dict(arrays_, albedo=alb), camera, cfg, isect_, jnp,
                jnp.uint32(0), pix,
            )
            return jnp.mean(rad)

        val, g = jax.value_and_grad(loss)(arrays_["albedo"])
        return val + jnp.sum(g)

    dev_args = [
        (jax.device_put(arrays, dv), jax.device_put(isect, dv),
         jax.device_put(jnp.asarray(ids[i * per:(i + 1) * per]), dv))
        for i, dv in enumerate(devices)
    ]
    t_ind = _timed(lambda: [tile_grad(a, s, p) for a, s, p in dev_args])

    step = make_sharded_render_grad(
        scene, camera, cfg, mesh,
        make_intersector=lambda s: BVHIntersector(s),
    )
    pix_sh = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("dev")))
    params = {
        "vertices": jnp.asarray(scene.vertices),
        "albedo": jnp.asarray(scene.albedo),
    }
    t_dist = _timed(lambda: step(params, pix_sh))
    eff = t_ind / t_dist
    # measured ~0.94-0.99 on this harness; 0.6 is a loose regression floor
    # (CI-noise margin), the 0.85 target line is tracked in BENCH_extra.json
    assert eff >= 0.6, f"rayshard weak-scaling efficiency {eff:.2f} < 0.6"
