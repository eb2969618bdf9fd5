"""Ray-sharded distributed render on the 8-device CPU mesh == single-device.

SURVEY.md §4: 'multi-host == single-host' rung of the equivalence ladder —
changing WHERE rays live must never change the image.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.dist.rayshard import (
    make_mesh, make_sharded_render_grad, padded_pixel_ids, sharded_render,
)
from spray_tpu.integrators.device import render_device
from spray_tpu.io.scenes import cornell_box

CAM = make_camera(
    eye=(0.5, 0.5, 2.2), lookat=(0.5, 0.5, 0.0), up=(0, 1, 0),
    fov_y_deg=40, width=40, height=40,  # 1600 px, not divisible by 8 shards? 1600/8=200 ok
)


def test_sharded_forward_matches_single_device():
    scene = cornell_box()
    cfg = RenderConfig(spp=2, bounces=2, integrator="pt", seed=9)
    mesh = make_mesh(8)
    img_sharded = sharded_render(scene, CAM, cfg, mesh)
    img_single = np.asarray(render_device(scene, CAM, cfg))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-5, rtol=1e-5)


def test_sharded_grads_match_single_device():
    from spray_tpu.diff import make_diff_render_fn

    scene = cornell_box()
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=3)
    mesh = make_mesh(8)
    step = make_sharded_render_grad(scene, CAM, cfg, mesh)
    ids, npix = padded_pixel_ids(CAM, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ids_dev = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("dev")))
    params = {"albedo": jnp.asarray(scene.albedo)}
    img, loss, grads = step(params, ids_dev)

    # single-device reference
    render = make_diff_render_fn(scene, CAM, cfg)
    w = jnp.array([0.4, 0.8, 1.3])

    def ref_loss(p):
        im = render(p)
        return jnp.sum(im * w) / jnp.float32(npix * 3)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(grads["albedo"]), np.asarray(ref_g["albedo"]),
        rtol=1e-4, atol=1e-7,
    )
    assert np.isfinite(np.asarray(img)).all()
