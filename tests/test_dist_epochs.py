"""Config-5 rung on the 8-device CPU mesh: the fully-distributed in-situ epoch
renderer (domains sharded, bucketed all_to_all ray exchange) must produce the
single-device image (SURVEY.md §4 'multi-host == single-host')."""

import numpy as np

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.dist.epochs import make_insitu_renderer
from spray_tpu.dist.rayshard import make_mesh
from spray_tpu.integrators.device import render_device
from spray_tpu.io.scenes import wisp_cloud

SCENE = wisp_cloud(n_blobs=8, tris_per_blob=80, extent=4.0, seed=11)
CAM = make_camera(
    eye=(10, 7, 14), lookat=(0, 0, 0), up=(0, 1, 0),
    fov_y_deg=45, width=32, height=32,
)


def test_insitu_distributed_matches_single_device():
    cfg = RenderConfig(
        spp=1, bounces=2, integrator="pt", seed=6, background=(0.4, 0.5, 0.7)
    )
    mesh = make_mesh(8)
    render = make_insitu_renderer(
        SCENE, CAM, cfg, mesh, n_domains=16, bucket=256
    )
    img = render()
    ref = np.asarray(render_device(SCENE, CAM, cfg))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img, ref, atol=2e-3, rtol=1e-3)


def test_insitu_small_bucket_still_converges():
    """Bucket overflow spills rays to later epochs without changing results."""
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=2)
    mesh = make_mesh(8)
    render = make_insitu_renderer(
        SCENE, CAM, cfg, mesh, n_domains=8, bucket=32, max_epochs=128
    )
    img = render()
    ref = np.asarray(render_device(SCENE, CAM, cfg))
    np.testing.assert_allclose(img, ref, atol=2e-3, rtol=1e-3)
