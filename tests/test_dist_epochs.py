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


def test_insitu_cluster_and_jnp_backends_agree():
    """r4: the distributed local trace defaults to the Pallas cluster
    kernels (VERDICT r3 next#4); the jnp-BVH backend remains as the
    semantics cross-check — both must produce the single-device image."""
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=4)
    mesh = make_mesh(8)
    img_c = make_insitu_renderer(
        SCENE, CAM, cfg, mesh, n_domains=16, bucket=256, backend="cluster"
    )()
    img_j = make_insitu_renderer(
        SCENE, CAM, cfg, mesh, n_domains=16, bucket=256, backend="jnp"
    )()
    ref = np.asarray(render_device(SCENE, CAM, cfg))
    np.testing.assert_allclose(img_c, ref, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(img_j, ref, atol=2e-3, rtol=1e-3)


def test_insitu_diff_matches_single_device_grads():
    """Config 5's differentiable half (VERDICT r3 missing#2): backward
    THROUGH the 64-domain domain-sharded in-situ renderer — vertex + albedo
    grads psum'd over the mesh must equal the single-device detached-
    visibility gradients to 1e-5."""
    import jax
    import jax.numpy as jnp

    from spray_tpu.dist.epochs import make_insitu_diff_fn
    from spray_tpu.diff import make_diff_render_fn

    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=3)
    mesh = make_mesh(8)
    step = make_insitu_diff_fn(SCENE, CAM, cfg, mesh, n_domains=64,
                               bucket=256)
    params = {
        "vertices": jnp.asarray(SCENE.vertices),
        "albedo": jnp.asarray(SCENE.albedo),
    }
    loss_d, grads_d = step(params)

    render = make_diff_render_fn(SCENE, CAM, cfg)
    w = jnp.asarray([0.4, 0.8, 1.3], jnp.float32)

    @jax.jit
    def ref_step(p, isect):
        return jax.value_and_grad(
            lambda q: jnp.mean(render(q, isect) * w)
        )(p)

    loss_r, grads_r = ref_step(params, render.base_intersector)
    np.testing.assert_allclose(float(loss_d), float(loss_r), rtol=1e-5)
    for k in ("vertices", "albedo"):
        gd, gr = np.asarray(grads_d[k]), np.asarray(grads_r[k])
        assert np.isfinite(gd).all()
        scale = np.abs(gr).max()
        assert scale > 0
        np.testing.assert_allclose(gd, gr, atol=1e-5 * scale, rtol=1e-4)


def test_insitu_functional_stats_and_rounds_per_check():
    """r5: the dist bounce loop runs as a lax.scan with the functional
    stats protocol — the renderer's structured counters must be populated
    and sane; rounds_per_check=2 (multi-round per liveness barrier) must
    reproduce the image with at most one extra (no-op) round per loop."""
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=6)
    mesh = make_mesh(8)
    render = make_insitu_renderer(
        SCENE, CAM, cfg, mesh, n_domains=16, bucket=256
    )
    img = render()
    stats = render.last_stats
    assert stats["epochs"] > 0
    assert stats["rays_exchanged"] > 0
    assert stats["trace_activations"] > 0

    from spray_tpu.dist import epochs as de

    orig = de.CollectiveEpochIntersector.__init__

    def patched(self, *a, **k):
        k["rounds_per_check"] = 2
        orig(self, *a, **k)

    de.CollectiveEpochIntersector.__init__ = patched
    try:
        render2 = make_insitu_renderer(
            SCENE, CAM, cfg, mesh, n_domains=16, bucket=256
        )
        img2 = render2()
    finally:
        de.CollectiveEpochIntersector.__init__ = orig
    np.testing.assert_allclose(img2, img, atol=1e-6, rtol=1e-6)
    # at most one surplus no-op round per while loop
    assert render2.last_stats["rays_exchanged"] == stats["rays_exchanged"]
