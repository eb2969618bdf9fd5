"""Differentiable path: finite-difference checks for albedo + vertex grads
(BASELINE.md config 2's gradient requirement, scaled down for CI)."""

import jax
import jax.numpy as jnp
import numpy as np

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.diff import make_diff_render_fn
from spray_tpu.io.scenes import cornell_box, icosphere

CAM = make_camera(
    eye=(0.5, 0.5, 2.2), lookat=(0.5, 0.5, 0.0), up=(0, 1, 0),
    fov_y_deg=40, width=24, height=24,
)


def _loss_fn(render):
    def loss(params):
        img = render(params)
        return jnp.mean(img * jnp.array([0.4, 0.8, 1.3]))  # asymmetric weights

    return jax.jit(loss), jax.jit(jax.grad(loss))


def test_albedo_gradients_fd():
    scene = cornell_box()
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=11)
    render = make_diff_render_fn(scene, CAM, cfg)
    loss, grad = _loss_fn(render)
    params = {"albedo": jnp.asarray(scene.albedo)}
    g = grad(params)["albedo"]
    assert np.isfinite(np.asarray(g)).all()
    # FD check on the 5 largest-|g| entries
    ga = np.asarray(g)
    flat = np.argsort(-np.abs(ga).ravel())[:5]
    eps = 1e-3
    for idx in flat:
        f, c = np.unravel_index(idx, ga.shape)
        e = np.zeros_like(ga)
        e[f, c] = eps
        lp = float(loss({"albedo": jnp.asarray(scene.albedo + e)}))
        lm = float(loss({"albedo": jnp.asarray(scene.albedo - e)}))
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - ga[f, c]) <= 1e-4 + 0.05 * abs(fd), (
            f"albedo grad mismatch at {(f, c)}: ad={ga[f, c]:.6f} fd={fd:.6f}"
        )


def test_ao_vertex_gradients_are_zero_by_design():
    """AO output is pure visibility; with detached visibility the vertex
    gradient is exactly zero.  Pin that semantic so regressions are loud."""
    scene = icosphere(subdiv=2, center=(0.5, 0.5, 0.3), radius=0.25)
    cfg = RenderConfig(spp=1, integrator="ao", ao_samples=2, seed=4)
    render = make_diff_render_fn(scene, CAM, cfg)
    _, grad = _loss_fn(render)
    g = np.asarray(grad({"vertices": jnp.asarray(scene.vertices)})["vertices"])
    assert np.isfinite(g).all()
    np.testing.assert_array_equal(g, 0)


def test_vertex_gradients_fd():
    # PT with NEE: geometry enters the estimator continuously (shading point,
    # normal, light geometry term), so vertex grads are nonzero and FD-checkable.
    from spray_tpu.io.scenes import merge_scenes

    scene = merge_scenes(
        [cornell_box(), icosphere(subdiv=1, center=(0.5, 0.35, 0.35), radius=0.18)]
    )
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", nee=True, seed=4)
    render = make_diff_render_fn(scene, CAM, cfg)
    loss, grad = _loss_fn(render)
    v0 = jnp.asarray(scene.vertices)
    g = grad({"vertices": v0})["vertices"]
    ga = np.asarray(g)
    assert np.isfinite(ga).all()
    assert np.abs(ga).max() > 0
    # FD spot-check against the FULLY LIVE renderer: the occluder moves WITH
    # the perturbed vertices (rebuild the intersector per evaluation).  The
    # frozen-visibility AD gradient equals this FD away from silhouette
    # crossings; FD against a frozen occluder would instead flip self-shadow
    # tests for any vertex on visible geometry (verified superlinear-in-eps).
    import dataclasses

    def live_loss(vnew):
        s2 = dataclasses.replace(scene, vertices=np.asarray(vnew, np.float32))
        render2 = make_diff_render_fn(s2, CAM, cfg)
        img = render2({"vertices": jnp.asarray(vnew)})
        return float(jnp.mean(img * jnp.array([0.4, 0.8, 1.3])))

    order = np.argsort(-np.abs(ga).ravel())[:3]
    eps = 2e-4
    v0n = np.asarray(v0)
    for idx in order:
        vi, c = np.unravel_index(idx, ga.shape)
        e = np.zeros_like(v0n)
        e[vi, c] = eps
        fd = (live_loss(v0n + e) - live_loss(v0n - e)) / (2 * eps)
        assert abs(fd - ga[vi, c]) <= 2e-3 + 0.1 * abs(fd), (
            f"vertex grad mismatch at {(vi, c)}: ad={ga[vi, c]:.6f} fd={fd:.6f}"
        )


def test_emission_gradients_nonzero():
    scene = cornell_box()
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", seed=0)
    render = make_diff_render_fn(scene, CAM, cfg)
    _, grad = _loss_fn(render)
    g = grad({"emission": jnp.asarray(scene.emission)})["emission"]
    ga = np.asarray(g)
    assert np.isfinite(ga).all()
    assert (np.abs(ga).sum(axis=1) > 0).any()
