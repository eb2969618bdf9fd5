"""1e-4 gradient-accuracy demonstration (VERDICT r2 next#9; BASELINE.md
north star 'gradients match to 1e-4', config-2 class: ~100K-tri AO scene,
albedo gradients).

Tightness strategy: the AO integrator's image is EXACTLY LINEAR in albedo
(radiance = albedo[prim] * visibility, visibility albedo-independent), so a
central finite difference at h=1e-2 has zero truncation error — the FD/AD
gap isolates the AD path's own numerics (f32 accumulation, masking), which
the north star bounds at 1e-4.  The brute intersector keeps geometry exact
(no BVH/kernel approximation in the comparison).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.diff import make_diff_render_fn
from spray_tpu.io.scenes import bumpy_sphere
from spray_tpu.oracle.brute import BruteIntersector

CAM = make_camera(
    eye=(0.0, 0.2, 2.2), lookat=(0.0, 0.0, 0.0), up=(0, 1, 0),
    fov_y_deg=40, width=16, height=16,
)


def test_albedo_gradients_1e4_100k_tris():
    scene = bumpy_sphere(subdiv=6, center=(0.0, 0.0, 0.0), radius=0.8,
                         seed=2)  # 81920 tris: config-2 class
    assert scene.num_faces >= 80000
    cfg = RenderConfig(spp=1, integrator="ao", ao_samples=2, seed=7)
    render = make_diff_render_fn(
        scene, CAM, cfg, make_intersector=lambda s: BruteIntersector(s, jnp)
    )
    w = jnp.array([0.4, 0.8, 1.3])

    def loss(params):
        return jnp.mean(render(params) * w)

    loss_j = jax.jit(loss)
    grad_j = jax.jit(jax.grad(loss))

    albedo = jnp.asarray(scene.albedo)
    g = np.asarray(grad_j({"albedo": albedo})["albedo"])
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0

    h = 1e-2
    checked = 0
    for idx in np.argsort(-np.abs(g).ravel())[:5]:
        f, c = np.unravel_index(idx, g.shape)
        e = np.zeros_like(g)
        e[f, c] = h
        lp = float(loss_j({"albedo": jnp.asarray(scene.albedo + e)}))
        lm = float(loss_j({"albedo": jnp.asarray(scene.albedo - e)}))
        fd = (lp - lm) / (2 * h)
        assert abs(fd - g[f, c]) <= 1e-4, (
            f"albedo grad at {(f, c)}: ad={g[f, c]:.8f} fd={fd:.8f} "
            f"gap={abs(fd - g[f, c]):.2e} > 1e-4"
        )
        checked += 1
    assert checked == 5


def _vertex_1e4_case(make_intersector):
    """Shared body: AD vertex grads vs central FD of the SAME detached-
    visibility estimator (the intersector is frozen at build time, so FD
    differentiates exactly the function AD differentiates — no silhouette
    discontinuities; those are explicitly out of the MVP estimator per
    SURVEY.md §7.1).  NEE + one bounce on a smooth lit scene keeps the loss
    smooth so central FD at h=2e-3 has ~1e-5 truncation + ~1e-6 f32
    cancellation — comfortably inside the 1e-4 north-star line."""
    from spray_tpu.io.scenes import cornell_box, icosphere, merge_scenes

    base = cornell_box()
    n_base_verts = np.asarray(base.vertices).shape[0]
    scene = merge_scenes([
        base,
        icosphere(subdiv=2, center=(0.5, 0.35, 0.35), radius=0.18),
    ])
    cam = make_camera(
        eye=(0.5, 0.5, 2.2), lookat=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fov_y_deg=40, width=24, height=24,
    )
    cfg = RenderConfig(spp=1, bounces=1, integrator="pt", nee=True, seed=4)
    render = make_diff_render_fn(scene, cam, cfg,
                                 make_intersector=make_intersector)
    w = jnp.array([0.4, 0.8, 1.3])

    def loss(params):
        return jnp.mean(render(params) * w)

    loss_j = jax.jit(loss)
    grad_j = jax.jit(jax.grad(loss))
    v0 = np.asarray(scene.vertices)
    g = np.asarray(grad_j({"vertices": jnp.asarray(v0)})["vertices"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    # check the SMOOTH GEOMETRY PATCH (the sphere): walls/light vertices
    # carry the largest |g| but perturbing the LIGHT moves every shadow-ray
    # target across occlusion boundaries — step functions the detached-
    # visibility estimator deliberately excludes (measured: fd=-7.2 vs
    # ad=0.16 on a light vertex).  On the sphere the masks are stable at h
    # and the comparison isolates AD numerics, which is what 1e-4 bounds.
    g_sphere = g.copy()
    g_sphere[:n_base_verts] = 0.0

    def central(vi, c, h):
        e = np.zeros_like(v0)
        e[vi, c] = h
        lp = float(loss_j({"vertices": jnp.asarray(v0 + e)}))
        lm = float(loss_j({"vertices": jnp.asarray(v0 - e)}))
        return (lp - lm) / (2 * h)

    # Even on the sphere, an individual component can still cross a
    # self-shadowing mask boundary at finite h (e.g. a shadow ray grazing
    # the sphere itself) — a discontinuity the estimator excludes by
    # definition.  Screen those out by FD SELF-consistency: central
    # differences at h and h/4 agree to O(h^2) on smooth components and
    # diverge wildly across a step.  The screen never consults AD, so the
    # subsequent 1e-4 assertion is not circular.
    h = 1e-3
    checked = 0
    for idx in np.argsort(-np.abs(g_sphere).ravel())[:24]:
        if checked >= 5:
            break
        vi, c = np.unravel_index(idx, g.shape)
        fd_h = central(vi, c, h)
        fd_q = central(vi, c, h / 4)
        if abs(fd_h - fd_q) > 1e-4:
            continue  # mask flip inside [v-h, v+h]: not a smooth component
        assert abs(fd_q - g[vi, c]) <= 1e-4, (
            f"vertex grad at {(vi, c)}: ad={g[vi, c]:.8f} fd={fd_q:.8f} "
            f"gap={abs(fd_q - g[vi, c]):.2e} > 1e-4"
        )
        checked += 1
    assert checked >= 5, f"only {checked} smooth components found"


def test_vertex_gradients_1e4_brute():
    _vertex_1e4_case(lambda s: BruteIntersector(s, jnp))


def test_vertex_gradients_1e4_pallas_kernels():
    """Same 1e-4 bound with the DISCRETE visibility pass running the Pallas
    cluster kernels (VERDICT r3 next#8: 'through BOTH the brute and a
    Pallas-kernel visibility path')."""
    from spray_tpu.kernels.traverse import ClusterBVHIntersector

    _vertex_1e4_case(lambda s: ClusterBVHIntersector(s))
