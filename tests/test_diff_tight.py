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
