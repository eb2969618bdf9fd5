"""Public API (SURVEY.md §7.2 step 9): render / render_grad / make_pipeline.

Picks the best available intersector for the backend (Pallas kernels on TPU,
jnp BVH elsewhere) and wraps the forward(+backward) frame step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .bvh.traverse import BVHIntersector
from .core.config import RenderConfig
from .diff import make_diff_render_fn
from .integrators.device import device_scene_arrays, make_render_fn
from .oracle.brute import BruteIntersector


def default_intersector(scene, prefer="auto"):
    """Best intersector for the current backend / scene size.

    TPU: Pallas packet/cluster kernels (domain-split to fit VMEM).
    CPU: jnp BVH traversal (the Pallas interpreter is far slower), brute for
    tiny scenes.
    """
    ntris = int(np.asarray(scene.faces).shape[0])
    if prefer == "brute" or (prefer == "auto" and ntris <= 256):
        return BruteIntersector(scene, jnp)
    if prefer == "pallas" or (prefer == "auto" and jax.default_backend() == "tpu"):
        from .kernels.binned import BinnedIntersector  # noqa: PLC0415

        return BinnedIntersector(scene)
    if prefer == "multidomain":
        from .kernels.multidomain import MultiDomainClusterIntersector  # noqa: PLC0415

        return MultiDomainClusterIntersector(scene)
    return BVHIntersector(scene)


def render(scene, camera, cfg: RenderConfig = RenderConfig(), intersector=None):
    """Render a frame -> (H, W, 3) float32 numpy image."""
    if intersector is None:
        intersector = default_intersector(scene)
    fn = make_render_fn(scene, camera, cfg, intersector)
    return np.asarray(fn(device_scene_arrays(scene)))


@dataclasses.dataclass
class Pipeline:
    """A compiled frame step for benchmarking / training loops."""

    _fn: object
    _args: tuple

    def run(self):
        out = self._fn(*self._args)
        jax.block_until_ready(out)
        return out


def make_pipeline(scene, camera, cfg: RenderConfig, backward=False,
                  intersector=None):
    if intersector is None:
        intersector = default_intersector(scene)
    if not backward:
        fn = make_render_fn(scene, camera, cfg, intersector)
        return Pipeline(fn, (device_scene_arrays(scene),))

    render_fn = make_diff_render_fn(
        scene, camera, cfg, make_intersector=lambda s: intersector
    )
    w = jnp.asarray([0.4, 0.8, 1.3], jnp.float32)

    # intersector passed through jit as a pytree argument (core/pytree.py)
    @jax.jit
    def step(params, isect):
        def loss(p):
            img = render_fn(p, isect)
            return jnp.mean(img * w)

        return jax.value_and_grad(loss)(params)

    params = {
        "vertices": jnp.asarray(scene.vertices),
        "albedo": jnp.asarray(scene.albedo),
    }
    return Pipeline(step, (params, intersector))
