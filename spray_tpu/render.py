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

    TPU: routed multi-domain Pallas cluster kernels (domain-split to fit
    VMEM).  Round 2 shipped `BinnedIntersector` as the TPU default off a
    coherent-camera-ray microbenchmark; on the full path-traced frame
    (incoherent bounce + NEE shadow rays) it was measured 3.1x SLOWER e2e
    (3.86s vs 1.24s frame) with 18x the compile time (207s vs 11.6s) —
    reverted here (VERDICT r2 next#1).  Binned stays available via
    prefer="binned" for coherent primary-ray workloads.
    CPU: jnp BVH traversal (the Pallas interpreter is far slower), brute for
    tiny scenes.
    """
    ntris = int(np.asarray(scene.faces).shape[0])
    if prefer == "brute" or (prefer == "auto" and ntris <= 256):
        return BruteIntersector(scene, jnp)
    if prefer == "binned":
        from .kernels.binned import BinnedIntersector  # noqa: PLC0415

        return BinnedIntersector(scene)
    if prefer == "sweep":
        from .kernels.sweep import SweepIntersector  # noqa: PLC0415

        return SweepIntersector(scene)
    if prefer in ("pallas", "multidomain") or (
        prefer == "auto" and jax.default_backend() == "tpu"
    ):
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
    """A compiled frame step for benchmarking / training loops.

    rays_traced(out): actual trace activations of the last run (honest
    Grays/s numerator), or None for stats-less pipelines.
    """

    _fn: object
    _args: tuple
    _stats_index: int = -1

    def run(self):
        out = self._fn(*self._args)
        jax.block_until_ready(out)
        return out

    def run_fenced(self):
        """Run + force completion via a device->host readback of one output
        leaf.  jax.block_until_ready is not a reliable fence under the axon
        TPU tunnel (returns early on re-dispatch of an identical program);
        materializing any output of the single underlying executable is."""
        out = self._fn(*self._args)
        np.asarray(jax.tree.leaves(out)[-1])
        return out

    def rays_traced(self, out):
        if self._stats_index < 0:
            return None
        return float(out[self._stats_index])


def make_pipeline(scene, camera, cfg: RenderConfig, backward=False,
                  intersector=None):
    if intersector is None:
        intersector = default_intersector(scene)
    if not backward:
        fn = make_render_fn(scene, camera, cfg, intersector, with_stats=True)
        return Pipeline(fn, (device_scene_arrays(scene),), _stats_index=1)

    render_fn = make_diff_render_fn(
        scene, camera, cfg, make_intersector=lambda s: intersector,
        with_stats=True,
    )
    w = jnp.asarray([0.4, 0.8, 1.3], jnp.float32)

    # intersector AND the big non-differentiable scene arrays (faces,
    # emission, pixel order) pass through jit as ARGUMENTS — closed over,
    # they lower to giant HLO constants whose serialization alone was ~200s
    # of the cold compile at bench scale (r4 measurement)
    @jax.jit
    def step(params, isect, consts):
        def loss(p):
            img, nrays = render_fn(p, isect, consts)
            return jnp.mean(img * w), nrays

        (val, nrays), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, grads, nrays

    params = {
        "vertices": jnp.asarray(scene.vertices),
        "albedo": jnp.asarray(scene.albedo),
    }
    return Pipeline(
        step, (params, intersector, render_fn.consts), _stats_index=2
    )
