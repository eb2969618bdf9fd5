"""Device (JAX) single-domain renderer: jit-compiled wavefront integrator.

Same integrator body as the oracle (spray_tpu.integrators.wavefront), evaluated
under jax.numpy with a pluggable device intersector (brute / BVH-jnp / Pallas).
The per-sample function is jit'd once; spp is driven by lax.scan over sample
indices so one compilation covers any spp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geom
from ..kernels.common import tile_swizzle_order
from ..oracle.brute import BruteIntersector
from . import wavefront


def device_scene_arrays(scene):
    return wavefront.make_scene_arrays(scene, jnp)


def make_render_fn(scene, camera, cfg, intersector=None, donate=False,
                   with_stats=False, spp_batch=True):
    """Build a jit'd full-frame render fn: (scene_arrays) -> (H, W, 3) image
    (or (image, rays_traced) when with_stats — actual trace activations).

    spp_batch=True traces ALL spp samples as ONE wavefront (samples of the
    same pixel adjacent): coherence-sorting intersectors then pack ~spp
    same-pixel rays per packet, shrinking packet frustums and per-call fixed
    costs (sorts, culls) by ~spp.  The counter RNG keys on (pixel, sample),
    so the image is bit-identical either way.  spp_batch=False keeps the
    lax.scan-over-samples form (lower peak memory at very high spp).

    scene_arrays is passed as an argument (not closed over) so material /
    geometry gradients can flow through it (spray_tpu.diff builds on this).
    """
    if intersector is None:
        intersector = BruteIntersector(scene, jnp)
    npix = camera.width * camera.height
    # Tile-swizzled trace order: ray packets = compact image tiles.  The
    # counter RNG keys on pixel id, so trace order cannot change the image.
    pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))

    # The intersector is a registered pytree passed as a jit ARGUMENT: closing
    # over it would bake its BVH arrays in as HLO constants that XLA re-streams
    # to the kernel every execution (~80x slower frames; see core/pytree.py).
    # pixel_ids is passed as a jit ARGUMENT: closed over, a 512^2*u32 order
    # array lowers to megabytes of inline HLO constant text (r4: constant
    # serialization, not XLA, dominated cold compile)
    @functools.partial(jax.jit, static_argnames=("spp",))
    def render(scene_arrays, isect, pids, spp):
        def body(carry, s):
            acc, nr = carry
            rad, n = wavefront.sample_wavefront(
                scene_arrays, camera, cfg, isect, jnp, s, pids,
                with_stats=True,
            )
            return (acc + rad, nr + n), None

        (acc, nrays), _ = jax.lax.scan(
            body,
            (jnp.zeros((npix, 3), jnp.float32), jnp.zeros((), jnp.float32)),
            jnp.arange(spp, dtype=jnp.uint32),
        )
        img = jnp.zeros((npix, 3), jnp.float32).at[pids].set(acc)
        img = img * jnp.float32(1.0 / spp)
        return img.reshape(camera.height, camera.width, 3), nrays

    @functools.partial(jax.jit, static_argnames=("spp",))
    def render_batched(scene_arrays, isect, pids, spp):
        pix = jnp.repeat(pids, spp)
        smp = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), npix)
        rad, nrays = wavefront.sample_wavefront(
            scene_arrays, camera, cfg, isect, jnp, smp, pix, with_stats=True,
        )
        img = jnp.zeros((npix, 3), jnp.float32).at[pix].add(rad)
        img = img * jnp.float32(1.0 / spp)
        return img.reshape(camera.height, camera.width, 3), nrays

    fn = render_batched if spp_batch else render
    if with_stats:
        return lambda scene_arrays: fn(scene_arrays, intersector, pixel_ids,
                                       cfg.spp)
    return lambda scene_arrays: fn(scene_arrays, intersector, pixel_ids,
                                   cfg.spp)[0]


def render_device(scene, camera, cfg, intersector=None):
    """Convenience: render a scene on the default JAX backend.

    Host-driven intersectors (e.g. the out-of-core epoch scheduler, which does
    residency I/O between epochs like the reference's disk loads) cannot be
    traced into a jitted scan; those run the eager wavefront loop — jnp ops
    still execute on device, only the epoch control flow is host-side.
    """
    if getattr(intersector, "host_driven", False):
        img = wavefront.render(scene, camera, cfg, intersector, jnp)
        return np.asarray(img)
    arrays = device_scene_arrays(scene)
    fn = make_render_fn(scene, camera, cfg, intersector)
    return np.asarray(fn(arrays))
