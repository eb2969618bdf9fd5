"""Ray/tile data parallelism over a device mesh (SURVEY.md §2b 'Work/ray
parallelism') + gradient all-reduce overlapped with backward (§2b 'Gradient
parallelism').

The reference splits the image plane into tiles across MPI ranks and
MPI-reduces the framebuffer (SURVEY.md §3.1); here pixels are sharded over a
1-D mesh axis with shard_map, each device renders its pixel shard against
(replicated or domain-sharded) scene arrays, the image stays sharded, and
parameter gradients are `psum`ed — XLA schedules the all-reduce concurrently
with remaining backward compute.

This module is the simple single-level mesh path; the epoch-scheduled
multi-domain exchange lives in spray_tpu.dist.epochs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import geom
from ..integrators import wavefront
from ..diff import DetachedIntersector, diff_scene_arrays
from ..oracle.brute import BruteIntersector


def make_mesh(n_devices=None, axis="dev"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def padded_pixel_ids(camera, n_shards):
    """Flat pixel ids padded to a multiple of n_shards (pad renders pixel 0)."""
    npix = camera.width * camera.height
    pad = (-npix) % n_shards
    ids = np.concatenate(
        [np.arange(npix, dtype=np.uint32), np.zeros(pad, np.uint32)]
    )
    return ids, npix


def make_sharded_render_grad(scene, camera, cfg, mesh, axis="dev",
                             make_intersector=None, loss_weights=(0.4, 0.8, 1.3)):
    """Returns jit'd step(params, pixel_ids) -> (image_flat, loss, grads).

    - pixel_ids sharded over `axis`; scene params replicated.
    - grads are psum'd inside shard_map (overlaps with backward under XLA's
      async collectives); the returned image stays sharded.
    """
    if make_intersector is None:
        make_intersector = lambda s: BruteIntersector(s, jnp)
    base_intersector = make_intersector(scene)
    w = jnp.asarray(np.asarray(loss_weights, np.float32))
    npix = camera.width * camera.height

    def local_render(params, pixel_ids, isect):
        arrays, vertices, faces = diff_scene_arrays(scene, params)
        intersector = DetachedIntersector(isect, vertices, faces)

        def body(acc, s):
            return acc + wavefront.sample_wavefront(
                arrays, camera, cfg, intersector, jnp, s, pixel_ids
            ), None

        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((pixel_ids.shape[0], 3), jnp.float32),
            jnp.arange(cfg.spp, dtype=jnp.uint32),
        )
        return acc / jnp.float32(cfg.spp)

    # the intersector rides through jit/shard_map as a REPLICATED pytree
    # argument — closing over it would re-stream its BVH per step
    # (core/pytree.py)
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )
    def step(params, pixel_ids, isect):
        def local_loss(p):
            img = local_render(p, pixel_ids, isect)
            # Global mean: per-shard sum / global pixel count; psum'd below.
            return jnp.sum(img * w) / jnp.float32(npix * 3), img

        (loss, img), grads = jax.value_and_grad(local_loss, has_aux=True)(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.lax.psum(grads, axis)
        return img, loss, grads

    jstep = jax.jit(step)
    return lambda params, pixel_ids: jstep(params, pixel_ids, base_intersector)


def sharded_render(scene, camera, cfg, mesh, axis="dev", make_intersector=None):
    """Forward-only sharded render -> (H, W, 3) numpy image."""
    if make_intersector is None:
        make_intersector = lambda s: BruteIntersector(s, jnp)
    intersector = make_intersector(scene)
    arrays = wavefront.make_scene_arrays(scene, jnp)
    n_shards = mesh.shape[axis]
    ids, npix = padded_pixel_ids(camera, n_shards)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P(), P()), out_specs=P(axis),
        check_vma=False,
    )
    def run(pixel_ids, arrs, isect):
        def body(acc, s):
            return acc + wavefront.sample_wavefront(
                arrs, camera, cfg, isect, jnp, s, pixel_ids
            ), None

        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((pixel_ids.shape[0], 3), jnp.float32),
            jnp.arange(cfg.spp, dtype=jnp.uint32),
        )
        return acc / jnp.float32(cfg.spp)

    sharding = NamedSharding(mesh, P(axis))
    img = run(
        jax.device_put(jnp.asarray(ids), sharding), arrays, intersector
    )
    return np.asarray(img)[:npix].reshape(camera.height, camera.width, 3)
