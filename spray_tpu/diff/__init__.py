"""Differentiable rendering path (new surface required by BASELINE.json's
north star; no reference counterpart — SURVEY.md §3.5).

Strategy (SURVEY.md §7.1 'Differentiability bolted to the commit'):
  - The intersector produces DISCRETE results (prim ids) plus detached t/u/v.
  - `reintersect` recomputes (t, u, v) for the committed triangle *analytically
    in jnp* from the (differentiable) vertex array → gradients w.r.t. vertices.
  - Shading consumes (differentiable) albedo/emission arrays → material grads.
  - Visibility (which prim is hit / is a lane occluded) is piecewise-constant
    and deliberately detached: gradients are exact for shading/geometry of the
    fixed visibility configuration (no silhouette-edge terms in the MVP).

Public API: `render_grad` (loss + grads), `make_diff_render_fn`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geom, rng
from ..core.pytree import register_intersector_pytree
from ..core.types import Hits
from ..integrators import wavefront
from ..oracle.brute import BruteIntersector


def reintersect(vertices, faces, prim, o, d, tmax, valid):
    """Differentiably recompute (t, u, v, n) for committed prim ids.

    vertices participates in autodiff; prim/o/d are treated as constants by the
    caller's custom structure (o/d of secondary rays DO carry gradients from
    earlier bounces' geometry — we keep that path open by not detaching them).
    """
    safe = jnp.where(valid, prim, 0)
    # barrier on the big vertex gather — see integrators.wavefront.pgather
    # (the gather+transpose fusion pathology cost ~75s of backward compile)
    tv = jax.lax.optimization_barrier(
        vertices[faces[safe].reshape(-1)].reshape(-1, 3, 3)
    )
    v0, v1, v2 = tv[:, 0], tv[:, 1], tv[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    t, u, v, ok = geom.moller_trumbore(o, d, v0, e1, e2, jnp)
    # Where the discrete pass said "hit", the analytic recompute must agree;
    # guard non-hits so no NaN/inf leaks into grads.
    t = jnp.where(valid & ok, t, tmax)
    n = geom.normalize(geom.cross(e1, e2, jnp), jnp)
    return t, u, v, n


@register_intersector_pytree(leaves=("inner", "vertices", "faces"))
class DetachedIntersector:
    """Wraps an intersector: stops gradients through the discrete search.

    The wrapped intersector may consume non-differentiable prebuilt arrays
    (BVH, Pallas tri SoA); this class re-derives differentiable hit attributes
    via `reintersect` against the live vertex/face arrays.
    """

    def __init__(self, inner, vertices, faces):
        self.inner = inner
        self.vertices = vertices
        self.faces = faces

    @property
    def host_driven(self):
        # integrator-control flags follow the wrapped intersector
        return getattr(self.inner, "host_driven", False)

    # functional stats protocol (integrators.wavefront): present only when
    # the wrapped intersector has it (the dist collective).  `stats_init`
    # is a property returning the inner's bound method or None, so
    # getattr(self, "stats_init", None) keeps working as the detection.
    @property
    def stats_init(self):
        return getattr(self.inner, "stats_init", None)

    def intersect_s(self, o, d, tmin, tmax, stats):
        h, stats = self.inner.intersect_s(
            jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
            jax.lax.stop_gradient(tmin), jax.lax.stop_gradient(tmax),
            stats,
        )
        t, u, v, _ = reintersect(
            self.vertices, self.faces, h.prim, o, d, tmax, h.valid
        )
        return Hits(t=t, prim=h.prim, u=u, v=v, valid=h.valid), stats

    def occluded_s(self, o, d, tmax, stats):
        occ, stats = self.inner.occluded_s(
            jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
            jax.lax.stop_gradient(tmax), stats,
        )
        return occ, stats

    def absorb_stats(self, stats):
        self.inner.absorb_stats(stats)

    def intersect(self, o, d, tmin, tmax):
        # ALL inputs to the discrete search are detached (tmin/tmax carry
        # tangents from earlier bounces' t / light distances; an undetached
        # window would JVP-trace the Pallas kernels, which have no jvp rule).
        h = self.inner.intersect(
            jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
            jax.lax.stop_gradient(tmin), jax.lax.stop_gradient(tmax),
        )
        t, u, v, _ = reintersect(
            self.vertices, self.faces, h.prim, o, d, tmax, h.valid
        )
        return Hits(t=t, prim=h.prim, u=u, v=v, valid=h.valid)

    def occluded(self, o, d, tmax):
        return self.inner.occluded(
            jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
            jax.lax.stop_gradient(tmax),
        )


def diff_scene_arrays(scene, params, consts=None):
    """Shading arrays from differentiable params {'vertices','albedo','emission'}.

    Normals are recomputed in jnp from the live vertices so vertex gradients
    flow through shading normals too.

    consts: optional dict {'faces','emission',...} of scene arrays passed
    through the caller's jit AS ARGUMENTS.  Without it the closure falls back
    to inlining them as HLO constants — at bench scale (2.6M faces) those two
    constants alone were 126 MB of StableHLO text and ~200s of the 311s cold
    'compile' was just SERIALIZING them (measured r4).
    """
    consts = consts or {}
    vertices = params.get("vertices", jnp.asarray(scene.vertices))
    faces = consts.get("faces")
    if faces is None:
        faces = jnp.asarray(scene.faces)
    albedo = params.get("albedo", jnp.asarray(scene.albedo))
    emission = params.get("emission", consts.get("emission"))
    if emission is None:
        emission = jnp.asarray(scene.emission)
    normals = geom.face_normals(vertices, faces, jnp)
    lids = wavefront.light_ids_static(scene)
    return {
        "albedo": albedo,
        "emission": emission,
        "normals": normals,
        "offset_eps": wavefront.scene_offset_eps(scene),
        # Rebuilt from LIVE vertices/emission: light position, normal, area and
        # radiance all carry gradients through the NEE estimator.
        "lights": wavefront.make_light_arrays(vertices, faces, emission, lids, jnp),
    }, vertices, faces


def make_diff_render_fn(scene, camera, cfg, make_intersector=None,
                        with_stats=False, spp_batch=True):
    """Returns render(params) -> image, differentiable w.r.t. params
    (or (image, rays_traced) when with_stats — actual trace activations).
    spp_batch: trace all spp samples as one wavefront (see
    integrators.device.make_render_fn); image is bit-identical either way.

    params: dict with any of 'vertices' (V,3), 'albedo' (F,3), 'emission' (F,3).
    NOTE: when 'vertices' is present the discrete intersector still uses the
    ORIGINAL geometry (visibility configuration is frozen at build time); the
    analytic attributes use the live vertices.  This is the detached-visibility
    model — exact for infinitesimal perturbations off silhouettes.
    """
    if make_intersector is None:
        make_intersector = lambda s: BruteIntersector(s, jnp)
    base_intersector = make_intersector(scene)
    npix = camera.width * camera.height
    from ..kernels.common import tile_swizzle_order  # noqa: PLC0415

    pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))
    # Large non-differentiable scene arrays, for jitted callers to pass as
    # ARGUMENTS (see diff_scene_arrays: inlined, they dominate cold compile)
    const_pack = {
        "faces": jnp.asarray(scene.faces),
        "emission": jnp.asarray(scene.emission),
        "pixel_ids": pixel_ids,
    }

    def render(params, isect=None, consts=None):
        # isect: pass the base intersector (a registered pytree) through the
        # CALLER's jit as an argument — a jitted caller that lets this default
        # close over base_intersector bakes its BVH in as re-streamed HLO
        # constants (~80x slower; see core/pytree.py).  Same for consts
        # (render.consts): eager callers may omit both.
        if isect is None:
            isect = base_intersector
        if consts is None:
            consts = const_pack
        arrays, vertices, faces = diff_scene_arrays(scene, params, consts)
        intersector = DetachedIntersector(isect, vertices, faces)
        pids = consts.get("pixel_ids", pixel_ids)

        if spp_batch:
            pix = jnp.repeat(pids, cfg.spp)
            smp = jnp.tile(jnp.arange(cfg.spp, dtype=jnp.uint32), npix)
            rad, nrays = wavefront.sample_wavefront(
                arrays, camera, cfg, intersector, jnp, smp, pix,
                with_stats=True,
            )
            acc = jnp.zeros((npix, 3), jnp.float32).at[pix].add(rad)
        else:
            def body(carry, s):
                a, nr = carry
                rad, n = wavefront.sample_wavefront(
                    arrays, camera, cfg, intersector, jnp, s, pids,
                    with_stats=True,
                )
                return (a + rad, nr + n), None

            (acc, nrays), _ = jax.lax.scan(
                body,
                (jnp.zeros((npix, 3), jnp.float32),
                 jnp.zeros((), jnp.float32)),
                jnp.arange(cfg.spp, dtype=jnp.uint32),
            )
            acc = jnp.zeros((npix, 3), jnp.float32).at[pids].set(acc)
        img = (acc / cfg.spp).reshape(camera.height, camera.width, 3)
        return (img, nrays) if with_stats else img

    render.base_intersector = base_intersector
    render.consts = const_pack
    return render


def render_grad(scene, camera, cfg, params, loss_fn=None, make_intersector=None):
    """Convenience: (loss, grads) for given params under loss_fn(image)."""
    if loss_fn is None:
        loss_fn = lambda img: jnp.mean(img)
    render = make_diff_render_fn(scene, camera, cfg, make_intersector)

    @jax.jit
    def lg(params, isect):
        return jax.value_and_grad(lambda p: loss_fn(render(p, isect)))(params)

    return lg(params, render.base_intersector)
