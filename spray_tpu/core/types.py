"""Core SoA value types (pytrees) shared by the oracle and the TPU renderer.

The reference's per-ray C++ structs (SURVEY.md §2 R5/R12; reference mount empty,
behavioral spec only) become fixed-shape structure-of-arrays pytrees: a wavefront
of N rays is one `Rays` value whose fields are (N, ...) arrays.  All fields are
parallel arrays; a boolean/int mask (`alive`) replaces dynamic queue sizes so
every shape is static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def pytree_dataclass(cls=None, *, static=()):
    """A frozen dataclass registered as a JAX pytree.

    Fields named in ``static`` become aux data (hashable jit-time constants,
    e.g. image dimensions); all other fields are pytree children.
    """
    if cls is None:
        return lambda c: pytree_dataclass(c, static=static)
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    child_names = tuple(n for n in fields if n not in static)
    static_names = tuple(n for n in fields if n in static)

    def flatten(obj):
        children = [(jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in child_names]
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(child_names, children))
        kwargs.update(zip(static_names, aux))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(cls, flatten, unflatten)
    return cls


@pytree_dataclass
class Rays:
    """A wavefront of rays, SoA.  All arrays share leading shape (N,)."""

    o: Any  # (N, 3) f32 origin
    d: Any  # (N, 3) f32 direction (normalized)
    tmin: Any  # (N,) f32
    tmax: Any  # (N,) f32  (also doubles as max occlusion distance)
    pixel: Any  # (N,) u32 flat pixel id (RNG counter + framebuffer scatter target)
    alive: Any  # (N,) bool — lane participates in tracing

    @property
    def n(self):
        return self.o.shape[0]


@pytree_dataclass
class Hits:
    """Nearest-hit records for a wavefront.  Parallel to a `Rays` value.

    u/v are only meaningful from intersectors that recompute hit attributes
    against the committed triangle (the kernel/oracle paths via
    `attrs_for_prims`); distributed backends that return only (t, prim) over
    the wire without a triangle SoA at home fill u=v=0 (ADVICE r4 — no
    current consumer reads them, but don't build one on such a backend).
    """

    t: Any  # (N,) f32 hit distance (tmax where miss)
    prim: Any  # (N,) i32 global triangle id (-1 where miss)
    u: Any  # (N,) f32 barycentric (see docstring caveat)
    v: Any  # (N,) f32 barycentric
    valid: Any  # (N,) bool


@pytree_dataclass
class Scene:
    """Single-domain scene: triangle soup + per-face Lambertian material.

    Per-face albedo/emission keeps materials differentiable with no indirection
    (grads flow straight to the arrays).  Multi-domain scenes stack these padded
    (see spray_tpu.domains).
    """

    vertices: Any  # (V, 3) f32
    faces: Any  # (F, 3) i32
    albedo: Any  # (F, 3) f32
    emission: Any  # (F, 3) f32

    @property
    def num_faces(self):
        return self.faces.shape[0]

    def tri_vertices(self, xp):
        """(F, 3, 3) gathered triangle vertices."""
        return self.vertices[self.faces.reshape(-1)].reshape(
            self.faces.shape[0], 3, 3
        )


@pytree_dataclass(static=("width", "height"))
class Camera:
    """Pinhole camera.  Basis precomputed host-side (plain float32 arrays)."""

    eye: Any  # (3,) f32
    lower_left: Any  # (3,) f32 — image-plane point of pixel (0, 0) corner
    du: Any  # (3,) f32 — image-plane step per pixel in x
    dv: Any  # (3,) f32 — image-plane step per pixel in y
    width: int
    height: int
