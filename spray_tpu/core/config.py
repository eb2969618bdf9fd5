"""Frozen render/scheduler/distribution configs (SURVEY.md §5 'Config/flag system').

The reference parses argv into a config struct (R18).  Here configs are frozen
dataclasses; every jit-time static shape (wavefront capacity, queue capacity,
bounce count, domain slot count, bucket sizes) derives from these, so a config
value change — not data — is the only thing that can trigger recompilation.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 256
    height: int = 256
    spp: int = 4  # samples per pixel
    bounces: int = 3  # path-tracing bounces (0 = primary visibility only)
    ao_samples: int = 8  # ambient-occlusion rays per shading point
    ao_radius: float = 1e30  # max AO occlusion distance
    seed: int = 0
    integrator: str = "pt"  # "pt" | "ao" | "normal"
    nee: bool = True  # next-event estimation (direct light sampling) in "pt".
    # NEE is required for nonzero geometry gradients: without it, cosine
    # sampling + Lambertian throughput cancel every continuous geometry term
    # from the estimator (visibility is detached), so d(image)/d(vertices)==0.
    background: tuple = (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class BvhConfig:
    branching: int = 8  # node width (VPU-sublane-matched)
    leaf_size: int = 16  # max tris per leaf (padded to this)
    num_bins: int = 16  # SAH bins per axis


@dataclasses.dataclass(frozen=True)
class SchedConfig:
    """Speculative epoch scheduler knobs (SURVEY.md §2 R6–R8 equivalents)."""

    max_epochs: int = 64  # static bound on the epoch loop
    queue_capacity: int = 1 << 20  # per-domain ray queue capacity (padded)
    speculation: bool = True  # trace all resident overlapped domains per epoch
    max_spec_domains: int = 8  # speculative-buffer slots per ray


@dataclasses.dataclass(frozen=True)
class ResidencyConfig:
    """HBM domain-slot cache (SURVEY.md §2 R10 equivalent, disk→host-DRAM→HBM)."""

    num_slots: int = 8  # resident domain slots in HBM
    slot_tris: int = 1 << 17  # padded triangle capacity per slot
    slot_verts: int = 1 << 17  # padded vertex capacity per slot


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Mesh layout for the distributed epoch loop (SURVEY.md §2b/§2c)."""

    mesh_shape: tuple = (1,)  # devices per axis
    axis_names: tuple = ("dev",)
    ray_bucket: int = 1 << 16  # all_to_all bucket capacity per (src, dst) pair
