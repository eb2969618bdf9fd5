"""CPU numpy reference renderer — the correctness oracle (SURVEY.md §4)."""

from __future__ import annotations

import numpy as np

from ..integrators import wavefront
from .brute import BruteIntersector


def render_oracle(scene, camera, cfg, pixel_chunk=16384):
    """Render with the numpy brute-force path.  Returns (H, W, 3) float32."""
    scene = _to_numpy(scene)
    intersector = BruteIntersector(scene, np)
    return wavefront.render(
        scene, camera, cfg, intersector, np, pixel_chunk=pixel_chunk
    )


def _to_numpy(scene):
    from ..core.types import Scene  # noqa: PLC0415

    return Scene(
        vertices=np.asarray(scene.vertices, np.float32),
        faces=np.asarray(scene.faces, np.int32),
        albedo=np.asarray(scene.albedo, np.float32),
        emission=np.asarray(scene.emission, np.float32),
    )
