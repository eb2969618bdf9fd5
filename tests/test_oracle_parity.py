"""BASELINE.md config 1: device renderer `allclose` to the CPU oracle.

Small resolutions keep the O(rays x tris) oracle fast; the scene, sampling and
integrator logic are the real thing.
"""

import numpy as np
import pytest

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.integrators.device import render_device
from spray_tpu.io.scenes import cornell_box
from spray_tpu.oracle import render_oracle

CAM = make_camera(
    eye=(0.5, 0.5, 2.2), lookat=(0.5, 0.5, 0.0), up=(0, 1, 0),
    fov_y_deg=40, width=48, height=48,
)


def _compare(cfg, atol=2e-3):
    scene = cornell_box()
    ref = np.asarray(render_oracle(scene, CAM, cfg))
    dev = np.asarray(render_device(scene, CAM, cfg))
    assert ref.shape == dev.shape == (CAM.height, CAM.width, 3)
    assert np.isfinite(ref).all() and np.isfinite(dev).all()
    # identical RNG streams => only fp-reassociation noise remains
    np.testing.assert_allclose(dev, ref, atol=atol, rtol=1e-3)
    return ref


def test_normal_integrator_parity():
    cfg = RenderConfig(width=48, height=48, spp=1, integrator="normal", seed=5)
    _compare(cfg)


def test_ao_parity():
    cfg = RenderConfig(
        width=48, height=48, spp=2, ao_samples=4, integrator="ao", seed=1
    )
    ref = _compare(cfg)
    assert ref.max() > 0.05  # lit image, not black


def test_pt_parity():
    cfg = RenderConfig(width=48, height=48, spp=2, bounces=3, integrator="pt", seed=2)
    ref = _compare(cfg)
    assert ref.max() > 0.5  # emissive panel visible directly or via bounce


def test_pt_parity_bvh_intersector():
    """Full renderer with the BVH intersector still matches the oracle."""
    from spray_tpu.bvh.traverse import BVHIntersector

    cfg = RenderConfig(width=48, height=48, spp=1, bounces=2, integrator="pt", seed=3)
    scene = cornell_box()
    ref = np.asarray(render_oracle(scene, CAM, cfg))
    dev = np.asarray(
        render_device(scene, CAM, cfg, intersector=BVHIntersector(scene, leaf_size=8))
    )
    np.testing.assert_allclose(dev, ref, atol=2e-3, rtol=1e-3)


def test_spp_batched_equals_scanned():
    """One batched wavefront (all spp at once) == lax.scan over samples,
    bit-identical: the counter RNG keys on (pixel, sample), so wavefront
    shape cannot change the image (SURVEY.md §7.1 RNG)."""
    import jax.numpy as jnp

    from spray_tpu.integrators.device import (
        device_scene_arrays, make_render_fn,
    )

    scene = cornell_box()
    cfg = RenderConfig(width=48, height=48, spp=3, bounces=2,
                       integrator="pt", seed=7)
    arrays = device_scene_arrays(scene)
    a = np.asarray(make_render_fn(scene, CAM, cfg, spp_batch=True)(arrays))
    b = np.asarray(make_render_fn(scene, CAM, cfg, spp_batch=False)(arrays))
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_oracle_deterministic():
    cfg = RenderConfig(width=16, height=16, spp=1, bounces=2, integrator="pt")
    scene = cornell_box()
    a = render_oracle(scene, _cam16(), cfg)
    b = render_oracle(scene, _cam16(), cfg)
    np.testing.assert_array_equal(a, b)


def _cam16():
    return make_camera(
        eye=(0.5, 0.5, 2.2), lookat=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fov_y_deg=40, width=16, height=16,
    )
