"""Binned cull+visit tracer (kernels/binned.py) vs the brute oracle.

SURVEY.md §4 equivalence ladder: the fast path must match the reference
intersector exactly — same MT formula, so hit/miss and prim choice agree
bit-for-bit up to front-to-back ties at equal t.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spray_tpu.io.scenes import cornell_box, icosphere, wisp_cloud
from spray_tpu.kernels.binned import BinnedIntersector
from spray_tpu.oracle.brute import BruteIntersector


def _rand_rays(scene, n, rng, centered=False):
    v = np.asarray(scene.vertices)
    lo, hi = v.min(0), v.max(0)
    ctr, ext = (lo + hi) / 2, float((hi - lo).max())
    if centered:
        o = np.tile(ctr + np.array([0.0, 0.0, 2.0 * ext]), (n, 1))
        tgt = ctr + (rng.random((n, 3)) - 0.5) * ext
        d = tgt - o
    else:
        o = ctr + rng.standard_normal((n, 3)) * ext
        d = rng.standard_normal((n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return o.astype(np.float32), d, ext


def _check(scene, n=600, k=3, centered=False, seed=0):
    rng = np.random.default_rng(seed)
    o, d, ext = _rand_rays(scene, n, rng, centered)
    tmin = np.zeros(n, np.float32)
    tmax = np.where(rng.random(n) < 0.2, ext * 0.7, np.inf).astype(np.float32)
    tmax[:8] = 0.0  # dead rays must stay dead and not widen frustums
    bi = BinnedIntersector(scene, k=k, interpret=True)
    br = BruteIntersector(scene, jnp)
    args = tuple(map(jnp.asarray, (o, d, tmin, tmax)))
    h1 = bi.intersect(*args)
    h2 = br.intersect(*args)
    v1, v2 = np.asarray(h1.valid), np.asarray(h2.valid)
    np.testing.assert_array_equal(v1, v2)
    m = v1
    np.testing.assert_allclose(
        np.asarray(h1.t)[m], np.asarray(h2.t)[m], atol=1e-4
    )
    # prim may differ only on exact-t ties
    p1, p2 = np.asarray(h1.prim)[m], np.asarray(h2.prim)[m]
    td = np.abs(np.asarray(h1.t)[m] - np.asarray(h2.t)[m])
    assert not ((p1 != p2) & (td > 1e-5)).any()
    # occlusion
    occ1 = np.asarray(bi.occluded(args[0], args[1], args[3]))
    h2b = br.intersect(*args)
    occ2 = np.asarray(h2b.valid) & (np.asarray(h2b.t) > 0) & (
        np.asarray(h2b.t) < np.asarray(args[3])
    )
    np.testing.assert_array_equal(occ1, occ2)


def test_binned_cornell_random():
    _check(cornell_box(), k=3)


def test_binned_cornell_coherent():
    _check(cornell_box(), k=2, centered=True, seed=1)


def test_binned_wisp_multi_supernode():
    scene = wisp_cloud(n_blobs=6, tris_per_blob=800, seed=2)
    _check(scene, k=3, seed=2)
    _check(scene, k=1, centered=True, seed=3)  # k=1: many chase rounds


def test_binned_icosphere():
    _check(icosphere(3), k=2, seed=4)


def test_binned_small_scene_few_supernodes():
    # fewer supernodes than k: band clamps, single round
    _check(icosphere(1), k=8, seed=5)
