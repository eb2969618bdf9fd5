"""Sorted visit-sweep tracer (kernels/sweep.py) vs the brute oracle.

Same equivalence contract as test_binned.py (SURVEY.md §4 ladder): identical
MT formula, so hit/miss, t, and prim agree up to exact-t ties; occlusion
matches windowed brute hits exactly.  Extra coverage: tiny band/chunk sizes
force many while_loop chunks (cursor/overflow paths).
"""

import numpy as np
import jax.numpy as jnp

from spray_tpu.io.scenes import cornell_box, icosphere, wisp_cloud
from spray_tpu.kernels.sweep import SweepIntersector
from spray_tpu.oracle.brute import BruteIntersector

from test_binned import _rand_rays


def _check(scene, n=600, band0=4, v_cap_per_pkt=2, centered=False, seed=0,
           sort=True):
    rng = np.random.default_rng(seed)
    o, d, ext = _rand_rays(scene, n, rng, centered)
    tmin = np.zeros(n, np.float32)
    tmax = np.where(rng.random(n) < 0.2, ext * 0.7, np.inf).astype(np.float32)
    tmax[:8] = 0.0  # dead rays must stay dead and not widen frustums
    si = SweepIntersector(
        scene, band0=band0, v_cap_per_pkt=v_cap_per_pkt, sort=sort,
        interpret=True,
    )
    br = BruteIntersector(scene, jnp)
    args = tuple(map(jnp.asarray, (o, d, tmin, tmax)))
    h1 = si.intersect(*args)
    h2 = br.intersect(*args)
    v1, v2 = np.asarray(h1.valid), np.asarray(h2.valid)
    np.testing.assert_array_equal(v1, v2)
    m = v1
    np.testing.assert_allclose(
        np.asarray(h1.t)[m], np.asarray(h2.t)[m], atol=1e-4
    )
    p1, p2 = np.asarray(h1.prim)[m], np.asarray(h2.prim)[m]
    td = np.abs(np.asarray(h1.t)[m] - np.asarray(h2.t)[m])
    assert not ((p1 != p2) & (td > 1e-5)).any()
    occ1 = np.asarray(si.occluded(args[0], args[1], args[3]))
    h2b = br.intersect(*args)
    occ2 = np.asarray(h2b.valid) & (np.asarray(h2b.t) > 0) & (
        np.asarray(h2b.t) < np.asarray(args[3])
    )
    np.testing.assert_array_equal(occ1, occ2)


def test_sweep_cornell_random():
    _check(cornell_box())


def test_sweep_cornell_coherent():
    _check(cornell_box(), centered=True, seed=1)


def test_sweep_wisp_multi_supernode():
    scene = wisp_cloud(n_blobs=6, tris_per_blob=800, seed=2)
    _check(scene, seed=2)
    # band0=1 + 1-visit chunks: maximum chunk-loop pressure
    _check(scene, band0=1, v_cap_per_pkt=1, centered=True, seed=3)


def test_sweep_icosphere_unsorted():
    _check(icosphere(3), seed=4, sort=False)


def test_sweep_small_scene():
    # fewer supernodes than band0: counts clamp, single chunk retires all
    _check(icosphere(1), band0=16, v_cap_per_pkt=32, seed=5)
