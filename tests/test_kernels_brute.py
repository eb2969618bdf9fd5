"""Pallas brute intersector (interpret mode on CPU) == jnp brute intersector."""

import jax.numpy as jnp
import numpy as np

from spray_tpu.io.scenes import cornell_box
from spray_tpu.kernels.brute import PallasBruteIntersector
from spray_tpu.oracle.brute import BruteIntersector


def test_pallas_brute_matches_jnp():
    scene = cornell_box()
    rng = np.random.RandomState(0)
    n = 300  # deliberately not a tile multiple (tests padding)
    o = rng.uniform(-0.2, 1.2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, np.inf, jnp.float32)

    ref = BruteIntersector(scene, jnp)
    pk = PallasBruteIntersector(scene)
    hr = ref.intersect(o, d, tmin, tmax)
    hp = pk.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hr.valid), np.asarray(hp.valid))
    m = np.asarray(hr.valid)
    np.testing.assert_allclose(
        np.asarray(hr.t)[m], np.asarray(hp.t)[m], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(hr.prim)[m] == np.asarray(hp.prim)[m]).mean() > 0.999

    occ_r = np.asarray(ref.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    occ_p = np.asarray(pk.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    np.testing.assert_array_equal(occ_r, occ_p)
