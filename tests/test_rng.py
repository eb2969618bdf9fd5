"""RNG: numpy and jnp streams must be bit-identical (oracle-parity bedrock)."""

import jax.numpy as jnp
import numpy as np

from spray_tpu.core import rng


def test_threefry_numpy_jnp_bitwise_equal():
    pix = np.arange(4096, dtype=np.uint32)
    for sample in (0, 1, 7):
        for dim in (0, 1, rng.dim_id(2, rng.BSDF, 1)):
            a = rng.random_bits(123, pix, np.uint32(sample), np.uint32(dim), np)
            b = rng.random_bits(
                123, jnp.asarray(pix), jnp.uint32(sample), jnp.uint32(dim), jnp
            )
            assert a.dtype == np.uint32
            np.testing.assert_array_equal(a, np.asarray(b))


def test_uniform_range_and_equality():
    pix = np.arange(10000, dtype=np.uint32)
    u_np = rng.uniform(7, pix, np.uint32(0), np.uint32(3), np)
    u_j = rng.uniform(7, jnp.asarray(pix), jnp.uint32(0), jnp.uint32(3), jnp)
    assert u_np.dtype == np.float32
    np.testing.assert_array_equal(u_np, np.asarray(u_j))
    assert (u_np >= 0).all() and (u_np < 1).all()
    # basic uniformity sanity
    assert abs(u_np.mean() - 0.5) < 0.01


def test_streams_decorrelated():
    pix = np.arange(1 << 14, dtype=np.uint32)
    a = rng.uniform(0, pix, np.uint32(0), np.uint32(0), np)
    b = rng.uniform(0, pix, np.uint32(0), np.uint32(1), np)
    c = rng.uniform(0, pix, np.uint32(1), np.uint32(0), np)
    d = rng.uniform(1, pix, np.uint32(0), np.uint32(0), np)
    for other in (b, c, d):
        corr = np.corrcoef(a, other)[0, 1]
        assert abs(corr) < 0.03
