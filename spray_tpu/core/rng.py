"""Counter-based RNG shared bit-exactly by the CPU oracle and the TPU renderer.

The reference (SpRay, per SURVEY.md §4 — reference mount empty, no file:line cites
possible) relies on deterministic sampling so its speculative renderer can be
compared image-exactly against its non-speculative baseline renderer.  We need the
same property *across backends*: the numpy oracle and the JAX/TPU renderer must
draw identical sample streams so images are comparable to float tolerance.

Design: a 20-round Threefry-2x32 block cipher implemented once, generically over
the array module (`numpy` or `jax.numpy`).  All state is uint32 with wrapping
arithmetic, which both backends implement identically, so the produced bits are
bit-equal.  Streams are addressed by a structured counter

    (pixel_id, sample_idx, dim)

where ``dim`` encodes (bounce, purpose, component) via `dim_id`.  No sequential
state exists anywhere — any sample of any pixel can be generated independently,
which is exactly what a wavefront renderer needs (rays are reordered freely by
queues/speculation without perturbing the sample stream).
"""

from __future__ import annotations

import numpy as np

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = 0x1BD11BDA  # threefry key-schedule parity constant
_KEY1 = 0x3443F9A5  # fixed second key word; first key word is the user seed

# Purpose channels for `dim_id`.  Keep in sync between oracle and TPU paths.
PIXEL_JITTER = 0
LENS = 1
BSDF = 2
LIGHT = 3
RUSSIAN_ROULETTE = 4
AO = 5

_N_PURPOSE = 8
_N_COMPONENT = 4


def dim_id(bounce, purpose, component=0):
    """Pack (bounce, purpose, component) into a single small counter dimension."""
    return (bounce * _N_PURPOSE + purpose) * _N_COMPONENT + component


def _rotl(x, d, xp):
    ud = xp.uint32(d)
    return (x << ud) | (x >> xp.uint32(32 - d))


def threefry2x32(key0, key1, x0, x1, xp):
    """20-round Threefry-2x32.  All inputs uint32 arrays (broadcastable).

    Generic over ``xp`` (numpy | jax.numpy); uint32 wrap-around arithmetic makes
    the two backends bit-identical.
    """
    k0 = xp.asarray(key0, dtype=xp.uint32)
    k1 = xp.asarray(key1, dtype=xp.uint32)
    k2 = k0 ^ k1 ^ xp.uint32(_PARITY)
    ks = (k0, k1, k2)
    x0 = xp.asarray(x0, dtype=xp.uint32) + k0
    x1 = xp.asarray(x1, dtype=xp.uint32) + k1
    for chunk in range(5):
        rots = _ROT[0:4] if chunk % 2 == 0 else _ROT[4:8]
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r, xp)
            x1 = x1 ^ x0
        x0 = x0 + ks[(chunk + 1) % 3]
        x1 = x1 + ks[(chunk + 2) % 3] + xp.uint32(chunk + 1)
    return x0, x1


def random_bits(seed, pixel, sample, dim, xp):
    """uint32 random bits for counter (pixel, sample, dim) under ``seed``.

    pixel: uint32 array (flat pixel id); sample: sample index; dim: see dim_id.
    Shapes broadcast.
    """
    x0 = xp.asarray(pixel, dtype=xp.uint32)
    x1 = (xp.asarray(sample, dtype=xp.uint32) << xp.uint32(16)) | xp.asarray(
        dim, dtype=xp.uint32
    )
    b0, _ = threefry2x32(xp.uint32(seed) if np.isscalar(seed) else seed, _KEY1, x0, x1, xp)
    return b0


def uniform(seed, pixel, sample, dim, xp):
    """float32 uniform in [0, 1) — bit-identical across numpy and jnp.

    Uses the top 24 bits so the int→float conversion is exact in fp32.
    """
    bits = random_bits(seed, pixel, sample, dim, xp)
    return (bits >> xp.uint32(8)).astype(xp.float32) * xp.float32(1.0 / (1 << 24))


def uniform2(seed, pixel, sample, bounce, purpose, xp):
    """Two independent uniforms (components 0 and 1) for 2D sample decisions."""
    u1 = uniform(seed, pixel, sample, dim_id(bounce, purpose, 0), xp)
    u2 = uniform(seed, pixel, sample, dim_id(bounce, purpose, 1), xp)
    return u1, u2
