"""Shared Pallas kernel utilities: padding, layout, interpret-mode selection.

Kernels compile natively on TPU and fall back to interpreter mode elsewhere
(SURVEY.md §4: the CPU test mesh must exercise the same code paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
SUBLANES = 8
RAY_TILE = SUBLANES * LANES  # rays per program instance


def use_interpret():
    return jax.default_backend() != "tpu"


def round_up(x, m):
    return -(-x // m) * m


def pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def rays_to_tiles(o, d, tmin, tmax):
    """SoA rays (N,3)... -> dict of (R, 8, 128) f32 planes + original N.

    Padding rays are degenerate (tmax < tmin) so they never hit anything.
    """
    n = o.shape[0]
    np_ = round_up(max(n, RAY_TILE), RAY_TILE)
    o = pad_to(o, np_)
    d = pad_to(d, np_, value=1.0)
    tmin = pad_to(tmin, np_, value=1.0)
    tmax = pad_to(tmax, np_, value=0.0)  # padded: tmax < tmin => inactive
    r = np_ // RAY_TILE
    shape = (r, SUBLANES, LANES)
    return {
        "ox": o[:, 0].reshape(shape), "oy": o[:, 1].reshape(shape),
        "oz": o[:, 2].reshape(shape),
        "dx": d[:, 0].reshape(shape), "dy": d[:, 1].reshape(shape),
        "dz": d[:, 2].reshape(shape),
        "tmin": tmin.reshape(shape), "tmax": tmax.reshape(shape),
    }, n


def tiles_to_flat(x, n):
    return x.reshape(-1)[:n]


def tile_swizzle_order(width, height, tile_w=32, tile_h=16):
    """Pixel ids in 2D-tile-major order (numpy, host-side).

    Packets of consecutive rays become compact image tiles instead of thin
    row strips, shrinking each packet's spatial footprint so packet traversal
    visits far fewer BVH nodes/clusters (SURVEY.md §7.3 #1 ray-locality).
    tile_w * tile_h == PACKET of the traversal kernel by default.
    """
    ids = np.arange(width * height, dtype=np.uint32).reshape(height, width)
    out = []
    for ty in range(0, height, tile_h):
        for tx in range(0, width, tile_w):
            out.append(ids[ty : ty + tile_h, tx : tx + tile_w].reshape(-1))
    return np.concatenate(out)
