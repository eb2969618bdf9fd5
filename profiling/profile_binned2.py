"""Diagnose binned tracer: candidate counts + rounds (dev tool)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
import numpy as np
import jax, jax.numpy as jnp
from spray_tpu.core.camera import make_camera
from spray_tpu.core.geom import camera_rays
from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.kernels.binned import (
    BinnedIntersector, packet_intervals, supernode_entries, PACKET,
    _rays_to_aug)
from spray_tpu.kernels.common import tile_swizzle_order

SIZE = 512
scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
camera = make_camera(eye=(14.0, 10.0, 18.0), lookat=(0,0,0), up=(0,1,0),
                     fov_y_deg=45, width=SIZE, height=SIZE)
npix = SIZE*SIZE
bi = BinnedIntersector(scene, k=16)
ids = jnp.asarray(tile_swizzle_order(SIZE, SIZE))
z = jnp.zeros(npix)
o, d = camera_rays(camera, ids, z, z, jnp)
tmin = jnp.zeros(npix); tmax = jnp.full(npix, np.inf)
aug, _ = _rays_to_aug(o, d, tmin, tmax)
ivals = packet_intervals(aug)
entry = supernode_entries(ivals, bi.sbox)
cnt = np.asarray(jnp.sum(jnp.isfinite(entry), axis=1))
print("packets:", cnt.shape[0], "S:", entry.shape[1])
print("candidates per packet: mean %.0f p50 %.0f p90 %.0f p99 %.0f max %d" % (
    cnt.mean(), np.percentile(cnt,50), np.percentile(cnt,90), np.percentile(cnt,99), cnt.max()))
# how many rounds would the nearest chase need ignoring best-t tightening?
print("rounds upper bound (max cnt / k):", int(np.ceil(cnt.max()/16)))
# mixed-octant packets
dlo, dhi = np.asarray(ivals["dlo"]), np.asarray(ivals["dhi"])
mixed = ((dlo <= 0) & (dhi >= 0))
print("packets with mixed-sign axes:", int(mixed.any(axis=1).sum()), "of", mixed.shape[0])
# per-ray ground truth for comparison: per-ray slab count vs supernodes
