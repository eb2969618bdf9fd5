"""Round-5: internal vs leaf visit census on morton-packed wavefronts.

The r5 stage split showed the frame is traversal-bound (~1.9us effective
per leaf visit vs 285ns of leaf decode).  This counts INTERNAL and LEAF
visits per packet for the camera/bounce/shadow wavefront classes under the
production morton partition, to decide where the scalar time goes
(each internal visit carries a vector->scalar sync for the ordered push).

Counting copy of the r5 nearest kernel (2-prefetch signature, identity
packet perm); P=256 production width.
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spray_tpu.kernels.traverse import (
    MAX_STACK, _domain_specs, _pop_child, _ray_rows, _slab_all_children,
    _cluster_intersect, _rays_to_aug, _valid_bytes, _stack_scratch,
    _COMPILER_PARAMS,
)
from spray_tpu.kernels.multidomain import (
    MultiDomainClusterIntersector, _packet_domain_order, _live_partition,
)

PK = 256
F32 = jnp.float32


def _counting_kernel(dom_ref, perm_ref, bounds_ref, meta_ref, valid_ref,
                     w_ref, rays_ref, out_t, out_cnt, nid_ref, pc_ref):
    od8, ox, oy, oz, idx, idy, idz, tmin, tmax = _ray_rows(rays_ref)
    if w_ref.shape[2] == 32:
        od8 = od8.astype(jnp.bfloat16)
    c_sz = w_ref.shape[3] // 3
    row = jax.lax.broadcasted_iota(jnp.int32, (c_sz, PK), 0)

    live = dom_ref[pl.program_id(0)] >= 0

    @pl.when(jnp.logical_not(live))
    def _():
        out_t[0] = jnp.zeros((1, PK), jnp.float32)
        out_cnt[0] = jnp.zeros((1, PK), jnp.int32)

    @pl.when(live)
    def _():
        w0 = _slab_all_children(
            bounds_ref, 0, valid_ref[0, 0, 0], ox, oy, oz, idx, idy, idz,
            tmin, tmax,
        )
        nid_ref[0] = 0
        pc_ref[0] = w0
        sp0 = (w0 != 0).astype(jnp.int32)

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            sp, best_t, best_code, n_int, n_leaf = carry
            sp, nid, c = _pop_child(nid_ref, pc_ref, sp)
            kind = meta_ref[0, 0, nid * 8 + c]

            def internal_case(ops):
                sp, best_t, best_code, n_int, n_leaf = ops
                window_hi = jnp.minimum(tmax, best_t)
                w = _slab_all_children(
                    bounds_ref, kind, valid_ref[0, 0, kind], ox, oy, oz,
                    idx, idy, idz, tmin, window_hi,
                )
                @pl.when(w != 0)
                def _():
                    nid_ref[sp] = kind
                    pc_ref[sp] = w
                return (sp + (w != 0).astype(jnp.int32), best_t, best_code,
                        n_int + 1, n_leaf)

            def leaf_case(ops):
                sp, best_t, best_code, n_int, n_leaf = ops
                cid = -(kind + 2)
                key = _cluster_intersect(
                    w_ref, cid, od8, tmin, jnp.minimum(tmax, best_t),
                    occl=False, row=row,
                )
                kmin = jnp.min(key, axis=0, keepdims=True)
                t_up = jax.lax.bitcast_convert_type(
                    (kmin & jnp.int32(-128)) + jnp.int32(128), jnp.float32
                )
                improved = t_up < best_t
                code = cid * c_sz + (kmin & 127)
                return (sp, jnp.where(improved, t_up, best_t),
                        jnp.where(improved, code, best_code),
                        n_int, n_leaf + 1)

            return jax.lax.cond(
                kind >= 0, internal_case, leaf_case,
                (sp, best_t, best_code, n_int, n_leaf),
            )

        init = (sp0, tmax, jnp.full((1, PK), -1, jnp.int32),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        _, best_t, _, n_int, n_leaf = jax.lax.while_loop(cond, body, init)
        out_t[0] = best_t
        out_cnt[0] = jnp.full((1, PK), n_int * 65536 + n_leaf, jnp.int32)


@jax.jit
def _counting_call(bucket_dom, bounds, meta, w, rays_aug):
    p = rays_aug.shape[0]
    valid = _valid_bytes(meta)
    meta_flat = meta.reshape(meta.shape[0], 1, -1)
    out_spec = pl.BlockSpec(
        (1, 1, PK), lambda b, dref, pref: (pref[b], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        in_specs=_domain_specs(bounds, meta_flat, valid.shape[2], w, PK),
        out_specs=[out_spec] * 2,
        scratch_shapes=_stack_scratch(),
    )
    return pl.pallas_call(
        _counting_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((p, 1, PK), jnp.float32),
                   jax.ShapeDtypeStruct((p, 1, PK), jnp.int32)],
        interpret=False,
        compiler_params=_COMPILER_PARAMS,
    )(bucket_dom, jnp.arange(p, dtype=jnp.int32), bounds, meta_flat, valid,
      w, rays_aug)


def census(isect, o, d, tmin, tmax):
    """Routed rounds with counters on the morton-packed wavefront."""
    perm, inv = _live_partition(tmax, d, o, isect.world_lo, isect.world_hi)
    o, d, tmin, tmax = o[perm], d[perm], tmin[perm], tmax[perm]
    aug, n = _rays_to_aug(o, d, tmin, tmax, PK)
    p = aug.shape[0]
    order, _ = _packet_domain_order(aug, isect.dom_aabb)
    best_t = jnp.concatenate(
        [tmax, jnp.zeros(p * PK - tmax.shape[0], jnp.float32)]
    ) if tmax.shape[0] < p * PK else tmax
    tot_i = tot_l = 0
    live_packets = 0
    for r in range(order.shape[1]):
        bdom = order[:, r]
        bt = best_t.reshape(p, PK)
        liv = (bdom >= 0)[:, None]
        a = aug.at[:, 5, 0:PK].set(jnp.where(liv, bt, F32(0.0)))
        from spray_tpu.kernels.traverse import live_buckets
        bucket = live_buckets(jnp.where(liv, bt, F32(0.0)), bdom)
        t, cnt = _counting_call(bucket, isect.bounds, isect.meta, isect.w, a)
        packed = np.asarray(cnt[:, 0, 0])
        tot_i += int((packed >> 16).sum())
        tot_l += int((packed & 0xFFFF).sum())
        live_packets += int((np.asarray(bucket) >= 0).sum())
        t = t.reshape(p, PK)
        # dead packets write zeros: only live packets tighten their windows
        best_t = jnp.where(liv, jnp.minimum(bt, t), bt).reshape(-1)
    return tot_i, tot_l, live_packets, p


def main():
    from spray_tpu.core import geom, rng
    from spray_tpu.core.camera import make_camera
    from spray_tpu.core.config import RenderConfig
    from spray_tpu.integrators import wavefront
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.common import tile_swizzle_order

    size = 256
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=size, height=size,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=0)
    isect = MultiDomainClusterIntersector(scene)
    arrays = wavefront.make_scene_arrays(scene, jnp)
    pixel_ids = jnp.asarray(tile_swizzle_order(size, size))
    n = size * size
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, geom.INF, jnp.float32)
    jx = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    o, d = geom.camera_rays(camera, pixel_ids, jx, jy, jnp)

    out = {}
    alive = jnp.ones(n, bool)
    throughput = jnp.ones((n, 3), jnp.float32)
    for bounce in range(cfg.bounces + 1):
        win = jnp.where(alive, tmax, jnp.float32(0.0))
        ti, tl, lp, p = census(isect, o, d, tmin, win)
        out[f"b{bounce}"] = {
            "internal": ti, "leaf": tl,
            "live_packets": lp,
            "int_per_lp": round(ti / max(lp, 1), 1),
            "leaf_per_lp": round(tl / max(lp, 1), 1),
        }
        print(json.dumps({f"b{bounce}": out[f"b{bounce}"]}), flush=True)
        hits = isect.intersect(o, d, tmin, win)
        hit = alive & hits.valid
        p_, nrm = wavefront._shade_prep(
            o, d, hits, arrays["normals"], jnp, arrays["offset_eps"])
        u1, u2 = rng.uniform2(0, pixel_ids, 0, bounce, rng.BSDF, jnp)
        local = geom.cosine_hemisphere(u1, u2, jnp)
        new_d = geom.local_to_world(local, nrm, jnp)
        alive = hit
        o = jnp.where(hit[..., None], p_, o)
        d = jnp.where(hit[..., None], new_d, d)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
