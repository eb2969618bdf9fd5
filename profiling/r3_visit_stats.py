"""Round-3: count traversal while-loop iterations (visits) per packet for
camera vs bounce vs shadow ray populations -> is the 10^4x cliff visit COUNT
(tree/geometry problem) or visit COST (kernel problem)?

Instruments a copy of the nearest kernel with internal/leaf visit counters.
Runs the ROUTED multidomain path exactly as the renderer does (same domain
order, same windows), printing per-round totals.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spray_tpu.kernels.traverse import (
    PACKET, MAX_STACK, _domain_specs, _pop_child, _ray_rows,
    _slab_all_children, _cluster_intersect, _rays_to_aug, _valid_bytes,
    _stack_scratch,
)
from spray_tpu.kernels.multidomain import (
    MultiDomainClusterIntersector, _packet_domain_order, _round_perms,
)

CLUSTER = 128
F32 = jnp.float32


def _nearest_kernel_counting(dom_ref, bounds_ref, meta_ref,
                             valid_ref, w_ref, rays_ref, out_t, out_code,
                             out_cnt, nid_ref, pc_ref):
    od8, ox, oy, oz, idx, idy, idz, tmin, tmax = _ray_rows(rays_ref)
    row = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, PACKET), 0)

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
            # r4: keyed decode — one packed (t|row) int min-reduce
            key = _cluster_intersect(
                w_ref, cid, od8, tmin, jnp.minimum(tmax, best_t),
                occl=False, row=row,
            )
            kmin = jnp.min(key, axis=0, keepdims=True)
            t_up = jax.lax.bitcast_convert_type(
                (kmin & jnp.int32(-128)) + jnp.int32(128), jnp.float32
            )
            improved = t_up < best_t
            code = cid * CLUSTER + (kmin & 127)
            return (
                sp,
                jnp.where(improved, t_up, best_t),
                jnp.where(improved, code, best_code),
                n_int, n_leaf + 1,
            )

        return jax.lax.cond(
            kind >= 0, internal_case, leaf_case,
            (sp, best_t, best_code, n_int, n_leaf),
        )

    init = (
        sp0, tmax, jnp.full((1, PACKET), -1, jnp.int32),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )
    _, best_t, best_code, n_int, n_leaf = jax.lax.while_loop(cond, body, init)
    out_t[0] = best_t
    out_code[0] = best_code
    # packed counts broadcast over the row (scatter unsupported in Mosaic)
    out_cnt[0] = jnp.full((1, PACKET), n_int * 65536 + n_leaf, jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def _nearest_call_counting(bucket_dom, bounds, meta, w, rays_aug):
    p = rays_aug.shape[0]
    valid = _valid_bytes(meta)
    meta_flat = meta.reshape(meta.shape[0], 1, -1)
    out_spec = pl.BlockSpec(
        (1, 1, PACKET), lambda b, dref: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    oshape = jax.ShapeDtypeStruct((p, 1, PACKET), jnp.float32)
    oishape = jax.ShapeDtypeStruct((p, 1, PACKET), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=_domain_specs(bounds, meta_flat, valid.shape[2], w),
        out_specs=[out_spec] * 3,
        scratch_shapes=_stack_scratch(),
    )
    return pl.pallas_call(
        _nearest_kernel_counting,
        grid_spec=grid_spec,
        out_shape=[oshape, oishape, oishape],
        interpret=False,
    )(bucket_dom, bounds, meta_flat, valid, w, rays_aug)


def routed_counts(isect, o, d, tmin, tmax):
    """Replicate _routed_nearest but with counters; returns per-round totals."""
    aug, n = _rays_to_aug(o, d, tmin, tmax)
    p = aug.shape[0]
    npad = p * PACKET
    order, _ = _packet_domain_order(aug, isect.dom_aabb)
    perms, invs, bdoms = _round_perms(order, isect.bounds.shape[0])
    best_t = jnp.concatenate(
        [tmax, jnp.zeros(npad - tmax.shape[0], jnp.float32)]
    ) if tmax.shape[0] < npad else tmax

    rounds = []
    nrounds = perms.shape[0]
    for r in range(nrounds):
        perm, inv, bdom = perms[r], invs[r], bdoms[r]
        a = aug[perm]
        bt = best_t.reshape(p, PACKET)[perm]
        live = (bdom >= 0)[:, None]
        a = a.at[:, 5, 0:PACKET].set(jnp.where(live, bt, jnp.float32(0.0)))
        t, code, cnt = _nearest_call_counting(
            jnp.maximum(bdom, 0), isect.bounds, isect.meta, isect.w, a
        )
        packed = np.asarray(cnt[:, 0, 0])
        n_int, n_leaf = packed >> 16, packed & 0xFFFF
        t = t.reshape(-1)
        code = code.reshape(-1)
        dom_ray = jnp.repeat(jnp.maximum(bdom, 0), PACKET)
        prim = jnp.where(
            code >= 0, isect.tri_ids[dom_ray, jnp.maximum(code, 0)], -1
        )
        def unp(x):
            return x.reshape(p, PACKET)[inv].reshape(-1)
        t, prim = unp(t), unp(prim)
        upd = (prim >= 0) & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        rounds.append((int(n_int.sum()), int(n_leaf.sum()),
                       int((np.asarray(bdom) >= 0).sum())))
    return rounds


def main():
    from spray_tpu.core import geom, rng
    from spray_tpu.core.camera import make_camera
    from spray_tpu.integrators import wavefront
    from spray_tpu.io.scenes import wisp_cloud
    from spray_tpu.kernels.common import tile_swizzle_order

    size = 256  # quarter of bench pixels: stats scale linearly
    scene = wisp_cloud(n_blobs=8, tris_per_blob=131072, seed=3)
    camera = make_camera(
        eye=(14.0, 10.0, 18.0), lookat=(0, 0, 0), up=(0, 1, 0),
        fov_y_deg=45, width=size, height=size,
    )
    print(f"scene: {scene.num_faces} tris, img {size}^2", flush=True)
    isect = MultiDomainClusterIntersector(scene)
    print(f"{isect.n_domains} domains, nodes/domain {isect.meta.shape[1]}, "
          f"clusters/domain {isect.w.shape[1]}", flush=True)

    arrays = wavefront.make_scene_arrays(scene, jnp)
    pixel_ids = jnp.asarray(tile_swizzle_order(camera.width, camera.height))
    n = pixel_ids.shape[0]
    jx = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 0), jnp)
    jy = rng.uniform(0, pixel_ids, 0, rng.dim_id(0, rng.PIXEL_JITTER, 1), jnp)
    o, d = geom.camera_rays(camera, pixel_ids, jx, jy, jnp)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, geom.INF, jnp.float32)

    nearest_j = jax.jit(lambda s, o, d, tmin, win: s.intersect(o, d, tmin, win))
    hits = nearest_j(isect, o, d, tmin, tmax)
    hit = hits.valid
    eps = arrays["offset_eps"]
    p, nrm = wavefront._shade_prep(o, d, hits, arrays["normals"], jnp, eps)
    u1, u2 = rng.uniform2(0, pixel_ids, 0, 0, rng.BSDF, jnp)
    local = geom.cosine_hemisphere(u1, u2, jnp)
    new_d = geom.local_to_world(local, nrm, jnp)
    o1 = jnp.where(hit[..., None], p, o)
    d1 = jnp.where(hit[..., None], new_d, d)
    win1 = jnp.where(hit, tmax, jnp.float32(0.0))

    for name, (oo, dd, tt, ww) in {
        "camera_b0": (o, d, tmin, tmax),
        "bounce_b1": (o1, d1, tmin, win1),
    }.items():
        t0 = time.time()
        rounds = routed_counts(isect, oo, dd, tt, ww)
        ti = sum(r[0] for r in rounds)
        tl = sum(r[1] for r in rounds)
        tp = sum(r[2] for r in rounds)
        nact = int(jnp.sum(ww > 0))
        print(f"\n{name}: act={nact}  internal={ti}  leaf={tl} "
              f" live_pkt_rounds={tp}  (wall {time.time()-t0:.1f}s)",
              flush=True)
        print(f"  leaf visits/ray = {tl*PACKET/max(nact,1):.1f} "
              f"(x{PACKET} rays/packet share each visit)", flush=True)
        per = [f"r{i}:{a}+{b}({c}pk)" for i, (a, b, c) in enumerate(rounds)
               if c > 0][:12]
        print("  " + " ".join(per), flush=True)


if __name__ == "__main__":
    main()
