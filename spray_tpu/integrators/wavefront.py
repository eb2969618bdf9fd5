"""Wavefront integrators (SURVEY.md §2 R11/R12/R13 equivalents), written ONCE,
generic over the array module and the intersector.

The reference shades with recursive per-ray control flow on CPU threads; the
TPU-idiomatic form (SURVEY.md §7.1) is a fixed-shape SoA wavefront: every bounce
is one batched intersect + one batched shade over all lanes, dead lanes masked.
Because the SAME function body drives both the numpy oracle and the jit'd TPU
renderer (only `xp` and the intersector differ), backend parity is structural,
not aspirational.

Integrators:
  - "pt":     multi-bounce Lambertian path tracing, cosine-sampled, emission on
              hit (no NEE — identical sampling on both backends trivially).
  - "ao":     primary visibility + ambient occlusion (reference's AO shader).
  - "normal": shading-normal debug view.
"""

from __future__ import annotations

import numpy as np

from ..core import geom, rng


def scene_offset_eps(scene):
    """Self-intersection offset scaled to the scene's diagonal (host-side)."""
    v = np.asarray(scene.vertices)
    diag = float(np.linalg.norm(v.max(0) - v.min(0))) if len(v) else 1.0
    return np.float32(max(diag, 1e-6) * 1e-4)


def pgather(tbl, idx, xp):
    """Parameter-table gather behind an XLA optimization barrier.

    Fusing a (N,3) gather from a multi-million-row table into its consumers
    sends the XLA TPU compiler superlinear once the module ALSO contains
    the gather's transpose (the backward scatter-add): one gather + grad at
    2.6M faces measured 193.5s to compile plain vs 12.5s with a barrier on
    the gathered rows (r5; this was ~75s of the bench step's "backward"
    compile, previously misattributed to the bounce-scan transpose — it
    reproduces at bounces=0).  The barrier materializes the gathered rows,
    which is data movement the gather performs anyway; values are
    unchanged.  numpy path: plain indexing.
    """
    if xp is np:
        return tbl[idx]
    import jax  # noqa: PLC0415

    return jax.lax.optimization_barrier(tbl[idx])


def _shade_prep(o, d, hits, normals, xp, eps):
    """Hit point (offset along the facing normal) + facing normal.

    Miss lanes get a benign finite t (1.0): their values are garbage but every
    downstream contribution is hit-masked, and keeping them finite stops
    inf/NaN from leaking into gradients through masked branches.
    """
    n = pgather(normals, hits.prim, xp)
    # Face the normal against the incoming ray (two-sided shading).
    sgn = xp.where(geom.dot(n, d, xp) < 0, xp.float32(1.0), xp.float32(-1.0))
    n = n * sgn[..., None]
    t_safe = xp.where(hits.valid, hits.t, xp.float32(1.0))
    p = o + t_safe[..., None] * d + n * eps
    return p, n


def sample_wavefront(
    scene_arrays, camera, cfg, intersector, xp, sample_idx, pixel_ids,
    with_stats=False,
):
    """Render ONE sample for the given flat pixel ids.  Returns (N, 3) radiance
    (or (radiance, rays_traced) when with_stats — rays_traced counts ACTUAL
    trace activations: lanes with a nonzero trace window per intersect/occluded
    call, the honest Grays/s numerator; see VERDICT r2 weak#2).

    scene_arrays: dict with 'albedo' (F,3), 'emission' (F,3), 'normals' (F,3),
    'offset_eps' scalar — all already in the backend's array type.
    sample_idx may be a python int (oracle) or traced scalar (jit'd TPU path).
    """
    albedo = scene_arrays["albedo"]
    emission = scene_arrays["emission"]
    normals = scene_arrays["normals"]
    eps = scene_arrays["offset_eps"]
    seed = cfg.seed
    n = pixel_ids.shape[0]
    background = xp.asarray(np.asarray(cfg.background, np.float32))

    jx = rng.uniform(seed, pixel_ids, sample_idx, rng.dim_id(0, rng.PIXEL_JITTER, 0), xp)
    jy = rng.uniform(seed, pixel_ids, sample_idx, rng.dim_id(0, rng.PIXEL_JITTER, 1), xp)
    o, d = geom.camera_rays(camera, pixel_ids, jx, jy, xp)

    if cfg.integrator == "pt":
        # Device path: lax.scan over bounces — ONE intersect + ONE anyhit
        # kernel instantiation for every bounce (the unrolled python loop
        # compiled each bounce's kernels separately; at 512^2 fwd+bwd that
        # was the single largest cold-compile cost, VERDICT r3 missing#4).
        # Image is bit-identical (same ops/order/RNG streams).  Host-driven
        # intersectors (python control flow per epoch) keep the unrolled
        # loop.  Intersectors with traced stats expose the functional
        # stats protocol (stats_init/intersect_s/occluded_s/absorb_stats)
        # and the scan threads their stats through its carry — r5, retiring
        # the dist path's `unrolled_only` per-bounce compile explosion
        # (VERDICT r4 weak#3).
        use_scan = (
            xp is not np
            and not getattr(intersector, "host_driven", False)
        )
        trace = _path_trace_scan if use_scan else _path_trace
        rad, nrays = trace(
            o, d, pixel_ids, sample_idx, albedo, emission, normals, eps,
            background, cfg, intersector, xp, scene_arrays.get("lights"),
        )
    elif cfg.integrator == "ao":
        rad, nrays = _ambient_occlusion(
            o, d, pixel_ids, sample_idx, albedo, normals, eps, background,
            cfg, intersector, xp,
        )
    elif cfg.integrator == "normal":
        tmin = xp.zeros(n, xp.float32)
        tmax = xp.full(n, geom.INF, xp.float32)
        hits = intersector.intersect(o, d, tmin, tmax)
        _, nrm = _shade_prep(o, d, hits, normals, xp, eps)
        col = nrm * xp.float32(0.5) + xp.float32(0.5)
        rad = xp.where(hits.valid[..., None], col, background)
        nrays = xp.float32(n)
    else:
        raise ValueError(f"unknown integrator {cfg.integrator!r}")
    return (rad, nrays) if with_stats else rad


def _sample_light_point(lights, u_pick, u1, u2, xp):
    """Point on the light set.  Returns (y, ny, Le, pdf_weight).

    The tri pick is UNIFORM over light tris (probability 1/L), deliberately
    independent of geometry: an area-weighted CDF pick would make the discrete
    pick a function of vertex positions, introducing pick-boundary
    discontinuities that AD (conditional derivative) excludes but finite
    differences see.  With a uniform pick, pdf(y | i) = 1/area_i, so the
    estimator weight is L * area_i — a smooth function of the vertices.
    """
    num = lights["v0"].shape[0]
    idx = xp.minimum(
        (u_pick * xp.float32(num)).astype(xp.int32), num - 1
    )
    su = xp.sqrt(u1)
    b1 = (su * (xp.float32(1.0) - u2))[..., None]
    b2 = (su * u2)[..., None]
    # light-table gathers through the barrier (pgather): in the diff path
    # every one of these tables derives from the live vertex/emission
    # arrays, so their transposes are scatter-adds in the same module —
    # the gather+transpose fusion pathology (pgather docstring) measured
    # here as 100s vs 16s of XLA compile at bounces=0 with/without NEE
    y = (pgather(lights["v0"], idx, xp) + b1 * pgather(lights["e1"], idx, xp)
         + b2 * pgather(lights["e2"], idx, xp))
    weight = pgather(lights["area"], idx, xp) * xp.float32(num)
    return (y, pgather(lights["normal"], idx, xp),
            pgather(lights["Le"], idx, xp), weight)


def _path_trace(
    o, d, pixel_ids, sample_idx, albedo, emission, normals, eps, background,
    cfg, intersector, xp, lights=None,
):
    n = pixel_ids.shape[0]
    radiance = xp.zeros((n, 3), xp.float32)
    throughput = xp.ones((n, 3), xp.float32)
    alive = xp.ones(n, bool)
    tmin = xp.zeros(n, xp.float32)
    tmax = xp.full(n, geom.INF, xp.float32)
    nee = cfg.nee and lights is not None
    inv_pi = xp.float32(1.0 / np.pi)
    # actual trace activations (lanes with a nonzero window), NOT the static
    # upper bound — dead lanes root out instantly and must not inflate Grays/s
    nrays = xp.zeros((), xp.float32)

    for bounce in range(cfg.bounces + 1):
        # dead lanes get an empty trace window: packets of finished rays
        # root-out instantly in the traversal kernels
        win = xp.where(alive, tmax, xp.float32(0.0))
        nrays = nrays + xp.sum(alive.astype(xp.float32))
        hits = intersector.intersect(o, d, tmin, win)
        hit = alive & hits.valid
        miss = alive & ~hits.valid
        radiance = radiance + xp.where(miss[..., None], throughput * background, 0)
        if not nee or bounce == 0:
            # With NEE, emission after the first hit is already accounted for
            # by the light samples — adding it again would double count.
            radiance = radiance + xp.where(
                hit[..., None], throughput * pgather(emission, hits.prim, xp), 0
            )
        if bounce == cfg.bounces:
            break
        p, nrm = _shade_prep(o, d, hits, normals, xp, eps)
        if nee:
            u_pick = rng.uniform(
                cfg.seed, pixel_ids, sample_idx, rng.dim_id(bounce, rng.LIGHT, 0), xp
            )
            lu1 = rng.uniform(
                cfg.seed, pixel_ids, sample_idx, rng.dim_id(bounce, rng.LIGHT, 1), xp
            )
            lu2 = rng.uniform(
                cfg.seed, pixel_ids, sample_idx, rng.dim_id(bounce, rng.LIGHT, 2), xp
            )
            y, ny, le, pick_w = _sample_light_point(lights, u_pick, lu1, lu2, xp)
            wi_raw = y - p
            d2 = geom.dot(wi_raw, wi_raw, xp)
            dist = xp.sqrt(xp.maximum(d2, xp.float32(1e-12)))
            wi = wi_raw / dist[..., None]
            cos_s = geom.dot(nrm, wi, xp)
            cos_l = -geom.dot(ny, wi, xp)
            front = hit & (cos_s > 0) & (cos_l > 0)
            nrays = nrays + xp.sum(front.astype(xp.float32))
            occ = intersector.occluded(
                p, wi,
                xp.where(front, dist * xp.float32(1.0 - 1e-3), xp.float32(0.0)),
            )
            geo = cos_s * cos_l / xp.maximum(d2, xp.float32(1e-12)) * pick_w
            contrib = throughput * pgather(albedo, hits.prim, xp) * inv_pi * le * geo[..., None]
            lit = front & ~occ
            radiance = radiance + xp.where(lit[..., None], contrib, 0)
        u1, u2 = rng.uniform2(cfg.seed, pixel_ids, sample_idx, bounce, rng.BSDF, xp)
        local = geom.cosine_hemisphere(u1, u2, xp)
        new_d = geom.local_to_world(local, nrm, xp)
        throughput = throughput * xp.where(hit[..., None], pgather(albedo, hits.prim, xp), 1)
        alive = hit & (xp.max(throughput, axis=-1) > xp.float32(0.0))
        o = xp.where(hit[..., None], p, o)
        d = xp.where(hit[..., None], new_d, d)
    return radiance, nrays


# Rematerialization policy for the bounce-scan body under autodiff:
#   None   — XLA default (save residuals per bounce)
#   "full" — jax.checkpoint: recompute the bounce body in backward
#   "dots" — checkpoint_dots policy (save matmul outputs only)
#   "hits" — save ONLY the intersector outputs (tagged 'hits' below):
#            backward recomputes the cheap shading math but never the
#            traversal kernels
# Knob for the backward-compile experiments (VERDICT r4 next#3); the
# production default is set from their measurements.
SCAN_REMAT = None


def _path_trace_scan(
    o, d, pixel_ids, sample_idx, albedo, emission, normals, eps, background,
    cfg, intersector, xp, lights=None,
):
    """jnp-only variant of `_path_trace`: bounces 0..B-1 run as a lax.scan
    (one kernel instantiation shared by all bounces), bounce B (emission/miss
    gather only — the loop's `break` arm) is an epilogue.  Produces the SAME
    image bit-for-bit: identical ops in identical order with identical RNG
    streams; `bounce` is a traced scalar that only enters masks and
    `rng.dim_id` counter arithmetic.
    """
    import jax  # jnp-only path (the oracle keeps the python loop)

    n = pixel_ids.shape[0]
    nee = cfg.nee and lights is not None
    inv_pi = xp.float32(1.0 / np.pi)
    tmin = xp.zeros(n, xp.float32)
    tmax = xp.full(n, geom.INF, xp.float32)
    # functional stats protocol: intersectors with traced per-call stats
    # (the dist collective) thread them through the scan carry instead of a
    # python-list side channel that cannot escape the scan body
    fs_init = getattr(intersector, "stats_init", None)
    if fs_init is not None:
        isect = intersector.intersect_s
        occl = intersector.occluded_s
        stats0 = fs_init()
    else:
        isect = lambda o, d, tmin, tmax, s: (
            intersector.intersect(o, d, tmin, tmax), s
        )
        occl = lambda o, d, tmax, s: (intersector.occluded(o, d, tmax), s)
        stats0 = xp.zeros((0,), xp.int32)

    def step(carry, bounce):
        o, d, radiance, throughput, alive, nrays, stats = carry
        win = xp.where(alive, tmax, xp.float32(0.0))
        nrays = nrays + xp.sum(alive.astype(xp.float32))
        hits, stats = isect(o, d, tmin, win, stats)
        if SCAN_REMAT == "hits":
            from jax.ad_checkpoint import checkpoint_name  # noqa: PLC0415

            hits = jax.tree.map(
                lambda x: checkpoint_name(x, "hits"), hits
            )
        hit = alive & hits.valid
        miss = alive & ~hits.valid
        radiance = radiance + xp.where(
            miss[..., None], throughput * background, 0
        )
        # With NEE, emission after the first hit is already accounted for by
        # the light samples (double-count guard); without NEE every bounce
        # adds emission on hit.
        emis_gate = hit & (bounce == 0) if nee else hit
        radiance = radiance + xp.where(
            emis_gate[..., None], throughput * pgather(emission, hits.prim, xp), 0
        )
        p, nrm = _shade_prep(o, d, hits, normals, xp, eps)
        if nee:
            u_pick = rng.uniform(
                cfg.seed, pixel_ids, sample_idx,
                rng.dim_id(bounce, rng.LIGHT, 0), xp,
            )
            lu1 = rng.uniform(
                cfg.seed, pixel_ids, sample_idx,
                rng.dim_id(bounce, rng.LIGHT, 1), xp,
            )
            lu2 = rng.uniform(
                cfg.seed, pixel_ids, sample_idx,
                rng.dim_id(bounce, rng.LIGHT, 2), xp,
            )
            y, ny, le, pick_w = _sample_light_point(lights, u_pick, lu1, lu2, xp)
            wi_raw = y - p
            d2 = geom.dot(wi_raw, wi_raw, xp)
            dist = xp.sqrt(xp.maximum(d2, xp.float32(1e-12)))
            wi = wi_raw / dist[..., None]
            cos_s = geom.dot(nrm, wi, xp)
            cos_l = -geom.dot(ny, wi, xp)
            front = hit & (cos_s > 0) & (cos_l > 0)
            nrays = nrays + xp.sum(front.astype(xp.float32))
            occ, stats = occl(
                p, wi,
                xp.where(front, dist * xp.float32(1.0 - 1e-3), xp.float32(0.0)),
                stats,
            )
            if SCAN_REMAT == "hits":
                from jax.ad_checkpoint import checkpoint_name  # noqa: PLC0415

                occ = checkpoint_name(occ, "hits")
            geo = cos_s * cos_l / xp.maximum(d2, xp.float32(1e-12)) * pick_w
            contrib = (
                throughput * pgather(albedo, hits.prim, xp) * inv_pi * le * geo[..., None]
            )
            lit = front & ~occ
            radiance = radiance + xp.where(lit[..., None], contrib, 0)
        u1, u2 = rng.uniform2(
            cfg.seed, pixel_ids, sample_idx, bounce, rng.BSDF, xp
        )
        local = geom.cosine_hemisphere(u1, u2, xp)
        new_d = geom.local_to_world(local, nrm, xp)
        throughput = throughput * xp.where(hit[..., None], pgather(albedo, hits.prim, xp), 1)
        alive = hit & (xp.max(throughput, axis=-1) > xp.float32(0.0))
        o = xp.where(hit[..., None], p, o)
        d = xp.where(hit[..., None], new_d, d)
        return (o, d, radiance, throughput, alive, nrays, stats), None

    init = (
        o, d,
        xp.zeros((n, 3), xp.float32),
        xp.ones((n, 3), xp.float32),
        xp.ones(n, bool),
        xp.zeros((), xp.float32),
        stats0,
    )
    step_fn = step
    if SCAN_REMAT == "full":
        step_fn = jax.checkpoint(step)
    elif SCAN_REMAT == "dots":
        step_fn = jax.checkpoint(
            step, policy=jax.checkpoint_policies.checkpoint_dots
        )
    elif SCAN_REMAT == "hits":
        step_fn = jax.checkpoint(
            step,
            policy=jax.checkpoint_policies.save_only_these_names("hits"),
        )
    (o, d, radiance, throughput, alive, nrays, stats), _ = jax.lax.scan(
        step_fn, init, xp.arange(cfg.bounces, dtype=xp.uint32)
    )
    # epilogue == the unrolled loop's final iteration (gathers only, then
    # `break`): one more intersect, miss background + (first-hit) emission
    win = xp.where(alive, tmax, xp.float32(0.0))
    nrays = nrays + xp.sum(alive.astype(xp.float32))
    hits, stats = isect(o, d, tmin, win, stats)
    hit = alive & hits.valid
    miss = alive & ~hits.valid
    radiance = radiance + xp.where(miss[..., None], throughput * background, 0)
    if not nee or cfg.bounces == 0:
        radiance = radiance + xp.where(
            hit[..., None], throughput * pgather(emission, hits.prim, xp), 0
        )
    if fs_init is not None:
        intersector.absorb_stats(stats)
    return radiance, nrays


def _ambient_occlusion(
    o, d, pixel_ids, sample_idx, albedo, normals, eps, background, cfg,
    intersector, xp,
):
    n = pixel_ids.shape[0]
    tmin = xp.zeros(n, xp.float32)
    tmax = xp.full(n, geom.INF, xp.float32)
    hits = intersector.intersect(o, d, tmin, tmax)
    nrays = xp.float32(n) + xp.float32(cfg.ao_samples) * xp.sum(
        hits.valid.astype(xp.float32)
    )
    p, nrm = _shade_prep(o, d, hits, normals, xp, eps)
    vis = xp.zeros(n, xp.float32)
    radius = xp.full(n, xp.float32(cfg.ao_radius), xp.float32)
    for k in range(cfg.ao_samples):
        u1 = rng.uniform(
            cfg.seed, pixel_ids, sample_idx, rng.dim_id(k, rng.AO, 0), xp
        )
        u2 = rng.uniform(
            cfg.seed, pixel_ids, sample_idx, rng.dim_id(k, rng.AO, 1), xp
        )
        local = geom.cosine_hemisphere(u1, u2, xp)
        ao_d = geom.local_to_world(local, nrm, xp)
        occ = intersector.occluded(
            p, ao_d, xp.where(hits.valid, radius, xp.float32(0.0))
        )
        vis = vis + xp.where(occ, xp.float32(0.0), xp.float32(1.0))
    vis = vis * xp.float32(1.0 / max(cfg.ao_samples, 1))
    col = pgather(albedo, hits.prim, xp) * vis[..., None]
    return xp.where(hits.valid[..., None], col, background), nrays


def light_ids_static(scene):
    """Host-side: face ids of emissive triangles (the light set is a jit-time
    static choice; emission VALUES stay differentiable)."""
    em = np.asarray(scene.emission)
    return np.nonzero(em.max(axis=1) > 0)[0].astype(np.int32)


def make_light_arrays(vertices, faces, emission, light_ids, xp):
    """Light-sampling SoA from (possibly live/differentiable) scene arrays.

    Returns None when the scene has no emissive faces.
    """
    if len(light_ids) == 0:
        return None
    f = faces[light_ids]
    tv = pgather(vertices, f.reshape(-1), xp).reshape(-1, 3, 3)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    nvec = geom.cross(e1, e2, xp)
    nlen = xp.sqrt(xp.sum(nvec * nvec, axis=-1))
    area = xp.float32(0.5) * nlen
    normal = nvec / xp.maximum(nlen, xp.float32(1e-12))[..., None]
    return {
        "v0": v0, "e1": e1, "e2": e2, "normal": normal,
        "Le": emission[light_ids], "area": area,
    }


def make_scene_arrays(scene, xp):
    """Precompute per-face shading arrays ONCE (host, numpy) then move to xp.

    Normals are computed in numpy so both backends consume byte-identical
    values — one less source of cross-backend drift.
    """
    normals_np = geom.face_normals(
        np.asarray(scene.vertices), np.asarray(scene.faces), np
    )
    lids = light_ids_static(scene)
    verts = xp.asarray(scene.vertices)
    faces = xp.asarray(scene.faces)
    emission = xp.asarray(scene.emission)
    return {
        "albedo": xp.asarray(scene.albedo),
        "emission": emission,
        "normals": xp.asarray(normals_np),
        "offset_eps": scene_offset_eps(scene),
        "lights": make_light_arrays(verts, faces, emission, lids, xp),
    }


def render(scene, camera, cfg, intersector, xp, pixel_chunk=None):
    """Full-frame render: averages cfg.spp samples.  Returns (H, W, 3) in xp.

    The oracle calls this with numpy (python loops, possibly chunked to bound
    the O(rays x tris) working set); the device path jits `sample_wavefront`
    separately (see spray_tpu.integrators.device).
    """
    w, h = camera.width, camera.height
    npix = w * h
    scene_arrays = make_scene_arrays(scene, xp)
    acc = xp.zeros((npix, 3), xp.float32)
    chunk = pixel_chunk or npix
    for s in range(cfg.spp):
        for c0 in range(0, npix, chunk):
            ids = xp.arange(c0, min(c0 + chunk, npix), dtype=xp.uint32)
            rad = sample_wavefront(
                scene_arrays, camera, cfg, intersector, xp, s, ids
            )
            if xp is np:
                acc[c0 : c0 + ids.shape[0]] += rad
            else:
                acc = acc.at[c0 : c0 + ids.shape[0]].add(rad)
    img = acc * xp.float32(1.0 / cfg.spp)
    return img.reshape(h, w, 3)
