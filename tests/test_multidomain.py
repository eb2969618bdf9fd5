"""Config-3 equivalence rung: 8-domain speculative (single chip) == single
domain == brute oracle (SURVEY.md §4 ladder)."""

import jax.numpy as jnp
import numpy as np

from spray_tpu.core.camera import make_camera
from spray_tpu.core.config import RenderConfig
from spray_tpu.domains.partition import median_split_assign, partition_scene
from spray_tpu.integrators.device import render_device
from spray_tpu.io.scenes import bumpy_sphere, cornell_box, merge_scenes, wisp_cloud
from spray_tpu.oracle.brute import BruteIntersector
from spray_tpu.sched.multidomain import MultiDomainIntersector


def _rand_rays(scene, n, seed=0):
    v = np.asarray(scene.vertices)
    lo, hi = v.min(0), v.max(0)
    rng = np.random.RandomState(seed)
    o = rng.uniform(lo - 0.5, hi + 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_partition_covers_all_tris():
    scene = bumpy_sphere(subdiv=3)
    assign = median_split_assign(
        np.random.RandomState(0).uniform(size=(scene.num_faces, 3)), 8
    )
    assert assign.shape == (scene.num_faces,)
    assert set(np.unique(assign)) <= set(range(8))
    ds = partition_scene(scene, 8, leaf_size=8)
    # every global tri id appears exactly once across domains
    ids = ds.orig_id[ds.orig_id >= 0]
    assert sorted(ids.tolist()) == list(range(scene.num_faces))
    assert ds.num_tris.sum() == scene.num_faces


def _check_equivalence(scene, n_domains, n_rays=512, seed=3):
    o, d = _rand_rays(scene, n_rays, seed)
    tmin = jnp.zeros(n_rays, jnp.float32)
    tmax = jnp.full(n_rays, np.inf, jnp.float32)
    ref = BruteIntersector(scene, jnp)
    multi = MultiDomainIntersector(scene, n_domains=n_domains, leaf_size=8)
    hr = ref.intersect(o, d, tmin, tmax)
    hm = multi.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hr.valid), np.asarray(hm.valid))
    m = np.asarray(hr.valid)
    np.testing.assert_allclose(
        np.asarray(hr.t)[m], np.asarray(hm.t)[m], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(hr.prim)[m] == np.asarray(hm.prim)[m]).mean() > 0.998
    occ_r = np.asarray(ref.occluded(o, d, jnp.full(n_rays, 1e30)))
    occ_m = np.asarray(multi.occluded(o, d, jnp.full(n_rays, 1e30)))
    np.testing.assert_array_equal(occ_r, occ_m)


def test_8_domain_equivalence_cornell_sphere():
    scene = merge_scenes(
        [cornell_box(), bumpy_sphere(subdiv=3, center=(0.5, 0.4, 0.4), radius=0.2)]
    )
    _check_equivalence(scene, 8)


def test_16_domain_equivalence_wisps():
    scene = wisp_cloud(n_blobs=8, tris_per_blob=80, extent=4.0)
    _check_equivalence(scene, 16, seed=7)


def test_multidomain_render_parity():
    """Full render through the multi-domain intersector == oracle image."""
    from spray_tpu.oracle import render_oracle

    scene = merge_scenes(
        [cornell_box(), bumpy_sphere(subdiv=2, center=(0.5, 0.4, 0.4), radius=0.2)]
    )
    cam = make_camera(
        eye=(0.5, 0.5, 2.2), lookat=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fov_y_deg=40, width=32, height=32,
    )
    cfg = RenderConfig(spp=1, bounces=2, integrator="pt", seed=5)
    ref = np.asarray(render_oracle(scene, cam, cfg))
    dev = np.asarray(
        render_device(
            scene, cam, cfg,
            intersector=MultiDomainIntersector(scene, n_domains=8, leaf_size=8),
        )
    )
    np.testing.assert_allclose(dev, ref, atol=2e-3, rtol=1e-3)


def test_empty_domains_padded_not_dropped():
    """ADVICE r4: a partition that leaves some requested domains empty must
    honor the domain count with never-hit placeholder pages (mesh-rounded
    in-situ setups crash otherwise), and the render must be unaffected."""
    from spray_tpu.io.scenes import icosphere
    from spray_tpu.kernels.multidomain import (
        MultiDomainClusterIntersector, build_cluster_domains,
    )

    scene = icosphere(subdiv=1)  # 80 tris < 128 domains -> empties
    st = build_cluster_domains(scene, n_domains=128)
    assert st["bounds"].shape[0] == 128
    # placeholder domains: no real tris
    per_dom_tris = (st["tri_ids"] >= 0).sum(axis=1)
    assert (per_dom_tris == 0).any()
    isect = MultiDomainClusterIntersector(scene, n_domains=128,
                                          interpret=True)
    ref = MultiDomainClusterIntersector(scene, n_domains=2, interpret=True)
    n = 128
    rng_ = np.random.RandomState(0)
    o = jnp.asarray(rng_.uniform(-2, 2, size=(n, 3)).astype(np.float32))
    d = jnp.asarray(rng_.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)
    h16 = isect.intersect(o, d, tmin, tmax)
    h2 = ref.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(h16.valid), np.asarray(h2.valid))
    np.testing.assert_array_equal(np.asarray(h16.prim), np.asarray(h2.prim))


def test_fused_anyhit_matches_grid():
    """The fused any-hit (occlusion carry in kernel scratch; kept as the
    cross-check for the fused traversal design) equals the grid form."""
    from spray_tpu.kernels.multidomain import (
        MultiDomainClusterIntersector, _routed_anyhit_fused,
        _routed_anyhit_grid,
    )
    from spray_tpu.kernels.traverse import _rays_to_aug

    scene = wisp_cloud(n_blobs=6, tris_per_blob=200, extent=4.0, seed=5)
    i = MultiDomainClusterIntersector(scene, n_domains=6, interpret=True)
    rs = np.random.RandomState(3)
    n = 600
    o = jnp.asarray(rs.uniform(-4, 4, size=(n, 3)).astype(np.float32))
    d = jnp.asarray(rs.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmax = jnp.where(jnp.arange(n) % 4 == 0, 0.0, 6.0).astype(jnp.float32)
    aug, _ = _rays_to_aug(o, d, jnp.zeros(n, jnp.float32), tmax, 256)
    of = _routed_anyhit_fused(
        i.bounds, i.meta, i.w, i.dom_aabb, aug, True
    )[: n]
    og = _routed_anyhit_grid(
        i.bounds, i.meta, i.w, i.dom_aabb, aug, True
    )[: n]
    np.testing.assert_array_equal(np.asarray(of != 0), np.asarray(og != 0))
