"""Pallas packet/cluster kernels (interpret mode) == jnp brute intersector."""

import jax.numpy as jnp
import numpy as np
import pytest

from spray_tpu.io.scenes import bumpy_sphere, cornell_box, wisp_cloud
from spray_tpu.kernels.traverse import ClusterBVHIntersector
from spray_tpu.oracle.brute import BruteIntersector


def _rand_rays(scene, n, seed=0):
    v = np.asarray(scene.vertices)
    lo, hi = v.min(0), v.max(0)
    rng = np.random.RandomState(seed)
    o = rng.uniform(lo - 0.5, hi + 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize(
    "scene,seed",
    [
        (cornell_box(), 1),  # single cluster
        (bumpy_sphere(subdiv=3), 2),  # multiple clusters, one level
        (wisp_cloud(n_blobs=8, tris_per_blob=80, extent=4.0), 3),  # deeper
    ],
    ids=["cornell", "sphere", "wisps"],
)
def test_cluster_kernel_matches_brute(scene, seed):
    n = 1500  # > 1 packet, not a multiple of 1024 (tests padding)
    o, d = _rand_rays(scene, n, seed)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, np.inf, jnp.float32)
    ref = BruteIntersector(scene, jnp)
    pk = ClusterBVHIntersector(scene)
    hr = ref.intersect(o, d, tmin, tmax)
    hp = pk.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hr.valid), np.asarray(hp.valid))
    m = np.asarray(hr.valid)
    # transform-based t vs Moller-Trumbore t: same math, different rounding
    np.testing.assert_allclose(
        np.asarray(hr.t)[m], np.asarray(hp.t)[m], rtol=2e-4, atol=2e-5
    )
    # prim may differ only where t ties (coincident surfaces): those are
    # legitimate alternative nearest hits, not kernel errors
    pr, pp = np.asarray(hr.prim)[m], np.asarray(hp.prim)[m]
    tr, tp_ = np.asarray(hr.t)[m], np.asarray(hp.t)[m]
    mismatch = pr != pp
    real_mismatch = mismatch & (np.abs(tr - tp_) > 1e-4 * np.maximum(tr, 1))
    assert real_mismatch.mean() < 0.002, (
        f"non-tie prim mismatch rate {real_mismatch.mean():.4f}"
    )
    mm = m & (np.asarray(hr.prim) == np.asarray(hp.prim))
    np.testing.assert_allclose(
        np.asarray(hr.u)[mm], np.asarray(hp.u)[mm], rtol=1e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(hr.v)[mm], np.asarray(hp.v)[mm], rtol=1e-2, atol=2e-3
    )

    occ_r = np.asarray(ref.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    occ_p = np.asarray(pk.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    np.testing.assert_array_equal(occ_r, occ_p)


@pytest.mark.parametrize("routed", [True, "global", False],
                         ids=["routed", "global", "scan"])
def test_multidomain_cluster_matches_brute(routed):
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    scene = wisp_cloud(n_blobs=8, tris_per_blob=80, extent=4.0)
    n = 1500
    o, d = _rand_rays(scene, n, 5)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, np.inf, jnp.float32)
    ref = BruteIntersector(scene, jnp)
    mk = MultiDomainClusterIntersector(scene, n_domains=6, routed=routed)
    hr = ref.intersect(o, d, tmin, tmax)
    hm = mk.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hr.valid), np.asarray(hm.valid))
    m = np.asarray(hr.valid)
    np.testing.assert_allclose(
        np.asarray(hr.t)[m], np.asarray(hm.t)[m], rtol=2e-4, atol=2e-5
    )
    occ_r = np.asarray(ref.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    occ_m = np.asarray(mk.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    np.testing.assert_array_equal(occ_r, occ_m)


@pytest.mark.parametrize("packet", [128, 256], ids=["p128", "p256"])
def test_multidomain_cluster_narrow_packets(packet):
    """Narrow-packet kernels (r4 incoherent-wavefront lever) produce the
    same hits as the widest 512-lane configuration — width only changes
    union economics, never results."""
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    scene = wisp_cloud(n_blobs=8, tris_per_blob=80, extent=4.0)
    n = 700  # not a multiple of any width (tests padding)
    o, d = _rand_rays(scene, n, 7)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, np.inf, jnp.float32)
    wide = MultiDomainClusterIntersector(scene, n_domains=6, packet=512)
    slim = MultiDomainClusterIntersector(scene, n_domains=6, packet=packet)
    hw = wide.intersect(o, d, tmin, tmax)
    hs = slim.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hw.valid), np.asarray(hs.valid))
    np.testing.assert_array_equal(np.asarray(hw.prim), np.asarray(hs.prim))
    np.testing.assert_allclose(
        np.asarray(hw.t), np.asarray(hs.t), rtol=1e-6, atol=1e-6
    )
    occ_w = np.asarray(wide.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    occ_s = np.asarray(slim.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    np.testing.assert_array_equal(occ_w, occ_s)


def test_multidomain_cluster_size_64_matches_brute():
    """r4: cluster size is a build knob (kernels derive C from the page
    shapes).  C=64 halves the per-visit decode width — the r5 perf lever —
    and must commit identical hits."""
    from spray_tpu.kernels.multidomain import MultiDomainClusterIntersector

    scene = wisp_cloud(n_blobs=8, tris_per_blob=80, extent=4.0)
    n = 900
    o, d = _rand_rays(scene, n, 11)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, np.inf, jnp.float32)
    ref = BruteIntersector(scene, jnp)
    mk = MultiDomainClusterIntersector(scene, n_domains=6, cluster=64)
    hr = ref.intersect(o, d, tmin, tmax)
    hm = mk.intersect(o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hr.valid), np.asarray(hm.valid))
    m = np.asarray(hr.valid)
    np.testing.assert_allclose(
        np.asarray(hr.t)[m], np.asarray(hm.t)[m], rtol=2e-4, atol=2e-5
    )
    occ_r = np.asarray(ref.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    occ_m = np.asarray(mk.occluded(o, d, jnp.full(n, 1e30, jnp.float32)))
    np.testing.assert_array_equal(occ_r, occ_m)
