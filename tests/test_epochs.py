"""Config-4 rung: out-of-core epoch scheduler == brute oracle; speculative ==
baseline; commit invariant property test (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from spray_tpu.io.scenes import wisp_cloud
from spray_tpu.oracle.brute import BruteIntersector
from spray_tpu.sched.epochs import OOCIntersector, init_state, needed_mask
from spray_tpu.domains.partition import partition_scene


def _rand_rays(scene, n, seed=0):
    v = np.asarray(scene.vertices)
    lo, hi = v.min(0), v.max(0)
    rng = np.random.RandomState(seed)
    o = rng.uniform(lo - 1, hi + 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


SCENE = wisp_cloud(n_blobs=12, tris_per_blob=80, extent=4.0, seed=5)
DSET = partition_scene(SCENE, 16, leaf_size=8)


def _intersect_all(inter, o, d, n):
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, np.inf, jnp.float32)
    return inter.intersect(o, d, tmin, tmax)


def test_ooc_matches_brute_and_speculation_equivalence():
    n = 512
    o, d = _rand_rays(SCENE, n, seed=2)
    ref = BruteIntersector(SCENE, jnp)
    hr = _intersect_all(ref, o, d, n)

    spec = OOCIntersector(dset=DSET, num_slots=4, speculate=True)
    base = OOCIntersector(dset=DSET, num_slots=4, speculate=False)
    hs = _intersect_all(spec, o, d, n)
    hb = _intersect_all(base, o, d, n)

    for h in (hs, hb):
        np.testing.assert_array_equal(np.asarray(hr.valid), np.asarray(h.valid))
        m = np.asarray(hr.valid)
        np.testing.assert_allclose(
            np.asarray(hr.t)[m], np.asarray(h.t)[m], rtol=1e-5, atol=1e-6
        )
        assert (np.asarray(hr.prim)[m] == np.asarray(h.prim)[m]).mean() > 0.998

    # speculative and baseline produce the IDENTICAL committed hits
    np.testing.assert_array_equal(np.asarray(hs.prim), np.asarray(hb.prim))
    np.testing.assert_array_equal(np.asarray(hs.t), np.asarray(hb.t))

    # speculation buys fewer-or-equal epochs, at the cost of extra traces
    assert spec.stats.epochs <= base.stats.epochs
    assert spec.stats.rays_speculated > 0
    assert base.stats.rays_speculated == 0
    # residency actually cycled domains through limited slots
    assert spec.stats.domain_loads >= 4


def test_ooc_occlusion_matches_brute():
    n = 256
    o, d = _rand_rays(SCENE, n, seed=9)
    ref = BruteIntersector(SCENE, jnp)
    spec = OOCIntersector(dset=DSET, num_slots=4, speculate=True)
    tmax = jnp.full(n, 1e30, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ref.occluded(o, d, tmax)),
        np.asarray(spec.occluded(o, d, tmax)),
    )


def test_commit_invariant_property():
    """For every committed ray: no unprocessed overlapped domain has
    entry_t < committed t (the reference's commit rule, SURVEY §3.3)."""
    n = 512
    o, d = _rand_rays(SCENE, n, seed=13)
    inter = OOCIntersector(dset=DSET, num_slots=4, speculate=True)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, np.inf, jnp.float32)
    state = init_state(inter.dset, o, d, tmin, tmax)
    state = inter._run_epochs(state)
    # after convergence the needed mask must be empty...
    assert not bool(needed_mask(state).any())
    # ...which IS the invariant: unprocessed & overlapped => entry_t >= best_t
    entry = np.asarray(state.entry_t)
    processed = np.asarray(state.processed)
    best = np.asarray(state.best_t)
    viol = (~processed) & np.isfinite(entry) & (entry < best[:, None])
    assert not viol.any()


def test_ooc_cluster_backend_matches_brute():
    """The Pallas cluster-kernel epoch backend (TPU default; interpret mode
    here) commits the same hits as the brute oracle and the jnp backend."""
    n = 512
    o, d = _rand_rays(SCENE, n, seed=2)
    ref = BruteIntersector(SCENE, jnp)
    hr = _intersect_all(ref, o, d, n)
    spec = OOCIntersector(
        SCENE, n_domains=8, num_slots=4, speculate=True,
        backend="cluster", interpret=True,
    )
    hc = _intersect_all(spec, o, d, n)
    np.testing.assert_array_equal(np.asarray(hr.valid), np.asarray(hc.valid))
    m = np.asarray(hr.valid)
    np.testing.assert_allclose(
        np.asarray(hc.t)[m], np.asarray(hr.t)[m], rtol=1e-4, atol=1e-5
    )
    # occlusion path
    tmax = jnp.full(n, 1e30, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ref.occluded(o, d, tmax)),
        np.asarray(spec.occluded(o, d, tmax)),
    )
    assert spec.stats.epochs > 1  # actually exercised the scheduler


def test_ooc_device_batched_matches_host_driven():
    """r4 device-batched epoch loop (epoch_batch_cluster: lax.while on
    device, one host sync per residency change) commits the same hits and
    occlusion as the host-driven per-epoch loop, through a real OOC
    schedule (8 domains through 4 slots)."""
    n = 512
    o, d = _rand_rays(SCENE, n, seed=9)
    host = OOCIntersector(
        SCENE, n_domains=8, num_slots=4, speculate=True,
        backend="cluster", interpret=True, device_batched=False,
    )
    dev = OOCIntersector(
        SCENE, n_domains=8, num_slots=4, speculate=True,
        backend="cluster", interpret=True, device_batched=True,
    )
    hh = _intersect_all(host, o, d, n)
    hd = _intersect_all(dev, o, d, n)
    np.testing.assert_array_equal(np.asarray(hh.valid), np.asarray(hd.valid))
    np.testing.assert_array_equal(np.asarray(hh.prim), np.asarray(hd.prim))
    np.testing.assert_allclose(
        np.asarray(hh.t), np.asarray(hd.t), rtol=1e-6, atol=1e-6
    )
    tmax = jnp.full(n, 1e30, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(host.occluded(o, d, tmax)),
        np.asarray(dev.occluded(o, d, tmax)),
    )
    # the batch structure must touch the host far less: one sync per
    # residency change, not per epoch
    assert len(dev.epoch_log) <= len(host.epoch_log)
    assert dev.stats.epochs >= 1 and dev.stats.rays_traced > 0


def test_ooc_bounded_speculation_matches_unbounded():
    """r5 bounded speculation (speculate=k: each epoch traces only a ray's
    k nearest needed domains) commits the SAME hits/occlusion as unbounded
    speculation and strict baseline, with activation counts strictly
    between the two (the commit set is policy-invariant; only the work
    schedule differs)."""
    n = 512
    o, d = _rand_rays(SCENE, n, seed=11)
    tmax = jnp.full(n, 1e30, jnp.float32)
    results = {}
    for name, speculate in (("base", False), ("k2", 2), ("full", True)):
        isect = OOCIntersector(
            SCENE, n_domains=8, num_slots=8, speculate=speculate,
            backend="cluster", interpret=True,
        )
        h = _intersect_all(isect, o, d, n)
        occ = np.asarray(isect.occluded(o, d, tmax))
        results[name] = (h, occ, isect.stats.rays_traced)
    h0, occ0, act_base = results["base"]
    for name in ("k2", "full"):
        h, occ, _ = results[name]
        np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h.valid))
        np.testing.assert_array_equal(np.asarray(h0.prim), np.asarray(h.prim))
        np.testing.assert_allclose(
            np.asarray(h0.t), np.asarray(h.t), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(occ0, occ)
    # bounded does no more work than unbounded, no less than strict
    assert act_base <= results["k2"][2] <= results["full"][2]
