"""Analytic ICI scaling model (utils/scaling.py) sanity + exactness."""

import numpy as np

from xclip_tpu.utils import scaling


def test_ring_allreduce_bytes_exact():
    # N=4, payload 400 MB: reduce-scatter moves 3/4, all-gather 3/4 -> 600 MB
    assert scaling.ring_allreduce_bytes_per_chip(400_000_000, 4) == 600_000_000
    assert scaling.ring_allreduce_bytes_per_chip(400_000_000, 1) == 0.0
    # N -> inf approaches 2x payload
    big = scaling.ring_allreduce_bytes_per_chip(100, 10_000)
    assert 199.9 < big < 200.0


def test_feature_gather_scales_with_global_batch():
    b1 = scaling.feature_gather_bytes_per_chip(128, 1024, 4)
    b2 = scaling.feature_gather_bytes_per_chip(128, 1024, 8)
    assert b2 > b1  # the global feature matrix grows with N
    assert scaling.feature_gather_bytes_per_chip(128, 1024, 1) == 0.0


def test_efficiency_monotone_and_bounded():
    kw = dict(step_time_ms=84.5, local_batch=128, grad_bytes=408_000_000)
    effs = [scaling.predict(n, **kw).efficiency for n in (1, 4, 16, 64, 256)]
    assert effs[0] == 1.0
    assert all(e2 <= e1 + 1e-12 for e1, e2 in zip(effs, effs[1:]))
    assert all(0.0 < e <= 1.0 for e in effs)


def test_single_chip_returns_measured_rate():
    p = scaling.predict(1, step_time_ms=100.0, local_batch=128,
                        grad_bytes=408_000_000)
    np.testing.assert_allclose(p.images_per_sec_per_chip, 1280.0)
    assert p.dominant == "compute"
    assert p.collective_ms == 0.0


def test_accum_amortizes_gradient_allreduce():
    kw = dict(local_batch=128, grad_bytes=408_000_000, overlap=True)
    # accum 2: the step does 2 microbatches (2x compute) but ONE all-reduce,
    # so at a collective-bound scale the efficiency must be higher
    e1 = scaling.predict(256, step_time_ms=84.5, accum_freq=1, **kw)
    e2 = scaling.predict(256, step_time_ms=169.0, accum_freq=2, **kw)
    if e1.dominant != "compute":
        assert e2.efficiency > e1.efficiency


def test_cross_pod_drops_to_dcn():
    kw = dict(step_time_ms=84.5, local_batch=128, grad_bytes=408_000_000)
    pod = scaling.predict(256, **kw)
    xpod = scaling.predict(512, **kw)
    assert xpod.link_gbps < pod.link_gbps
    assert xpod.efficiency < pod.efficiency
    assert xpod.dominant == "dcn"


def test_serial_bound_never_beats_overlap():
    kw = dict(step_time_ms=84.5, local_batch=128, grad_bytes=408_000_000)
    for n in (4, 64, 256):
        s = scaling.predict(n, overlap=False, **kw)
        o = scaling.predict(n, overlap=True, **kw)
        assert s.images_per_sec_per_chip <= o.images_per_sec_per_chip + 1e-9
