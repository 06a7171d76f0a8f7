"""Worker/Waiter facade, config system, RangeDemoExplicit, gt_bytes, ffi."""

import pytest

from bellman_mpc_tpu.config import Config
from bellman_mpc_tpu.parallel import Waiter, Worker, log2_floor


def test_log2_floor():
    # multicore.rs:133-143 test values
    assert log2_floor(1) == 0
    assert log2_floor(2) == 1
    assert log2_floor(3) == 1
    assert log2_floor(4) == 2
    assert log2_floor(15) == 3


def test_worker_scope_and_compute():
    w = Worker(num_threads=4)
    results = [0] * 100
    with w.scope(100) as (scope, chunk):
        assert chunk == 25
        for start in range(0, 100, chunk):
            def job(s=start):
                for i in range(s, min(s + chunk, 100)):
                    results[i] = i * i
            scope.spawn(job)
    assert results == [i * i for i in range(100)]

    waiter = w.compute(lambda: sum(range(1000)))
    assert waiter.wait() == 499500
    assert waiter.done()


def test_waiter_wait_inside_pool_guard():
    """multicore.rs:100-108: joining a pending Waiter from a pool worker
    thread is a deadlock hazard and must raise."""
    import threading

    w = Worker(num_threads=2)
    release = threading.Event()
    slow = w.compute(lambda: release.wait(5))

    def misuse():
        try:
            slow.wait()  # pending + called from pool thread -> guard fires
            return None
        except RuntimeError as e:
            return e

    err_waiter = w.compute(misuse)
    err = err_waiter.wait()
    release.set()
    assert isinstance(err, RuntimeError) and "worker thread" in str(err)
    assert slow.wait() is True  # main-thread wait stays legal
    # waiting on an already-done future from a pool thread is fine too
    done = w.compute(lambda: 7)
    done.wait()
    assert w.compute(lambda: done.wait()).wait() == 7


def test_config_from_env(monkeypatch):
    monkeypatch.setenv("BMT_MSM_STRATEGY", "pippenger")
    monkeypatch.setenv("BMT_PIPPENGER_C", "12")
    monkeypatch.setenv("BMT_MESH_SHAPE", "4,2")
    cfg = Config.from_env()
    assert cfg.msm_strategy == "pippenger"
    assert cfg.pippenger_c == 12
    assert cfg.mesh_shape == (4, 2)
    assert cfg.deterministic


def test_range_demo_explicit():
    from bellman_mpc_tpu.groth16 import (
        DUMMY,
        create_proof,
        generate_random_parameters,
        prepare_verifying_key,
        verify_proof,
    )
    from bellman_mpc_tpu.models import RangeDemoExplicit

    kwargs = dict(
        a=1, b=2, n=4, w=9, wArray=[1, 0, 0, 1], crArray=[1, 1, 1, 1],
        less_or_equal=1, less=1, not_all_zeros=1,
    )
    params = generate_random_parameters(DUMMY, RangeDemoExplicit(**kwargs))
    pvk = prepare_verifying_key(DUMMY, params.vk)
    proof = create_proof(DUMMY, RangeDemoExplicit(**kwargs), params, 27134, 17146)
    verify_proof(DUMMY, pvk, proof, [])  # no public inputs in this variant


def test_gt_bytes_roundtrip():
    from bellman_mpc_tpu.curves import pairing_host as ph
    from bellman_mpc_tpu.curves.host import G1, G2
    from bellman_mpc_tpu.utils import gt_format, gt_parse

    e = ph.pairing(G1.generator, G2.generator)
    raw = gt_format(e)
    assert len(raw) == 576  # gt_bytes.rs:32-39 pinned size
    assert gt_parse(raw) == tuple(
        tuple(tuple(c % ph.P for c in f2) for f2 in f6) for f6 in e
    ) or gt_parse(raw) == e


def test_ffi_surface():
    from bellman_mpc_tpu import ffi

    ffi.test_bellman()  # no-op
    # process() is slow by design (50M increments); just check it's callable
    assert callable(ffi.process)
