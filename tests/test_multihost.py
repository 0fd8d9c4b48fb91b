"""Multi-host decode: two OS processes, jax.distributed over a localhost
coordinator, 2 virtual CPU devices per process (SURVEY.md §5.8 / §4 item 4).

Proves the DCN-seam behavior on real process boundaries:
- basic: a packet planted exactly on the host boundary is recovered once and
  only once, and the union of the per-process message sets equals the
  single-process oracle.
- hard: a capacity-overflow storm in the window AT the process seam (the
  escalation re-decode must reconstruct the true cross-process halo) plus a
  preamble plateau straddling the super-batch boundary (cross-super-batch
  seam dedup), over two consecutive super-batches.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = "tools/multihost_worker.py"
NUM_PROCS = 2
DEVS_PER_PROC = 2
SCAN_WINDOWS = 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, scenario):
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [tmp_path / f"proc{p}.json" for p in range(NUM_PROCS)]
    # Workers build their own CPU backends; drop the test session's forced
    # platform/device-count flags and make the package importable.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                WORKER,
                coordinator,
                str(NUM_PROCS),
                str(p),
                str(outs[p]),
                str(DEVS_PER_PROC),
                str(SCAN_WINDOWS),
                scenario,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd="/root/repo",
            env=env,
        )
        for p in range(NUM_PROCS)
    ]
    for p, proc in enumerate(procs):
        try:
            _, err = proc.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {p} timed out")
        assert proc.returncode == 0, f"worker {p} failed:\n{err.decode()}"
    return [json.loads(out.read_text()) for out in outs]


def _oracle_spec():
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser("scm", 8)]
    spec = WindowDecoder(parsers, window_blocks=None).spec
    return parsers, spec


def test_two_process_boundary_recovery(tmp_path):
    results = _run_workers(tmp_path, "basic")
    all_msgs = []
    for r in results:
        all_msgs.extend((m["block"], m["text"]) for m in r["messages"])

    # Oracle: single-process NumPy reference over the identical capture.
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import ReferenceDecoder
    from tools.multihost_worker import build_capture

    parsers, spec = _oracle_spec()
    oracle_dec = ReferenceDecoder([new_parser("scm", 8)], arithmetic="int")
    n_windows = NUM_PROCS * DEVS_PER_PROC * SCAN_WINDOWS
    iq = build_capture(oracle_dec.cfg, spec.window, n_windows, 8)
    want = [(b, str(m)) for b, m in oracle_dec.decode_capture(iq)]

    assert sorted(all_msgs) == sorted(want)
    ids = sorted(m["id"] for r in results for m in r["messages"])
    # The seam packet (222222) appears exactly once across both processes.
    assert ids == [111111, 222222, 333333]


def test_two_process_overflow_storm_and_batch_seam(tmp_path):
    """VERDICT r2 item 3: hit-overflow storm exactly on the process seam
    (escalation re-decode with the true cross-process halo) and a plateau
    straddling the super-batch boundary (cross-super-batch seam dedup)."""
    results = _run_workers(tmp_path, "hard")
    all_msgs = []
    for r in results:
        all_msgs.extend((m["block"], m["text"]) for m in r["messages"])

    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import ReferenceDecoder
    from tools.multihost_worker import build_capture_hard

    parsers, spec = _oracle_spec()
    oracle_dec = ReferenceDecoder([new_parser("scm", 8)], arithmetic="int")
    batch_windows = NUM_PROCS * DEVS_PER_PROC * SCAN_WINDOWS
    iq = build_capture_hard(
        oracle_dec.cfg, spec.window, batch_windows, 2, 8, spec.halo
    )
    want = [(b, str(m)) for b, m in oracle_dec.decode_capture(iq)]

    assert sorted(all_msgs) == sorted(want)
    ids = sorted(m["id"] for r in results for m in r["messages"])
    # Every planted packet exactly once: the seam packet (222222) through
    # the overflow escalation path, the batch-boundary plateau (555555)
    # deduplicated across super-batches.
    assert ids == [111111, 222222, 444444, 555555, 666666]
    # The storm actually escalated (max_hits=1 at the seam window).
    assert any(r["metrics"]["hit_overflows"] > 0 for r in results)
