"""Multi-host decode: two OS processes, jax.distributed over a localhost
coordinator, 2 virtual CPU devices per process (SURVEY.md §5.8 / §4 item 4).

Proves the DCN-seam behavior on real process boundaries: a packet planted
exactly on the host boundary is recovered once and only once, and the union
of the per-process message sets equals the single-process oracle.
"""

import json
import socket
import subprocess
import sys

import pytest

WORKER = "tools/multihost_worker.py"
NUM_PROCS = 2
DEVS_PER_PROC = 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_boundary_recovery(tmp_path):
    import os

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

    results = [json.loads(out.read_text()) for out in outs]
    all_msgs = []
    for r in results:
        all_msgs.extend((m["block"], m["text"]) for m in r["messages"])

    # Oracle: single-process NumPy reference over the identical capture.
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import ReferenceDecoder
    from tools.multihost_worker import build_capture

    parsers = [new_parser("scm", 8)]
    oracle_dec = ReferenceDecoder(parsers, arithmetic="int")
    # Reconstruct the worker's geometry: n_global = 2 procs * 2 devices,
    # scan_windows = 2 => 8 windows of the minimal halo-covering size.
    from rtlamr_tpu.decoder import WindowDecoder

    w = WindowDecoder(parsers, window_blocks=None).spec.window
    n_windows = NUM_PROCS * DEVS_PER_PROC * 2
    iq = build_capture(oracle_dec.cfg, w, n_windows, 8)
    want = [(b, str(m)) for b, m in oracle_dec.decode_capture(iq)]

    assert sorted(all_msgs) == sorted(want)
    ids = sorted(
        m["id"] for r in results for m in r["messages"]
    )
    # The seam packet (222222) appears exactly once across both processes.
    assert ids == [111111, 222222, 333333]
