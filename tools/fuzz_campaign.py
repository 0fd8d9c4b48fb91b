"""Extended randomized conformance campaign (beyond the 10-seed unit test).

Reuses tests/test_fuzz_conformance.random_capture: random protocol mixes,
chip lengths, offsets, amplitudes and noise; the TPU window pipeline
(randomly jnp or pallas-interpret backend, random window/max_hits) must
reproduce the exact-int oracle's message stream byte-for-byte on every
capture. Writes FUZZ_CAMPAIGN.json.

Usage: python tools/fuzz_campaign.py [n=150] (CPU; forces jax_platforms).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rtlamr_tpu.decoder import WindowDecoder  # noqa: E402
from rtlamr_tpu.protocols import new_parser  # noqa: E402
from rtlamr_tpu.ref import ReferenceDecoder  # noqa: E402
from test_fuzz_conformance import PROTOS, random_capture  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    rng_master = np.random.default_rng(5000)
    failures = []
    msgs_total = 0
    t0 = time.time()
    for i in range(n):
        rng = np.random.default_rng(int(rng_master.integers(1 << 62)))
        chip_length = int(rng.choice([8, 32, 56, 72, 96]))
        k = int(rng.integers(1, len(PROTOS) + 1))
        names = list(rng.choice(PROTOS, size=k, replace=False))
        iq = random_capture(rng, names, chip_length)

        oracle = ReferenceDecoder(
            [new_parser(p, chip_length) for p in names], arithmetic="int"
        )
        want = [(b, str(m)) for b, m in oracle.decode_capture(iq)]

        backend = str(rng.choice(["jnp", "pallas"]))
        wb = int(rng.choice([2, 8, 32]))
        min_wb = -(
            -(oracle.cfg.packet_length + oracle.cfg.symbol_length)
            // oracle.cfg.block_size
        )
        dec = WindowDecoder(
            [new_parser(p, chip_length) for p in names],
            window_blocks=max(wb, min_wb),
            max_hits=int(rng.choice([16, 256])),
            backend=backend,
        )
        got = [(b, str(m)) for b, m in dec.decode_capture(iq)]
        msgs_total += len(want)
        if got != want:
            failures.append(
                {"i": i, "names": names, "chip": chip_length,
                 "backend": backend, "want": len(want), "got": len(got)}
            )
            print(f"FAIL i={i} {names} cl={chip_length} {backend}",
                  file=sys.stderr)
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{n} ok, {msgs_total} msgs, "
                  f"{time.time() - t0:.0f}s", file=sys.stderr)
    out = {
        "metric": "fuzz_conformance_campaign",
        "captures": n,
        "messages_compared": msgs_total,
        "divergent_captures": len(failures),
        "failures": failures,
        "note": "pipeline (random jnp/pallas backend, window, max_hits) vs "
                "exact-int oracle, byte-identical message streams required",
    }
    with open(os.path.join(_REPO, "FUZZ_CAMPAIGN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "failures"}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
