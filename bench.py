"""Throughput benchmark — decoded IQ samples per second per chip.

Runs the full all-protocol pipeline (scm + scm+ + idm + r900, the
reference's ``-msgtype=all`` set, chip length 72) end-to-end on the real
device: host->device transfer of raw u8 IQ windows, the fused window
program, result fetch, and host-side parsing of candidates.

Baseline: the reference is a real-time receiver; its implicit SLO is to
sustain the configured sample rate (2,359,296 S/s at chip length 72,
main.go:189-196; BASELINE.md). ``vs_baseline`` is the real-time multiple
per chip. The BASELINE.json north star is >100x.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REALTIME_SAMPLE_RATE = 32768 * 72  # decode.go:133 at default chip length


def build_capture(cfg, n_windows: int, window_samples: int) -> np.ndarray:
    from rtlamr_tpu.ref import synth

    total = n_windows * window_samples
    bursts = []
    gap = cfg.packet_length + 7 * cfg.block_size
    offset = cfg.block_size
    i = 0
    while offset + cfg.packet_length < total:
        if i % 3 == 0:
            bits = synth.make_scm_bits(meter_id=1_000_000 + i, consumption=i)
            bursts.append(synth.bits_to_burst(bits, offset))
        elif i % 3 == 1:
            bits = synth.make_idm_bits(serial=2_000_000 + i)
            bursts.append(synth.bits_to_burst(bits, offset))
        else:
            digits = synth.make_r900_symbols(meter_id=3_000_000 + i)
            bursts.append(synth.r900_burst(digits, offset))
        offset += gap
        i += 1
    return synth.render_iq(total, bursts, cfg.chip_length, noise=3.0, seed=2)


def main() -> None:
    window_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=window_blocks, max_hits=512)
    w = dec.spec.window
    n_windows = 4
    iq = build_capture(dec.cfg, n_windows, w)
    windows = [iq[i * 2 * w : (i + 1) * 2 * w] for i in range(n_windows)]

    # Warmup: compile + first execution.
    dec.reset()
    msgs = dec.feed(windows[0])
    print(
        f"warmup done: window={w} samples, {len(msgs)} msgs in window 0",
        file=sys.stderr,
    )

    # Timed loop, cycling the pre-built windows through the live pipeline.
    dec.reset()
    n_iter = 0
    decoded = 0
    start = time.perf_counter()
    while True:
        msgs = dec.feed(windows[n_iter % n_windows])
        decoded += len(msgs)
        n_iter += 1
        elapsed = time.perf_counter() - start
        if elapsed >= seconds and n_iter >= 8:
            break
    elapsed = time.perf_counter() - start
    samples = n_iter * w
    rate = samples / elapsed

    print(
        f"{n_iter} windows, {samples / 1e6:.1f} MS in {elapsed:.2f}s, "
        f"{decoded} msgs, {rate / 1e6:.1f} MS/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "decode_samples_per_second_per_chip",
                "value": round(rate, 1),
                "unit": "samples/s",
                "vs_baseline": round(rate / REALTIME_SAMPLE_RATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
