"""Throughput benchmark — decoded IQ samples per second per chip.

Measures the full all-protocol decode engine (scm + scm+ + idm + r900, the
reference's ``-msgtype=all`` set at chip length 72): the fused Pallas device
window program, per-window result fetch, and host-side candidate parsing
with dedup, using the dispatch-ahead pipeline. The synthetic capture (with
real packets of all protocols embedded in noise) is staged into device HBM
once up front — the metric characterizes the decode engine per chip; ingest
bandwidth is a property of the host link (PCIe in production; a loopback
relay in this test rig).

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


def build_capture(cfg, n_windows: int, window_samples: int, halo: int) -> np.ndarray:
    from rtlamr_tpu.ref import synth

    total = halo + n_windows * window_samples
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
    window_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
    backend = sys.argv[3] if len(sys.argv) > 3 else "pallas"

    import jax
    import jax.numpy as jnp

    # Persist compiles across runs (remote-compile transports are slow).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import staged_geometry
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(
        parsers, window_blocks=window_blocks, max_hits=256, backend=backend
    )
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    n_windows = 8  # scan-batch size: one program + one fetch per 8 windows
    iq = build_capture(dec.cfg, n_windows, w, spec.halo)

    # Stage the capture once into HBM in the u16 StagedGeometry layout:
    # zero-copy u16 view of the raw interleaved bytes, placed at pad_shift,
    # stacked into the (K, staged_samples) batch the scan program consumes.
    print(
        f"staging {iq.size / 2 / 1e6:.1f} MS capture "
        f"({n_windows} windows of {w} samples, backend={backend})...",
        file=sys.stderr,
    )
    full = np.zeros(
        (n_windows - 1) * w + geo.staged_samples, np.uint16
    )
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    batch = np.stack(
        [full[i * w : i * w + geo.staged_samples] for i in range(n_windows)]
    )
    batch_dev = jax.block_until_ready(jax.device_put(jnp.asarray(batch)))

    # Warmup: compile, run one full cycle, and absorb the transport's
    # first-transfer initialization stall.
    np.asarray(batch_dev[0, :8])
    dec.reset()
    dec._first = False  # halos are staged, not zero-history
    warm = dec.decode_staged_batch(batch_dev)
    print(f"warmup done: {len(warm)} msgs", file=sys.stderr)

    # Timed loop: cycle the staged batch through the live pipeline (batched
    # device program + one packed fetch + host parse per window).
    dec.reset()
    dec._first = False
    n_iter = 0
    decoded = 0
    start = time.perf_counter()
    while True:
        msgs = dec.decode_staged_batch(batch_dev, drain=False)
        decoded += len(msgs)
        n_iter += n_windows
        elapsed = time.perf_counter() - start
        if elapsed >= seconds and n_iter >= 4 * n_windows:
            break
    decoded += len(dec.drain())
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
