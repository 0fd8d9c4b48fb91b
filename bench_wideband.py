"""Wideband channelize-and-decode throughput — the frequency-parallel path.

Measures the fused wideband program (parallel/wideband._wideband_step: u8
wideband bytes -> polyphase channelizer -> DFT-matmul mix -> requantize ->
N-channel decode scan -> one packed result fetch) plus per-channel host
parsing, with the dispatch-ahead pipeline. Default N=12 channels at chip
length 72 covers 28.3 MHz — wider than the whole 902-928 MHz ERT hop band
(misc/modes.go:14-16), i.e. the entire band decoded at once on one chip;
the reference's dongle covers ~1/12 of it.

The wideband capture is pre-staged into HBM (the metric characterizes the
decode engine; ingest bandwidth is a property of the host link).

Usage: python bench_wideband.py [n_channels] [window_blocks] [seconds]

Prints one JSON line:
  {"metric": "wideband_samples_per_second_per_chip", ...,
   "channel_samples_per_second": ..., "band_coverage_realtime": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REALTIME_SAMPLE_RATE = 32768 * 72  # per-channel rate (decode.go:133)


def build_wideband_capture(cfg, n_channels, n_chunks, window):
    from rtlamr_tpu.ref import synth

    total = n_chunks * window
    gap = cfg.packet_length + 5 * cfg.block_size
    planted = []
    offset = cfg.block_size
    i = 0
    while offset + cfg.packet_length < total - cfg.packet_length:
        c = i % n_channels
        if i % 3 == 0:
            planted.append((c, synth.bits_to_burst(
                synth.make_scm_bits(meter_id=1_000_000 + i, consumption=i),
                offset)))
        elif i % 3 == 1:
            planted.append((c, synth.bits_to_burst(
                synth.make_idm_bits(serial=2_000_000 + i), offset)))
        else:
            planted.append((c, synth.r900_burst(
                synth.make_r900_symbols(meter_id=3_000_000 + i), offset)))
        offset += gap
        i += 1
    return synth.render_wideband(
        total, planted, n_channels, cfg.chip_length,
        amplitude=90.0, noise=2.0, seed=7,
    )


def main() -> None:
    n_channels = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    # 1024-block per-channel windows: per-window fixed costs (hit compaction,
    # packing) amortize 4x better than the old 256 default — measured 508 vs
    # 212 MS/s at 12 channels. Staged state is 12 x ~17 MB, well within HBM.
    window_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from rtlamr_tpu.parallel.wideband import WidebandDecoder
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WidebandDecoder(
        parsers,
        n_channels=n_channels,
        window_blocks=window_blocks,
        max_hits=256,
        backend="pallas" if jax.default_backend() not in ("cpu",) else "jnp",
    )
    w = dec.spec.window
    n_chunks = 4
    wb = build_wideband_capture(dec.cfg, n_channels, n_chunks, w)
    print(
        f"staging {wb.size / 2 / 1e6:.1f} MS wideband capture "
        f"({n_channels} channels x {n_chunks} windows of {w})...",
        file=sys.stderr,
    )
    cb = dec.window_bytes
    # Stage as the zero-copy u16 packed-pair view (the production feed
    # path's layout — ops/channelizer.iq_bytes_to_planes_u16 fast path).
    chunks = [
        jax.device_put(
            jnp.asarray(wb[i * cb : (i + 1) * cb].view(np.uint16))
        )
        for i in range(n_chunks)
    ]
    jax.block_until_ready(chunks)

    # Warmup: compile + absorb first-transfer stalls.
    dec.reset()
    warm = 0
    for ch in chunks:
        warm += len(dec._process_chunk(ch))
    warm += len(dec.drain())
    print(f"warmup done: {warm} msgs", file=sys.stderr)

    dec.reset()
    dec._first = False
    n_iter = 0
    decoded = 0
    start = time.perf_counter()
    while True:
        for ch in chunks:
            decoded += len(dec._process_chunk(ch))
        n_iter += n_chunks
        elapsed = time.perf_counter() - start
        if elapsed >= seconds and n_iter >= 3 * n_chunks:
            break
    decoded += len(dec.drain())
    elapsed = time.perf_counter() - start
    wide_samples = n_iter * w * n_channels
    rate = wide_samples / elapsed
    chan_rate = n_iter * w * n_channels / elapsed  # == rate (critically sampled)

    print(
        f"{n_iter} chunks x {n_channels} ch, {wide_samples / 1e6:.1f} MS "
        f"wideband in {elapsed:.2f}s, {decoded} msgs, "
        f"{rate / 1e6:.1f} MS/s wideband "
        f"({rate / REALTIME_SAMPLE_RATE:.1f}x single-channel real-time)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "wideband_samples_per_second_per_chip",
                "value": round(rate, 1),
                "unit": "samples/s",
                "n_channels": n_channels,
                "channel_samples_per_second": round(chan_rate, 1),
                "band_coverage_realtime": round(
                    rate / (n_channels * REALTIME_SAMPLE_RATE), 2
                ),
                "vs_baseline": round(rate / REALTIME_SAMPLE_RATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
