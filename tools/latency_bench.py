"""Live feed->emit latency bench (VERDICT r3 item 6).

Simulates the live path at REAL-TIME pacing: block-sized chunks of a
synthetic SCM capture are fed at the configured sample rate (2.36 MS/s at
chip 72), and each planted packet's latency is measured from the wall-clock
arrival of its final sample to the moment its decoded message is returned.

Three committed points trace the latency/throughput trade:
  windowblocks=4  + synchronous completion  (the CLI's -latency preset)
  windowblocks=16 + synchronous completion
  windowblocks=64 + dispatch-ahead          (the CLI throughput default)

Writes LATENCY_BENCH.json at the repo root. Runs on forced CPU (the
real-time rate is ~300x below the chip's capacity, so the platform does
not change the conclusion; pacing dominates).

Usage: python tools/latency_bench.py [seconds_per_point=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def run_point(window_blocks: int, sync: bool, seconds: float) -> dict:
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import synth

    chip = 72
    dec = WindowDecoder([new_parser("scm", chip)], window_blocks=window_blocks)
    cfg = dec.cfg
    rate = cfg.sample_rate
    bs2 = cfg.block_size2  # bytes per block
    n_blocks = int(seconds * rate / cfg.block_size)
    total = n_blocks * cfg.block_size

    # One packet roughly every 0.25 s, each ending well inside the stream.
    pkt_len = 96 * cfg.symbol_length
    spacing = rate // 4
    planted = {}
    bursts = []
    mid = 10_000_000
    off = cfg.block_size
    while off + pkt_len + dec.spec.halo < total - dec.spec.window:
        bursts.append(
            synth.bits_to_burst(
                synth.make_scm_bits(meter_id=mid, consumption=1), off
            )
        )
        planted[mid] = off + pkt_len  # final sample of the packet
        mid += 1
        off += spacing
    iq = synth.render_iq(total, bursts, chip, noise=2.0, seed=12)

    # Warmup compile + first-dispatch overheads outside the paced loop,
    # on THIS instance (zeros through the full dispatch/complete path),
    # then reset stream state.
    dec.feed(np.zeros(dec.window_bytes, np.uint8))
    dec.drain()
    dec.reset()

    block_dt = cfg.block_size / rate
    arrivals = {}  # block index -> arrival wall time
    latencies = []
    behind_s = 0.0
    t0 = time.monotonic()
    for b in range(n_blocks):
        target = t0 + (b + 1) * block_dt  # block b fully arrived at target
        now = time.monotonic()
        if now < target:
            time.sleep(target - now)
        else:
            behind_s = max(behind_s, now - target)
        arrivals[b] = time.monotonic()
        msgs = dec.feed(iq[b * bs2 : (b + 1) * bs2])
        if sync:
            msgs = list(msgs) + list(dec.drain())
        if msgs:
            t_emit = time.monotonic()
            for _blk, m in msgs:
                end = planted.get(m.meter_id())
                if end is None:
                    continue
                arr = arrivals[end // cfg.block_size]
                latencies.append((t_emit - arr) * 1e3)
    lat = np.asarray(latencies)
    return {
        "window_blocks": window_blocks,
        "sync_completion": sync,
        "window_ms_of_airtime": round(dec.spec.window / rate * 1e3, 2),
        "messages": int(lat.size),
        "latency_ms_mean": round(float(lat.mean()), 1) if lat.size else None,
        "latency_ms_p95": (
            round(float(np.percentile(lat, 95)), 1) if lat.size else None
        ),
        "latency_ms_max": round(float(lat.max()), 1) if lat.size else None,
        "realtime_sustained": behind_s < 0.05,
        "max_backlog_s": round(behind_s, 3),
        "decoder_feed_to_emit_ms": dec.metrics.extra.get(
            "feed_to_emit_ms_max"
        ),
    }


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0

    points = [
        run_point(4, True, seconds),  # the -latency preset
        run_point(16, True, seconds),
        run_point(64, False, seconds),  # the throughput default
    ]
    result = {
        "metric": "live_feed_to_emit_latency_ms",
        "value": points[0]["latency_ms_mean"],
        "unit": "ms (mean, -latency preset)",
        "sample_rate": 2359296,
        "seconds_per_point": seconds,
        "points": points,
        "notes": [
            "real-time paced feed of block-sized chunks; latency = wall time from the packet's final sample arriving to its message being returned",
            "windowblocks=64 without sync shows the throughput default's batching+dispatch-ahead latency for contrast",
        ],
    }
    with open(os.path.join(_REPO, "LATENCY_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
