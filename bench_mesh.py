"""Multi-chip throughput benchmark — samples/s over an n-device mesh.

Measures the scan-batched MeshDecoder (parallel/mesh.py): per super-batch,
one sharded device program decodes n_devices * scan_windows windows (halo
exchanged in-program via ppermute) and the host fetches one packed result
buffer per batch, dispatch-ahead one batch deep.

Usage:
  python bench_mesh.py [n_devices] [window_blocks] [seconds] [scan_windows]
                       [--overhead]

On the TPU rig (one real chip) this gives the absolute per-chip number;
``--overhead`` additionally measures the plain single-chip WindowDecoder at
the same settings and reports the mesh engine's per-chip efficiency against
it — the measurable part of scaling on a 1-chip rig. True multi-chip
scaling efficiency needs >=2 real chips; the communication cost is bounded
analytically: the only cross-shard traffic is one halo of
2*(PacketLength+SymbolLength) bytes per shard per super-batch
(~212 KB at chip length 72) against window_blocks*scan_windows*2*BlockSize
bytes of decoded samples per shard (~134 MB at the defaults) — a 0.16%
traffic ratio over ICI, far below the >95%-scaling budget.

Requesting more devices than the rig has falls back to a virtual CPU mesh
(plumbing/correctness only; CPU absolute numbers are meaningless and the
virtual devices share host cores, so no efficiency is reported there).

Prints one JSON line:
  {"metric": "mesh_decode_samples_per_second", "value": ..., "unit": ...,
   "n_devices": N, "per_chip": ..., "efficiency_vs_single_chip": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from bench import REALTIME_SAMPLE_RATE, build_capture


def run_mesh(parsers_names, n_devices, window_blocks, seconds, scan_windows,
             backend):
    import jax

    from rtlamr_tpu.parallel.mesh import MeshDecoder, stage_superbatch
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in parsers_names]
    dec = MeshDecoder(
        parsers,
        devices=jax.devices()[:n_devices],
        window_blocks=window_blocks,
        max_hits=256,
        backend=backend,
        scan_windows=scan_windows,
    )
    spec = dec.spec
    w = spec.window
    n_windows = n_devices * scan_windows
    iq = build_capture(dec.cfg, n_windows, w, spec.halo)
    # Windows own their samples at [halo, ...); drop the capture's halo head.
    iq_body = iq[2 * spec.halo :]

    print(
        f"staging {iq_body.size / 2 / 1e6:.1f} MS over {n_devices} device(s) "
        f"({n_windows} windows of {w} samples, K={scan_windows}, "
        f"backend={backend})...",
        file=sys.stderr,
    )
    sb = stage_superbatch(spec, iq_body, n_devices, scan_windows)
    sb_dev = jax.block_until_ready(jax.device_put(sb, dec._sharding))

    dec.reset()
    dec._first = False
    warm = dec.decode_superbatch_staged(sb_dev)
    print(f"warmup done: {len(warm)} msgs", file=sys.stderr)

    dec.reset()
    dec._first = False
    n_iter = 0
    decoded = 0
    start = time.perf_counter()
    while True:
        msgs = dec.decode_superbatch_staged(sb_dev, drain=False)
        decoded += len(msgs)
        n_iter += n_windows
        elapsed = time.perf_counter() - start
        if elapsed >= seconds and n_iter >= 3 * n_windows:
            break
    decoded += len(dec.drain())
    elapsed = time.perf_counter() - start
    rate = n_iter * w / elapsed
    print(
        f"n={n_devices}: {n_iter} windows, {n_iter * w / 1e6:.1f} MS in "
        f"{elapsed:.2f}s, {decoded} msgs, {rate / 1e6:.1f} MS/s total "
        f"({rate / n_devices / 1e6:.1f} MS/s/chip)",
        file=sys.stderr,
    )
    return rate


def run_single(parsers_names, window_blocks, seconds, scan_windows, backend):
    """Plain WindowDecoder at the same settings (the mesh-overhead yardstick)."""
    import jax
    import jax.numpy as jnp

    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import staged_geometry
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in parsers_names]
    dec = WindowDecoder(
        parsers, window_blocks=window_blocks, max_hits=256, backend=backend
    )
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    iq = build_capture(dec.cfg, scan_windows, w, spec.halo)
    full = np.zeros((scan_windows - 1) * w + geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    batch = np.stack(
        [full[i * w : i * w + geo.staged_samples] for i in range(scan_windows)]
    )
    batch_dev = jax.block_until_ready(jax.device_put(jnp.asarray(batch)))
    dec.reset()
    dec._first = False
    dec.decode_staged_batch(batch_dev)  # warmup
    dec.reset()
    dec._first = False
    n_iter = 0
    start = time.perf_counter()
    while True:
        dec.decode_staged_batch(batch_dev, drain=False)
        n_iter += scan_windows
        elapsed = time.perf_counter() - start
        if elapsed >= seconds and n_iter >= 3 * scan_windows:
            break
    dec.drain()
    elapsed = time.perf_counter() - start
    rate = n_iter * w / elapsed
    print(
        f"single-chip WindowDecoder: {rate / 1e6:.1f} MS/s", file=sys.stderr
    )
    return rate


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    n_devices = int(args[0]) if len(args) > 0 else len(jax.devices())
    window_blocks = int(args[1]) if len(args) > 1 else 1024
    seconds = float(args[2]) if len(args) > 2 else 10.0
    scan_windows = int(args[3]) if len(args) > 3 else 4
    if len(jax.devices()) < n_devices:
        # The hosting image pins JAX_PLATFORMS to the real chip; fall back to
        # a virtual CPU mesh for scaling-shape runs (see __graft_entry__.py).
        import jax.extend.backend as jeb

        jax.config.update("jax_platforms", "cpu")
        jeb.clear_backends()
        jax.config.update("jax_num_cpu_devices", n_devices)
    backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    names = ("scm", "scm+", "idm", "r900")

    rate = run_mesh(names, n_devices, window_blocks, seconds, scan_windows,
                    backend)
    efficiency = None
    if "--overhead" in flags:
        rate1 = run_single(names, window_blocks, seconds, scan_windows,
                           backend)
        efficiency = round((rate / n_devices) / rate1, 4)

    print(
        json.dumps(
            {
                "metric": "mesh_decode_samples_per_second",
                "value": round(rate, 1),
                "unit": "samples/s",
                "n_devices": n_devices,
                "per_chip": round(rate / n_devices, 1),
                "vs_baseline_per_chip": round(
                    rate / n_devices / REALTIME_SAMPLE_RATE, 2
                ),
                "efficiency_vs_single_chip": efficiency,
            }
        )
    )


if __name__ == "__main__":
    main()
