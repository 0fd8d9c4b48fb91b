"""Wideband path stage decomposition (VERDICT r3 item 7b).

Splits the fused wideband super-step (parallel/wideband._wideband_step)
into its two halves with slope timing (see roofline_bench):

  channelizer — u8 wideband bytes -> frames -> polyphase branches ->
                DFT-matmul channel mix -> u16 requantize
  decode      — the N-channel decode scan over the staged streams

and times the full fused step for cross-checking. Writes
WIDEBAND_STAGES.json. Usage: python tools/wideband_stage_bench.py
[n_channels=12] [window_blocks=1024]
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.roofline_bench import _ms_slope, _tiny_fetch  # noqa: E402


def main() -> None:
    n_channels = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    window_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from bench_wideband import build_wideband_capture
    from rtlamr_tpu.ops.channelizer import (
        channelize,
        iq_bytes_to_frames,
        requantize_u16,
    )
    from rtlamr_tpu.ops.frontend import decode_windows_scan, staged_geometry
    from rtlamr_tpu.parallel.wideband import WidebandDecoder
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WidebandDecoder(
        parsers,
        n_channels=n_channels,
        window_blocks=window_blocks,
        backend="pallas",
    )
    spec, chspec = dec.spec, dec.chspec
    geo = staged_geometry(spec)
    w = spec.window
    wb = build_wideband_capture(dec.cfg, n_channels, 1, w)
    wb_dev = jax.device_put(jnp.asarray(wb))
    hist = dec._wb_hist
    tail = dec._chan_tail
    firsts = jnp.zeros(n_channels, bool)
    _tiny_fetch(wb_dev)

    # Production pallas path: u16 packed planes -> fused kernel.
    from rtlamr_tpu.ops.channelizer import iq_bytes_to_planes_u16
    from rtlamr_tpu.ops.pallas_channelizer import (
        channelize_requantize_fused_u16,
    )

    wb_u16 = jax.device_put(jnp.asarray(wb.view(np.uint16)))
    _tiny_fetch(wb_u16)
    chan_pallas = jax.jit(
        lambda h, x: channelize_requantize_fused_u16(
            chspec, h, iq_bytes_to_planes_u16(chspec, x)
        )
    )
    ms_chan = _ms_slope(lambda: chan_pallas(hist, wb_u16))

    # jnp reference chain for contrast (the r4 production path).
    chan_fn = jax.jit(
        lambda h, x: requantize_u16(
            channelize(chspec, h, iq_bytes_to_frames(chspec, x))
        )
    )
    ms_chan_jnp = _ms_slope(lambda: chan_fn(hist, wb_dev))

    u16 = chan_pallas(hist, wb_u16)
    _tiny_fetch(u16)

    @jax.jit
    def stage_and_decode(u16_in, chan_tail, fi):
        staged = jnp.zeros((n_channels, geo.staged_samples), jnp.uint16)
        staged = staged.at[:, : spec.halo_staged].set(chan_tail)
        staged = staged.at[
            :, spec.halo_staged : spec.halo_staged + w
        ].set(u16_in)
        return decode_windows_scan(spec, staged, fi)

    ms_dec = _ms_slope(lambda: stage_and_decode(u16, tail, firsts))

    @jax.jit
    def full(h, x, chan_tail, fi):
        u = channelize_requantize_fused_u16(
            chspec, h, iq_bytes_to_planes_u16(chspec, x)
        )
        staged = jnp.zeros((n_channels, geo.staged_samples), jnp.uint16)
        staged = staged.at[:, : spec.halo_staged].set(chan_tail)
        staged = staged.at[
            :, spec.halo_staged : spec.halo_staged + w
        ].set(u)
        return decode_windows_scan(spec, staged, fi)

    ms_full = _ms_slope(lambda: full(hist, wb_u16, tail, firsts))

    samples = n_channels * w  # wideband samples per super-step
    result = {
        "metric": "wideband_stage_ms_per_superstep",
        "n_channels": n_channels,
        "window_blocks": window_blocks,
        "wideband_samples_per_superstep": samples,
        "channelizer_ms": round(ms_chan, 3),
        "channelizer_jnp_chain_ms": round(ms_chan_jnp, 3),
        "decode_scan_ms": round(ms_dec, 3),
        "full_fused_ms": round(ms_full, 3),
        "channelizer_share": round(ms_chan / ms_full, 3),
        "implied_full_band_MSps": round(samples / ms_full / 1e3, 1),
    }
    with open(os.path.join(_REPO, "WIDEBAND_STAGES.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
