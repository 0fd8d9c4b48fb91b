"""Sub-stage probe of the wideband channelizer (WIDEBAND_STAGES follow-up).

Slope-times each piece of the 58.7 ms channelizer half at the bench shape
(N=12, F=8.39M frames) plus lowering variants of the suspects:

  frames   — u8 interleaved bytes -> (2, N, F) f32 (the big u8 transpose)
  branches — polyphase taps (8 shifted FMAs)
  mix      — DFT matmul, HIGHEST precision (the production path)
  mix_fma  — DFT as N explicit f32 FMA passes (VPU, bit-exact in f32)
  requant  — round/clip/pack to staged u16

Usage: python tools/channelizer_probe.py [n_channels=12] [window_blocks=1024]
Writes CHANNELIZER_PROBE.json.
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
        _mix_matrix,
        channelize,
        iq_bytes_to_frames,
        mix_channels,
        polyphase_branches,
        requantize_u16,
    )
    from rtlamr_tpu.parallel.wideband import WidebandDecoder
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WidebandDecoder(parsers, n_channels=n_channels,
                          window_blocks=window_blocks, backend="pallas")
    spec, chspec = dec.spec, dec.chspec
    w = spec.window
    wb = build_wideband_capture(dec.cfg, n_channels, 1, w)
    wb_dev = jax.device_put(jnp.asarray(wb))
    hist = dec._wb_hist
    _tiny_fetch(wb_dev)

    out = {"n_channels": n_channels, "frames": w}

    def rep(name, ms):
        out[name] = round(ms, 3)
        print(f"{name:>12}: {ms:8.3f} ms", file=sys.stderr)

    f_frames = jax.jit(functools.partial(iq_bytes_to_frames, chspec))
    rep("frames", _ms_slope(lambda: f_frames(wb_dev)))
    frames = f_frames(wb_dev)
    _tiny_fetch(frames)

    f_branch = jax.jit(functools.partial(polyphase_branches, chspec))
    rep("branches", _ms_slope(lambda: f_branch(hist, frames)))
    y = f_branch(hist, frames)
    _tiny_fetch(y)

    f_mix = jax.jit(functools.partial(mix_channels, chspec))
    rep("mix_highest", _ms_slope(lambda: f_mix(y)))

    er_np, ei_np = _mix_matrix(chspec)

    @jax.jit
    def mix_fma(yy):
        yr, yi = yy[0], yy[1]
        er = jnp.asarray(er_np)
        ei = jnp.asarray(ei_np)
        cr = jnp.zeros_like(yr)
        ci = jnp.zeros_like(yi)
        for b in range(n_channels):
            cr = cr + er[:, b : b + 1] * yr[b] - ei[:, b : b + 1] * yi[b]
            ci = ci + er[:, b : b + 1] * yi[b] + ei[:, b : b + 1] * yr[b]
        return jnp.stack([cr, ci], axis=0)

    rep("mix_fma", _ms_slope(lambda: mix_fma(y)))
    # Exactness: FMA order differs from the matmul's — check bit-parity on
    # the REQUANTIZED u8 grid (what the decoder actually consumes).
    a = requantize_u16(f_mix(y))
    b = requantize_u16(mix_fma(y))
    eq = bool(np.asarray(jnp.all(a == b)))
    out["mix_fma_requant_bit_parity"] = eq
    print("  fma vs matmul requantized parity:", eq, file=sys.stderr)

    ch = f_mix(y)
    _tiny_fetch(ch)
    f_req = jax.jit(requantize_u16)
    rep("requant", _ms_slope(lambda: f_req(ch)))

    f_all = jax.jit(
        lambda h, x: requantize_u16(channelize(chspec, h, iq_bytes_to_frames(chspec, x)))
    )
    rep("full_chain", _ms_slope(lambda: f_all(hist, wb_dev)))

    with open(os.path.join(_REPO, "CHANNELIZER_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
