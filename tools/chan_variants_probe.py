"""Layout-variant probe for the channelizer rewrite (follow-up to
CHANNELIZER_PROBE.json). Times bit-exact reformulations of the
deinterleave (frames) and polyphase (branches) stages.

Key simplification: the device-side u8->u16 pairing is free on HOST
(np.view(np.uint16), zero copy), so the variants take a flat u16 stream
(one element per complex sample, i|q<<8) as input — the same convention
the narrowband staged path already uses.

Usage: python tools/chan_variants_probe.py
Writes CHAN_VARIANTS.json.
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

N = 12
F = 8 * 1024 * 1024  # frames (~= the bench window at wb=1024)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    rng = np.random.default_rng(0)
    iq = rng.integers(0, 256, 2 * N * F, dtype=np.uint8)
    s16 = iq.view(np.uint16)  # host-side zero-copy pairing
    iq_dev = jax.device_put(jnp.asarray(iq))
    s16_dev = jax.device_put(jnp.asarray(s16))
    _tiny_fetch(iq_dev)
    _tiny_fetch(s16_dev)

    out = {"n_channels": N, "frames": F}

    def rep(name, ms):
        out[name] = round(ms, 3)
        print(f"{name:>24}: {ms:8.3f} ms", file=sys.stderr)

    # (a) current production formulation (u8 input).
    @jax.jit
    def frames_current(b):
        z = b.reshape(-1, 2 * N).T.astype(jnp.float32) - 127.5
        return jnp.stack([z[0::2], z[1::2]], axis=0)

    rep("frames_current", _ms_slope(lambda: frames_current(iq_dev)))
    ref = np.asarray(frames_current(iq_dev))

    def split(m):
        m = m.astype(jnp.int32)
        i = (m & 255).astype(jnp.float32) - 127.5
        q = (m >> 8).astype(jnp.float32) - 127.5
        return jnp.stack([i, q], axis=0)

    # (b) u16 transpose then i/q split.
    @jax.jit
    def frames_u16(s):
        return split(s.reshape(-1, N).T)

    rep("frames_u16T", _ms_slope(lambda: frames_u16(s16_dev)))
    assert np.array_equal(np.asarray(frames_u16(s16_dev)), ref)

    # (d) strided slices from the flat u16 stream.
    @jax.jit
    def frames_strided(s):
        return split(jnp.stack([s[j::N] for j in range(N)]))

    rep("frames_strided", _ms_slope(lambda: frames_strided(s16_dev)))
    assert np.array_equal(np.asarray(frames_strided(s16_dev)), ref)

    # (e) f32 widen FIRST (flat, clean layout), then strided slices.
    @jax.jit
    def frames_f32_strided(s):
        m = s.astype(jnp.int32)
        i = (m & 255).astype(jnp.float32) - 127.5
        q = (m >> 8).astype(jnp.float32) - 127.5
        return jnp.stack(
            [
                jnp.stack([i[j::N] for j in range(N)]),
                jnp.stack([q[j::N] for j in range(N)]),
            ],
            axis=0,
        )

    rep("frames_f32_strided", _ms_slope(lambda: frames_f32_strided(s16_dev)))
    assert np.array_equal(np.asarray(frames_f32_strided(s16_dev)), ref)

    # --- branches: current vs permutation-folded static-slice formulation.
    from rtlamr_tpu.ops.channelizer import (
        ChannelizerSpec,
        _polyphase_taps,
        polyphase_branches,
    )

    spec = ChannelizerSpec(n_channels=N)
    frames = frames_current(iq_dev)
    _tiny_fetch(frames)
    hist = jnp.zeros((2, N, spec.history_frames), jnp.float32)

    f_br = jax.jit(functools.partial(polyphase_branches, spec))
    rep("branches_current", _ms_slope(lambda: f_br(hist, frames)))
    ref_y = np.asarray(f_br(hist, frames))

    h2 = _polyphase_taps(spec)
    p_taps = spec.taps_per_branch

    @jax.jit
    def branches_folded(h, fr):
        full = jnp.concatenate([h, fr], axis=2)  # (2, N, P+F)
        f_len = fr.shape[2]
        hp = full.shape[2] - f_len  # = P
        # For branch b: plane j=(N-b)%N, delay d=(1 if b>=1 else 0);
        # y[b, m] = sum_p h2[p, b] * full[:, j, hp - p - d + m]
        ys = []
        for b in range(N):
            j = (N - b) % N
            d = 1 if b >= 1 else 0
            acc = jnp.zeros((2, f_len), jnp.float32)
            for p in range(p_taps):
                lo = hp - p - d
                acc = acc + h2[p, b] * jax.lax.slice(
                    full[:, j], (0, lo), (2, lo + f_len)
                )
            ys.append(acc)
        return jnp.stack(ys, axis=1)  # (2, N, F)

    rep("branches_folded", _ms_slope(lambda: branches_folded(hist, frames)))
    got = np.asarray(branches_folded(hist, frames))
    assert np.array_equal(got, ref_y), "branches_folded not bit-identical"
    print("  branches_folded bit-identical: True", file=sys.stderr)

    with open(os.path.join(_REPO, "CHAN_VARIANTS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
