"""Layout-variant probe for the channelizer rewrite (follow-up to
CHANNELIZER_PROBE.json). Times alternative lowerings of the deinterleave
(frames) and the polyphase (branches) stages; all candidates are
bit-exact reformulations.

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
    iq_dev = jax.device_put(jnp.asarray(iq))
    _tiny_fetch(iq_dev)

    out = {"n_channels": N, "frames": F}

    def rep(name, ms):
        out[name] = round(ms, 3)
        print(f"{name:>24}: {ms:8.3f} ms", file=sys.stderr)

    # (a) current production formulation.
    @jax.jit
    def frames_current(b):
        z = b.reshape(-1, 2 * N).T.astype(jnp.float32) - 127.5
        return jnp.stack([z[0::2], z[1::2]], axis=0)

    rep("frames_current", _ms_slope(lambda: frames_current(iq_dev)))
    ref = np.asarray(frames_current(iq_dev))

    # (b) u16 bitcast per-sample, transpose at u16 width, split i/q after.
    @jax.jit
    def frames_u16(b):
        s = jax.lax.bitcast_convert_type(b.reshape(-1, 2), jnp.uint16)
        m = s.reshape(-1, N).T.astype(jnp.int32)  # (N, F)
        i = (m & 255).astype(jnp.float32) - 127.5
        q = (m >> 8).astype(jnp.float32) - 127.5
        return jnp.stack([i, q], axis=0)

    rep("frames_u16T", _ms_slope(lambda: frames_u16(iq_dev)))
    assert np.array_equal(np.asarray(frames_u16(iq_dev)), ref)

    # (c) 3D permute keeping a 128 minor on the output.
    @jax.jit
    def frames_3d(b):
        s = jax.lax.bitcast_convert_type(b.reshape(-1, 2), jnp.uint16)
        m = s.reshape(-1, 128, N).transpose(2, 0, 1).reshape(N, -1)
        m = m.astype(jnp.int32)
        i = (m & 255).astype(jnp.float32) - 127.5
        q = (m >> 8).astype(jnp.float32) - 127.5
        return jnp.stack([i, q], axis=0)

    # NOTE: (c) computes plane j of a DIFFERENT frame order (stride over
    # 128-blocks) — layout probe only, not a drop-in.
    rep("frames_3d_probe", _ms_slope(lambda: frames_3d(iq_dev)))

    # (d) strided slices from the flat u16 stream.
    @jax.jit
    def frames_strided(b):
        s = jax.lax.bitcast_convert_type(b.reshape(-1, 2), jnp.uint16)
        planes = jnp.stack([s[j::N] for j in range(N)])  # (N, F)
        m = planes.astype(jnp.int32)
        i = (m & 255).astype(jnp.float32) - 127.5
        q = (m >> 8).astype(jnp.float32) - 127.5
        return jnp.stack([i, q], axis=0)

    rep("frames_strided", _ms_slope(lambda: frames_strided(iq_dev)))
    assert np.array_equal(np.asarray(frames_strided(iq_dev)), ref)

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

    # Permutation-folded: y[b] uses plane j_b = (N-b)%N delayed one frame
    # for b>=1. Work per-plane with taps applied at per-branch offsets,
    # then reorder rows once at the end (tiny (2,N,*) take).
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
