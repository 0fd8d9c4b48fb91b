"""Isolate search_slice stage costs by monkeypatched variants:
  full        — current code
  no_eq       — pre-collapse with eq := adj (no edge index, no queries)
  no_precol   — no pre-collapse at all: slice at gather capacity (old r4)
  no_validate — device_validate off
  no_gather   — slicing gathers replaced by zeros (keeps compaction+index)
"""

import functools
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def _tiny_fetch(res):
    import jax

    leaf = jax.tree_util.tree_leaves(res)[0]
    np.asarray(leaf.reshape(-1)[:8])


def _ms_slope(fn, n_small=4, n_big=16, trials=5):
    r = fn()
    _tiny_fetch(r)

    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        _tiny_fetch(r)
        return (time.perf_counter() - t0) * 1e3

    vals = []
    for _ in range(trials):
        a = run(n_small)
        b = run(n_big)
        vals.append((b - a) / (n_big - n_small))
    return float(np.median(vals))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops import frontend as F
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256,
                        backend="pallas")
    spec = dec.spec
    geo = F.staged_geometry(spec)
    w = spec.window
    iq = build_capture(dec.cfg, 1, w, spec.halo)
    full = np.zeros(geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    win0 = jax.device_put(jnp.asarray(full))
    false_ = jnp.asarray(False)

    fe = jax.jit(functools.partial(F.frontend_stage_staged, spec))
    bits, q6, mask2d = fe(win0, false_)
    _tiny_fetch(bits)

    def timed(name, spec_v, patch=None):
        orig_streams = F._edge_span_streams
        orig_packed = F._packed_rows_from
        orig_rows = F._strided_rows_from
        if patch == "no_eq":
            def fake_streams(stream, stride, spans):
                n = stream.shape[0]
                return {s: jnp.ones(n, jnp.bool_) for s in spans}
            F._edge_span_streams = fake_streams
        if patch == "no_gather":
            F._packed_rows_from = lambda p8, starts, stride, nb: jnp.zeros(
                (starts.shape[0], nb), jnp.uint8
            )
            F._strided_rows_from = lambda mat, starts, stride, ln: jnp.zeros(
                (starts.shape[0], ln), mat.dtype
            )
        try:
            ss = jax.jit(
                lambda b, q, m: F.pack_results(F.search_slice(spec_v, b, q, m))
            )
            ms = _ms_slope(lambda: ss(bits, q6, mask2d))
        finally:
            F._edge_span_streams = orig_streams
            F._packed_rows_from = orig_packed
            F._strided_rows_from = orig_rows
        print(f"{name:>14}: {ms:7.3f} ms", file=sys.stderr)

    timed("full", spec)
    timed("no_eq", spec, patch="no_eq")
    timed("no_precol", dataclasses.replace(spec, slice_hits=spec.gather_hits))
    timed("no_validate", dataclasses.replace(spec, device_validate=False))
    timed("no_gather", spec, patch="no_gather")
    timed("slice256", dataclasses.replace(spec, slice_hits=256))


if __name__ == "__main__":
    main()
