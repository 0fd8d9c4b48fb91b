"""Scan-batch depth probe: decode_windows_scan at K=2/4/8 (slope-timed)
plus a short engine loop at the best K — does a smaller scan batch reduce
the per-window scan overhead seen in ROOFLINE.json (5.99 single vs 6.35
scan/8)? Usage: python tools/scan_k_probe.py"""
import json, os, sys, time
import numpy as np
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
from tools.roofline_bench import _ms_slope, _tiny_fetch

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import decode_windows_scan, staged_geometry
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256, backend="pallas")
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    iq = build_capture(dec.cfg, 8, w, spec.halo)
    full = np.zeros(7 * w + geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    batch8 = np.stack([full[i * w : i * w + geo.staged_samples] for i in range(8)])
    b8 = jax.device_put(jnp.asarray(batch8)); _tiny_fetch(b8)
    out = {}
    for k in (2, 4, 8):
        bk = b8[:k]
        fk = jnp.zeros(k, bool)
        ms = _ms_slope(lambda: decode_windows_scan(spec, bk, fk))
        out[f"scan_{k}_ms_per_window"] = round(ms / k, 3)
        print(f"scan K={k}: {ms / k:.3f} ms/window", file=sys.stderr)
    # engine loop at K=4
    b4 = b8[:4]
    dec.reset(); dec._first = False
    dec.decode_staged_batch(b4); dec.drain()
    dec.reset(); dec._first = False
    n_iter = 0
    start = time.perf_counter()
    while time.perf_counter() - start < 10.0 or n_iter < 32:
        dec.decode_staged_batch(b4, drain=False); n_iter += 4
    dec.drain()
    rate = n_iter * w / (time.perf_counter() - start)
    out["engine_k4_MSps"] = round(rate / 1e6, 1)
    print(f"engine K=4: {rate/1e6:.1f} MS/s", file=sys.stderr)
    # engine loop at K=8 same session for comparison
    dec.reset(); dec._first = False
    dec.decode_staged_batch(b8); dec.drain()
    dec.reset(); dec._first = False
    n_iter = 0
    start = time.perf_counter()
    while time.perf_counter() - start < 10.0 or n_iter < 32:
        dec.decode_staged_batch(b8, drain=False); n_iter += 8
    dec.drain()
    rate = n_iter * w / (time.perf_counter() - start)
    out["engine_k8_MSps"] = round(rate / 1e6, 1)
    print(f"engine K=8: {rate/1e6:.1f} MS/s", file=sys.stderr)
    json.dump(out, open(os.path.join(_REPO, "SCAN_K_PROBE.json"), "w"), indent=1)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
