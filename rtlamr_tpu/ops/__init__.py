from .frontend import FrontendSpec, GroupSpec, decode_window, make_frontend_spec, run_window

__all__ = [
    "FrontendSpec",
    "GroupSpec",
    "decode_window",
    "make_frontend_spec",
    "run_window",
]
