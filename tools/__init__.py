"""Operational tooling (profiling, conformance, multi-host workers).

A package so tests can import shared fixtures (e.g.
tools.multihost_worker.build_capture); every module remains directly
runnable as ``python tools/<name>.py``.
"""
