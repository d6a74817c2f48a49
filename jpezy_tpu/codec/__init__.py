"""Codec pipelines: jax_codec (device fast/exact paths), host_codec (the
C++ no-accelerator path) and oracle (the float64 numpy reference pinning
the upstream codec's exact numerics).

Lazy: importing this package must not import jax -- the host-codec CLI
path (codec/host_codec.py) is chosen precisely to avoid jax's ~2 s import
on one-shot small-image runs.
"""
import importlib


def __getattr__(name):
    if name in ("decode", "decode_batch", "encode", "encode_batch"):
        return getattr(importlib.import_module(".jax_codec", __name__), name)
    if name in ("jax_codec", "host_codec", "oracle"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
