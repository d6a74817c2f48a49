"""Codec pipelines: jax_codec (device fast/exact paths) and oracle (the
float64 numpy reference pinning the upstream codec's exact numerics)."""
from .jax_codec import (  # noqa: F401
    decode,
    decode_batch,
    encode,
    encode_batch,
)
