"""Mesh-sharded pipelines: ('data', 'tile') meshes, shard_map codec steps
with the DC-carry collective, and multi-host helpers."""
from .mesh import make_mesh  # noqa: F401
from .api import encode_sharded  # noqa: F401
