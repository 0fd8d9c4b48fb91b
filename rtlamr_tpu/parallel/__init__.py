from .mesh import MeshDecoder, dryrun

__all__ = ["MeshDecoder", "dryrun"]
