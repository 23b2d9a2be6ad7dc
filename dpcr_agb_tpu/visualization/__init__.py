from .gpkg import list_layers, read_gpkg, write_gpkg

__all__ = ["list_layers", "read_gpkg", "write_gpkg"]
