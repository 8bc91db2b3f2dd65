from . import geo, tiles, text  # noqa: F401
