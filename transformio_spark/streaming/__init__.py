from .stream import streaming_tile_counts  # noqa: F401
