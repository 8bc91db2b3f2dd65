from .stream import streaming_exact_dedup, streaming_tile_counts  # noqa: F401
