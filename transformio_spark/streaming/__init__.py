from .stream import (  # noqa: F401
    streaming_exact_dedup,
    streaming_sessionize,
    streaming_tile_counts,
)
