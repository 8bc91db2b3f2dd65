"""Pure-numpy math kernels (no Spark imports).

These are the whole-batch column kernels that the Spark layer wraps
in pandas/Arrow UDFs. They are deliberately importable standalone so
they can be unit-tested directly against the reference library.
"""

from .transforms import (  # noqa: F401
    Affine,
    Chain,
    InsufficientTransformPoints,
    MapProjection,
    Polynomial,
    Projective,
    Similarity,
    TIN,
    from_json,
)
from . import accuracy, draw, vector  # noqa: F401
