"""Load the reference library's numpy-only modules standalone.

The reference package ``/root/reference/transformio`` is not
importable as a whole in this sandbox (its __init__ pulls in imwarp
which needs PIL), but ``transforms.py`` and ``accuracy.py`` only need
numpy at module scope — so we assemble a synthetic package around
them for direct behavior-parity testing.
"""

from __future__ import annotations

import importlib.util
import sys
import types

_REF_DIR = "/root/reference/transformio"


def load_reference_modules():
    """Returns (transforms, accuracy, vector) reference modules."""
    if "reftio.transforms" in sys.modules:
        return (
            sys.modules["reftio.transforms"],
            sys.modules["reftio.accuracy"],
            sys.modules["reftio.vector"],
        )
    pkg = types.ModuleType("reftio")
    pkg.__path__ = [_REF_DIR]
    sys.modules["reftio"] = pkg
    for name in ("transforms", "accuracy", "vector"):
        spec = importlib.util.spec_from_file_location(
            f"reftio.{name}", f"{_REF_DIR}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"reftio.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return (
        sys.modules["reftio.transforms"],
        sys.modules["reftio.accuracy"],
        sys.modules["reftio.vector"],
    )
