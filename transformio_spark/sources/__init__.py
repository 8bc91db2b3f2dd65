from . import synthspec  # noqa: F401
