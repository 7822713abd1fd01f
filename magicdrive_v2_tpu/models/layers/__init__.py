from . import blocks  # noqa: F401
