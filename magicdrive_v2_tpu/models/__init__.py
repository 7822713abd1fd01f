from . import layers, magicdrive  # noqa: F401
