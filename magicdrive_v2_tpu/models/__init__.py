from . import layers, magicdrive, text_encoder, vae  # noqa: F401
