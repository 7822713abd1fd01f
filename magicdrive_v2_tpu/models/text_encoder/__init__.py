from .t5 import DummyTextEncoder, T5Encoder, clean_caption, text_preprocessing

__all__ = ["DummyTextEncoder", "T5Encoder", "clean_caption", "text_preprocessing"]
