from . import bpe, dates, hashing, text, vectors  # noqa: F401
