from . import dates, hashing, text, vectors  # noqa: F401
