from . import columns  # noqa: F401
