from . import numeric, text, vectors  # noqa: F401
