from . import strings, text, vectors  # noqa: F401
