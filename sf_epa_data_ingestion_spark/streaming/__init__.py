from . import events, freshness  # noqa: F401
