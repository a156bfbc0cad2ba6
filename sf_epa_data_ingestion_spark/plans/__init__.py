from . import epa_views, normalize, pipeline  # noqa: F401
