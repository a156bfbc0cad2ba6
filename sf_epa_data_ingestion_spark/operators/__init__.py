from . import dedup, multimodal, mutate, relational, similarity  # noqa: F401
