from . import dedup, merge, multimodal, similarity, textanalysis  # noqa: F401
