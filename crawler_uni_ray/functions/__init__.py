from . import dedup, graph, multimodal, similarity, text  # noqa: F401
