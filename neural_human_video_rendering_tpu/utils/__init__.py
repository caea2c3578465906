from . import checkpoint, visualizer, metrics, image  # noqa: F401
