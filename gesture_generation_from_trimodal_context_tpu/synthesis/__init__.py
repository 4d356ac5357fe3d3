from .engine import generate_gestures  # noqa: F401
