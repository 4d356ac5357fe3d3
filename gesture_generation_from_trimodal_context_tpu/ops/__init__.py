from . import skeleton, audio, text  # noqa: F401
