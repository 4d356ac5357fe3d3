from .loader import get_lib, native_available  # noqa: F401
