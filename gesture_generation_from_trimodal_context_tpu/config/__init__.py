from . import parse_args as parse_args_mod  # noqa: F401 (the module)
from .parse_args import parse_args, str2bool  # noqa: F401 (the functions)
