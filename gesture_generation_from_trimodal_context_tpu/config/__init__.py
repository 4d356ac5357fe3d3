from .parse_args import parse_args, str2bool  # noqa: F401
