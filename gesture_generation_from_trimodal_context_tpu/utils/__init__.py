from .average_meter import AverageMeter  # noqa: F401
from .logging_utils import set_logger, set_random_seed, time_since  # noqa: F401
