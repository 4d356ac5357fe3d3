"""Logging, timing, and seeding utilities
(reference scripts/utils/train_utils.py:35-56,186-191)."""

import logging
import math
import os
import random
import time
from logging.handlers import RotatingFileHandler

import numpy as np


def set_logger(log_path=None, log_filename="log"):
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)
    handlers = [logging.StreamHandler()]
    if log_path is not None:
        os.makedirs(log_path, exist_ok=True)
        handlers.append(RotatingFileHandler(
            os.path.join(log_path, log_filename),
            maxBytes=10 * 1024 * 1024, backupCount=5))
    logging.basicConfig(level=logging.DEBUG,
                        format="%(asctime)s: %(message)s", handlers=handlers)
    logging.getLogger("matplotlib").setLevel(logging.WARNING)
    logging.getLogger("jax").setLevel(logging.WARNING)


def as_minutes(s):
    m = math.floor(s / 60)
    s -= m * 60
    return "%dm %ds" % (m, s)


def time_since(since):
    return "%s" % as_minutes(time.time() - since)


def set_random_seed(seed):
    """Seed every host-side RNG; JAX PRNG keys are derived from the same
    seed by the train loop."""
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
