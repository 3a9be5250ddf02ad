from .logger import setup_logger
from .misc import load_from_yaml_file, mkdir, set_seed, weighted_sample

__all__ = ["setup_logger", "load_from_yaml_file", "mkdir", "set_seed",
           "weighted_sample"]
