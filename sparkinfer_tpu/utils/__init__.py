from .log import get_logger, log_set_level

__all__ = ["get_logger", "log_set_level"]
