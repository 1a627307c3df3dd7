from .logging import CSVLogger, get_experiment_name, get_experiment_tags, make_logger

__all__ = ["CSVLogger", "get_experiment_name", "get_experiment_tags", "make_logger"]
