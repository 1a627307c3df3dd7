from .loop import train
from .state import TrainState

__all__ = ["train", "TrainState"]
