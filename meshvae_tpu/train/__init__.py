from .loop import Trainer, lr_for_epoch
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = ["Trainer", "lr_for_epoch", "save_checkpoint", "load_checkpoint"]
