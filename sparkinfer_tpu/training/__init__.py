from .finetune import FinetuneConfig, finetune, make_loss_fn, make_train_step

__all__ = ["FinetuneConfig", "finetune", "make_loss_fn", "make_train_step"]
