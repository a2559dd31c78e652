from .linear import (build_linear_state, make_linear_train_step,
                     make_linear_eval_step, load_pretrained_encoder)
from .convert_d2 import flax_resnet_to_d2

__all__ = [
    "build_linear_state", "make_linear_train_step", "make_linear_eval_step",
    "load_pretrained_encoder", "flax_resnet_to_d2",
]
