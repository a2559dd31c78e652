from .resnet import ResNet, make_resnet, MODEL_REGISTRY
from .heads import MLP2d, proj_head, pred_head
from .pixpro import PixPro, init_momentum_from_online, ema_update, momentum_schedule

__all__ = [
    "ResNet", "make_resnet", "MODEL_REGISTRY",
    "MLP2d", "proj_head", "pred_head",
    "PixPro", "init_momentum_from_online", "ema_update", "momentum_schedule",
]
