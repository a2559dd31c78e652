from .config import (
    DataConfig,
    FlowConfig,
    ModelConfig,
    OptimConfig,
    RuntimeConfig,
    PretrainConfig,
    LinearConfig,
)
from .recipes import RECIPES, get_recipe

__all__ = [
    "DataConfig", "FlowConfig", "ModelConfig", "OptimConfig",
    "RuntimeConfig", "PretrainConfig", "LinearConfig",
    "RECIPES", "get_recipe",
]
