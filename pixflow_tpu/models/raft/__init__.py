from .raft import RAFT, raft_batch_flows
from .convert import torch_state_dict_to_flax, load_raft

__all__ = ["RAFT", "raft_batch_flows", "torch_state_dict_to_flax", "load_raft"]
