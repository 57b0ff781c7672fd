from .mlp import MLP, ThetaPosteriorNet, ZPredictiveNet, init_vi_networks

__all__ = ["MLP", "ThetaPosteriorNet", "ZPredictiveNet", "init_vi_networks"]
