from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model, TTTOutputs

__all__ = ["OnlineEagle3Model", "TTTOutputs"]
