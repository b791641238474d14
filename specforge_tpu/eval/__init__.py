from specforge_tpu.eval.evaluator import Evaluator

__all__ = ["Evaluator"]
