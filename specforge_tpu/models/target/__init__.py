from specforge_tpu.models.target.head import TargetHead

__all__ = ["TargetHead"]
