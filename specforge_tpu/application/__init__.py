from specforge_tpu.application.composition import build_training_run, resolve_run

__all__ = ["build_training_run", "resolve_run"]
