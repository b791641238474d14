from specforge_tpu.config.schema import Config, apply_overrides, load_config

__all__ = ["Config", "apply_overrides", "load_config"]
