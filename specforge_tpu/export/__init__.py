from specforge_tpu.export.exporter import (
    export_checkpoint,
    export_to_hf,
    export_to_sglang,
    flax_to_serving_state,
)

__all__ = [
    "export_checkpoint",
    "export_to_hf",
    "export_to_sglang",
    "flax_to_serving_state",
]
