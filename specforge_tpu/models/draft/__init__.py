from specforge_tpu.models.draft.base import DraftModelConfig
from specforge_tpu.models.draft.llama_eagle3 import Eagle3Config, LlamaEagle3Draft

__all__ = ["DraftModelConfig", "Eagle3Config", "LlamaEagle3Draft"]
