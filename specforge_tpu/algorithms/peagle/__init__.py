from specforge_tpu.algorithms.peagle.model import (
    OnlinePEagleModel,
    cod_capacities,
    generate_cod_sample_indices,
    peagle_allow_mask,
)

__all__ = [
    "OnlinePEagleModel",
    "cod_capacities",
    "generate_cod_sample_indices",
    "peagle_allow_mask",
]
