from specforge_tpu.ops.loss import log_softmax_loss, log_softmax_loss_reference
from specforge_tpu.ops.lk_loss import (
    compute_acceptance_rate,
    compute_lk_loss,
    expected_acceptance_rate,
)
from specforge_tpu.ops.teacher import (
    compute_target_p,
    compute_target_p_padded,
    compute_target_p_padded_from_hidden,
)

__all__ = [
    "log_softmax_loss",
    "log_softmax_loss_reference",
    "compute_acceptance_rate",
    "compute_lk_loss",
    "expected_acceptance_rate",
    "compute_target_p",
    "compute_target_p_padded",
    "compute_target_p_padded_from_hidden",
]
