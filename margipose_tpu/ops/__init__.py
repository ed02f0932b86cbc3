from margipose_tpu.ops.dsnt import (
    average_loss,
    dsnt,
    euclidean_losses,
    flat_softmax,
    js_reg_losses,
    kl_reg_losses,
    make_gauss,
    normalized_linspace,
)

__all__ = [
    "average_loss",
    "dsnt",
    "euclidean_losses",
    "flat_softmax",
    "js_reg_losses",
    "kl_reg_losses",
    "make_gauss",
    "normalized_linspace",
]
