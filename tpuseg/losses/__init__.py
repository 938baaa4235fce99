from tpuseg.losses.dice import (
    dice_coefficient,
    dice_loss,
    instance_dice_loss,
)
from tpuseg.losses.focal import focal_loss, bce_loss, softmax_cross_entropy
from tpuseg.losses.lovasz import (
    lovasz_grad,
    lovasz_hinge,
    lovasz_softmax,
    stable_bce_loss,
    binary_xloss,
    iou_binary,
)
from tpuseg.losses.discriminative import discriminative_loss
from tpuseg.losses.mmd import (
    mmd_penalty,
    mmd_penalty_with_p,
    decoder_mmd_loss,
    gl_loss,
)

__all__ = [
    "dice_coefficient",
    "dice_loss",
    "instance_dice_loss",
    "focal_loss",
    "bce_loss",
    "softmax_cross_entropy",
    "lovasz_grad",
    "lovasz_hinge",
    "lovasz_softmax",
    "stable_bce_loss",
    "binary_xloss",
    "iou_binary",
    "discriminative_loss",
    "mmd_penalty",
    "mmd_penalty_with_p",
    "decoder_mmd_loss",
    "gl_loss",
]
