from tpuseg.evalm.metrics import (
    calc_dic,
    calc_dice,
    calc_bd,
    calc_sbd,
    dice_matrix,
    symmetric_best_dice_batch,
    fg_dice_batch,
)

__all__ = [
    "calc_dic",
    "calc_dice",
    "calc_bd",
    "calc_sbd",
    "dice_matrix",
    "symmetric_best_dice_batch",
    "fg_dice_batch",
]
