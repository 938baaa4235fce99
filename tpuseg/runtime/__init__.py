from tpuseg.runtime.state import TrainState, PlateauState, create_train_state
from tpuseg.runtime.train import make_train_step, make_eval_step, total_cost

__all__ = [
    "TrainState",
    "PlateauState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "total_cost",
]
