from .optim import build_optimizer, OptimizerConfig
from .step import TrainState, make_eval_step, make_scanned_train_steps, make_train_step
from .tracking import ExperimentTracker, find_run_id
from .weights import resolve_checkpoint
