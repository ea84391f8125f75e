from .optim import sgd_momentum, adam, label_tree, BN_STAT_KEYS
from .train_loop import (
    evaluate,
    make_eval_step,
    make_train_step,
    make_train_step_body,
    make_train_step_multi,
    train_epochs,
)
from .kfold import run_kfold
