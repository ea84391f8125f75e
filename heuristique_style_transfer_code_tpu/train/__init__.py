from .optim import sgd_momentum, adam, label_tree, BN_STAT_KEYS
from .train_loop import make_train_step, make_eval_step, train_epochs, evaluate
from .kfold import run_kfold
