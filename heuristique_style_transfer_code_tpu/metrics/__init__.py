from .classification import (
    classification_metrics,
    confusion_matrix_np,
    weighted_auc_ovr,
    Timer,
)
