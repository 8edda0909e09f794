from . import loop  # noqa: F401
from .loop import evaluate, fit, train_base_model, train_lora_adapter  # noqa: F401
from .metrics import confusion_matrix_metrics  # noqa: F401
from .optim import adamw_steplr, lora_adam  # noqa: F401
from .steps import TrainState, make_eval_step, make_train_step  # noqa: F401
