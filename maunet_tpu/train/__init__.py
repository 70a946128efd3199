from maunet_tpu.train.metrics import RunningLoss  # noqa: F401
from maunet_tpu.train.optimizers import make_optimizer  # noqa: F401
from maunet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from maunet_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
