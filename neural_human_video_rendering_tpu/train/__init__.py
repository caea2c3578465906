from .state import TrainState, create_train_state, make_optimizer  # noqa: F401
from . import steps  # noqa: F401
