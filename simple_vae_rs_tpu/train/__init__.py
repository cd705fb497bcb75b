from simple_vae_rs_tpu.train.callbacks import Callback, EarlyStopping, ModelCheckpoint
from simple_vae_rs_tpu.train.engine import Trainer
from simple_vae_rs_tpu.train.schedule import ReduceLROnPlateau
from simple_vae_rs_tpu.train.state import TrainState, create_train_state

__all__ = [
    "Callback",
    "EarlyStopping",
    "ModelCheckpoint",
    "Trainer",
    "ReduceLROnPlateau",
    "TrainState",
    "create_train_state",
]
