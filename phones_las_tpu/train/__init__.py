"""Training layer: jit train/eval steps, optimizer, checkpointing,
metrics.

Replaces the reference's ``tf.estimator`` layer (SURVEY.md §2 L4,
§4.1–§4.2): mode divergence lives here (the model is mode-agnostic);
Adam + global-norm clipping; scheduled sampling; edit-distance eval;
attention-alignment summaries; Orbax checkpoint/resume in place of
``tf.train.Saver`` + automatic latest-checkpoint restore.
"""

from phones_las_tpu.train.state import TrainState, TrainConfig, create_train_state  # noqa: F401
from phones_las_tpu.train.loop import Trainer  # noqa: F401
from phones_las_tpu.train.metrics import edit_distance_stats, per_from_stats  # noqa: F401
