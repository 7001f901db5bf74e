"""TPU-native compute ops: fused LSTM recurrence, pyramid time reduction,
attention scoring, mask helpers.

These replace the reference's reliance on the TF1 C++ runtime's
``dynamic_rnn`` while-loops and tf.contrib.seq2seq attention mechanisms
(SURVEY.md §3 "Native components"): the x-projection is one large MXU
matmul, the recurrence is a Pallas kernel with weights/state VMEM-resident
(or an equivalent ``lax.scan`` for the differentiable path), and the
pyramid is a free reshape.
"""

from phones_las_tpu.ops.lstm import (  # noqa: F401
    LSTMParams,
    init_lstm_params,
    lstm_layer,
    bilstm_layer,
)
from phones_las_tpu.ops.pyramid import pyramid_reduce  # noqa: F401
from phones_las_tpu.ops.masking import length_mask  # noqa: F401
