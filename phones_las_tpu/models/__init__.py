"""Model layer: pyramidal BiLSTM listener, attention speller, LAS
assembly with multitask phone+grapheme heads and binary
phonological-feature (binf) output modes.

Replaces the reference's ``las/model.py`` / ``las/model_helper.py``
(SURVEY.md §2 L3/L4) with functional JAX: parameters are NamedTuple
pytrees, configs are frozen dataclasses, and every forward path is
jit-compilable with static shapes.
"""

from phones_las_tpu.models.listener import (  # noqa: F401
    ListenerConfig,
    ListenerParams,
    init_listener,
    listen,
)
from phones_las_tpu.models.speller import (  # noqa: F401
    SpellerConfig,
    SpellerParams,
    init_speller,
    speller_step,
    init_speller_carry,
    teacher_forced_decode,
)
from phones_las_tpu.models.las import (  # noqa: F401
    LASConfig,
    LASParams,
    init_las,
    encode,
    compute_loss,
)
