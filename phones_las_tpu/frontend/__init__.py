"""Device-resident audio feature front-end.

The reference extracts features *offline on the host CPU* with
python_speech_features (reference: ``process_timit.py`` /
``process_librispeech.py``; SURVEY.md §4.5). This package inverts that:
raw 16 kHz PCM goes to the device and framing → STFT → mel/MFCC → log →
delta stacking happen on-TPU, as MXU matmuls (pure-JAX path) or a fused
Pallas kernel (``pallas_frontend``). Semantics follow
python_speech_features defaults so feature tensors match the reference
pipeline within fp32 tolerance (BASELINE.json north star).
"""

from phones_las_tpu.frontend.features import (  # noqa: F401
    FrontendConfig,
    num_frames,
    frames_for_samples,
    mel_filterbank,
    dft_matrices,
    extract_features,
    feature_dim,
)
from phones_las_tpu.frontend.cmvn import CmvnStats, apply_cmvn  # noqa: F401
