"""phones_las_tpu — a TPU-native Listen, Attend and Spell framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
``sciforce/phones-las`` (reference: TF1 Estimator LAS for phone recognition
with IPA targets, binary phonological-feature outputs, and multitask
phone + grapheme decoding; see SURVEY.md for the full reference analysis —
the reference mount was empty, so citations are to the public repo layout
reconstructed there, e.g. ``las/model.py``, ``las/model_helper.py``,
``utils/dataset_utils.py``).

Design principles (TPU-first, not a port):
  * the audio front-end (framing, STFT, log-mel/MFCC, deltas) runs
    device-resident, fused into Pallas kernels / MXU matmuls;
  * the pyramidal BiLSTM encoder is ``lax.scan`` over fused LSTM-cell
    kernels with reshape-concat time reductions;
  * the attention decoder, multitask heads, and greedy/beam search are
    jit-compiled loops with fully static shapes;
  * batched offline inference shards across a TPU mesh over ICI via
    ``jax.sharding`` — no NCCL/MPI translation.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keep bare import light / jax-free)
    if name == "Transcriber":
        from phones_las_tpu.api import Transcriber

        return Transcriber
    if name == "Trainer":
        from phones_las_tpu.train import Trainer

        return Trainer
    if name == "PRESETS":
        from phones_las_tpu.utils.config import PRESETS

        return PRESETS
    raise AttributeError(name)
