"""Data layer: corpus parsers, phone/IPA/binf maps, vocab, record format,
and the length-bucketed batch pipeline.

Replaces the reference's offline prep scripts + TFRecord input_fn
(SURVEY.md §2 L1/L2: ``process_timit.py``, ``process_librispeech.py``,
``process_common_voice.py``, ``utils/dataset_utils.py``,
``utils/vocab_utils.py``, ``misc/`` CSV assets). Two deliberate
inversions vs the reference:

  * feature extraction moved on-device (prep stores raw PCM, not frames);
  * TFRecords replaced by a simple self-describing packed binary format
    (``records.py``) with an optional C++ fast reader (``csrc/``).
"""

from phones_las_tpu.data.ipa import (  # noqa: F401
    BINF_FEATURES,
    phone_to_binf,
    binf_matrix,
    ARPABET_TO_IPA,
    TIMIT_FOLD_39,
    fold_timit,
)
from phones_las_tpu.data.vocab import Vocab  # noqa: F401
from phones_las_tpu.data.records import RecordWriter, RecordReader, Utterance  # noqa: F401
