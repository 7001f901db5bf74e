"""Shared utilities: configuration presets and serialization."""

from phones_las_tpu.utils.config import (  # noqa: F401
    Preset,
    PRESETS,
    get_preset,
)
