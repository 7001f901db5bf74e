"""Diagnostics subsystem + CLI surface smoke tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from phones_las_tpu.utils.diagnostics import (
    annotate,
    assert_all_finite,
    enable_nan_checks,
    profile_trace,
)


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3), "b": (jnp.zeros(2),)})
    with pytest.raises(FloatingPointError, match="bad"):
        assert_all_finite({"x": jnp.asarray([1.0, np.nan])}, name="bad")


def test_nan_checks_toggle():
    import jax

    enable_nan_checks(True)
    assert jax.config.jax_debug_nans
    enable_nan_checks(False)
    assert not jax.config.jax_debug_nans


def test_annotate_scope():
    with annotate("test-scope"):
        _ = jnp.sum(jnp.ones(4))


def test_profile_trace_writes(tmp_path):
    d = str(tmp_path / "prof")
    with profile_trace(d):
        np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    import glob

    assert glob.glob(d + "/**/*", recursive=True)


@pytest.mark.parametrize("mod", ["prepare", "train", "infer"])
def test_cli_help(mod, capsys):
    import importlib

    cli = importlib.import_module(f"phones_las_tpu.cli.{mod}")
    with pytest.raises(SystemExit) as e:
        cli.main(["--help"])
    assert e.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()
