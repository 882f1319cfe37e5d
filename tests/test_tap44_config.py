"""The tap44 kernel-level mapping has ONE source of truth (unet.TAP44_LEVELS).

Round-3 history: three hand-copied {"off": False, ...} dicts drifted once
already (learning_check lagged bench.py when 'stem'/'l1' landed — commit
026393c). These tests pin every surface to the canonical mapping.
"""

import re

from diffusionremotesensing_tpu.models.unet import (
    TAP44_LEVELS,
    default_tap44,
    resolve_tap44,
)

REPO_ROOT = __file__.rsplit("/tests/", 1)[0]


def test_resolve_tap44_levels():
    assert resolve_tap44("off") is False
    assert resolve_tap44("full") is True
    assert resolve_tap44("conv2") == "conv2"
    assert resolve_tap44("block") == "block"
    assert resolve_tap44("stem") == "stem"
    assert resolve_tap44("l1") == "l1"


def test_resolve_tap44_auto_defers_to_default():
    # None (unset env var) and "auto" (CLI default) both defer
    assert resolve_tap44(None) == default_tap44()
    assert resolve_tap44("auto") == default_tap44()


def test_resolve_tap44_rejects_unknown():
    # the env surface (DRS_TAP44) has no argparse choices — a typo must fail
    # with the valid spellings, not a bare KeyError
    try:
        resolve_tap44("bogus")
    except ValueError as e:
        assert "bogus" in str(e) and "block" in str(e) and "auto" in str(e)
    else:
        raise AssertionError("unknown tap44 level must not resolve silently")


def test_kernel_flag_device_awareness(monkeypatch):
    """pallas_device_ok / fused_update_device_ok (cli.py's guards for the
    boolean kernel flags): the broken combination is a non-TPU committed
    device under a TPU default backend — interpret mode keys off the
    backend, so Mosaic would compile for the CPU device."""
    import jax

    from diffusionremotesensing_tpu.models import unet

    class Dev:
        def __init__(self, platform):
            self.platform = platform

    # CPU-default host (the test environment): interpret mode covers CPU
    assert unet.pallas_device_ok(Dev("cpu"))
    assert unet.pallas_device_ok(None)
    # but the fused ancestral update has no interpret path at all
    assert not unet.fused_update_device_ok(Dev("cpu"))
    assert unet.fused_update_device_ok(Dev("tpu"))

    # TPU-default host (the sitecustomize-pinned tunnel)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert unet.pallas_device_ok(Dev("tpu"))
    assert unet.pallas_device_ok(None)
    assert not unet.pallas_device_ok(Dev("cpu"))   # --device cpu on TPU host
    assert not unet.fused_update_device_ok(Dev("cpu"))


def test_resolve_tap44_explicit_level_demoted_off_tpu(monkeypatch, capsys):
    """An EXPLICIT --tap44 level must obey the same device gating as 'auto':
    on a TPU-default host with a CPU-committed computation (--device cpu),
    Mosaic can't compile and interpret mode won't engage, so the level is
    demoted to the dense-s2d path with a note instead of crashing."""
    import jax

    from diffusionremotesensing_tpu.models import unet

    class Dev:
        def __init__(self, platform):
            self.platform = platform

    # CPU-default host (this test env): interpret mode covers a CPU device
    assert resolve_tap44("block", Dev("cpu")) == "block"

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_tap44("block", Dev("tpu")) == "block"
    assert resolve_tap44("block", Dev("cpu")) is False   # demoted, not crash
    assert "dense-s2d" in capsys.readouterr().out
    assert resolve_tap44("off", Dev("cpu")) is False     # off stays off, no note


def test_aggregation_cli_choices_match_canonical_mapping():
    """--tap44's argparse choices (Aggregation_Sampling.py, inside __main__
    so not importable) must be exactly ["auto", *TAP44_LEVELS]; a new level
    added to the mapping must surface on the CLI too."""
    with open(f"{REPO_ROOT}/Aggregation_Sampling.py") as f:
        src = f.read()
    m = re.search(r'"--tap44",[^)]*choices=\[([^\]]*)\]', src)
    assert m, "Aggregation_Sampling.py lost its --tap44 choices list"
    choices = [c.strip().strip("\"'") for c in m.group(1).split(",")]
    assert choices == ["auto", *TAP44_LEVELS], (choices, list(TAP44_LEVELS))


def test_resolve_tap44_empty_string_defers_to_default():
    # DRS_TAP44= (set but empty) must behave like unset, not KeyError
    assert resolve_tap44("") == default_tap44()
