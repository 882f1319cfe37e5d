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
    try:
        resolve_tap44("bogus")
    except KeyError:
        pass
    else:
        raise AssertionError("unknown tap44 level must not resolve silently")


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
