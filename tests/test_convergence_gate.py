"""Convergence regression gate (VERDICT r1 next-step #7): the toy-scale
training demo must clear its calibrated validation-Dice floor on CPU.
Matches the reference README's quality claim at demo scale (SURVEY.md §6);
the full-scale floor (0.93+ on the chip) lives in tools/train_demo.py."""

from tools.train_demo import run
import pytest

# Fast-tier exclusion (VERDICT r3 next #3): a real ~3.5 min CPU training run.
pytestmark = pytest.mark.slow


def test_toy_convergence_clears_dice_floor():
    result = run("ci")
    assert result["passed"], (
        f"val Dice {result['final_val_dice']} below floor "
        f"{result['dice_floor']} — training quality regressed ({result})"
    )
