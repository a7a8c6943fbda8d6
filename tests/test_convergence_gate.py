"""Convergence regression gate (VERDICT r1 next-step #7): the toy-scale
training demo must clear its calibrated validation-Dice floor on CPU.
Matches the reference README's quality claim at demo scale (SURVEY.md §6);
the full-scale floor (0.93+ on the chip) lives in tools/train_demo.py."""

import sys

import pytest

from tools import train_demo
from tools.train_demo import resolve_recipe, run


@pytest.mark.slow  # a real ~3.5 min CPU training run
def test_toy_convergence_clears_dice_floor():
    result = run("ci")
    assert result["passed"], (
        f"val Dice {result['final_val_dice']} below floor "
        f"{result['dice_floor']} — training quality regressed ({result})"
    )


def test_sub_floor_run_exits_nonzero(monkeypatch, capsys):
    """VERDICT r4 weak #4: a gate that has never tripped is a hope. A run
    below its floor must make the demo CLI exit non-zero (the gating
    contract at tools/train_demo.py::main)."""
    monkeypatch.setattr(
        train_demo, "run",
        lambda *a, **k: {"passed": False, "final_val_dice": 0.1,
                         "dice_floor": 0.9})
    monkeypatch.setattr(sys, "argv", ["train_demo.py", "--preset", "arch",
                                      "--arch", "unetpp"])
    with pytest.raises(SystemExit) as ei:
        train_demo.main()
    assert ei.value.code == 1
    monkeypatch.setattr(
        train_demo, "run",
        lambda *a, **k: {"passed": True})
    with pytest.raises(SystemExit) as ei:
        train_demo.main()
    assert ei.value.code == 0


def test_arch_floors_gate_only_their_calibrated_recipe():
    """Family floors apply exactly at the arch preset with the calibrated
    optimizer/lr; any override (optimizer, lr, epochs) blanks the gates so
    they never judge an uncalibrated configuration."""
    for fam, (vf, hf) in train_demo.ARCH_FLOORS.items():
        floor, heldout, lr, opt, _ = resolve_recipe("arch", fam)
        assert (floor, heldout) == (vf, hf) and floor > 0, fam
        assert opt == train_demo.ARCH_OPT.get(fam, "rmsprop")
        assert lr == train_demo.ARCH_LR.get(fam, 3e-4)
    # Overrides are report-only.
    assert resolve_recipe("arch", "r2u", optimizer="sgd")[0] == 0.0
    assert resolve_recipe("arch", "r2u", lr_override=1.0)[:2] == (0.0, None)
    assert resolve_recipe("arch", "unet", epochs_override=1)[:2] == (0.0, None)
    # Matching the calibrated recipe explicitly keeps the gates armed.
    fam_lr = train_demo.ARCH_LR.get("r2u", 3e-4)
    fam_opt = train_demo.ARCH_OPT.get("r2u", "rmsprop")
    armed = resolve_recipe("arch", "r2u", optimizer=fam_opt,
                           lr_override=fam_lr)
    assert armed[0] > 0
    # Non-arch presets never gate non-flagship families.
    assert resolve_recipe("full", "r2u")[:2] == (0.0, None)
