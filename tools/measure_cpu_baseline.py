"""Measure the torch-CPU reference baseline (BASELINE.md: the denominators).

Config #1 of BASELINE.json: U-Net fwd+bwd at 572×572, BCE+Dice loss, on CPU
with torch 2.13. The reference publishes no throughput numbers, so this
measurement IS the baseline the ≥5×/chip target divides by. Results land in
BASELINE_MEASURED.json (committed) so bench.py does not re-pay this cost.
"""

import json
import sys
import time
from pathlib import Path

import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tests.torch_ref import RefUNet  # the reference-spec model


def measure(h=572, w=572, batch=1, iters=5, bilinear=False):
    torch.manual_seed(0)
    model = RefUNet(3, 1, bilinear=bilinear)
    opt = torch.optim.RMSprop(model.parameters(), lr=1e-5, weight_decay=1e-8, momentum=0.999)
    bce = torch.nn.BCEWithLogitsLoss()
    x = torch.randn(batch, 3, h, w)
    y = (torch.rand(batch, h, w) > 0.5).float()

    def step():
        opt.zero_grad(set_to_none=True)
        logits = model(x).squeeze(1)
        probs = torch.sigmoid(logits)
        inter = 2 * (probs * y).sum((-1, -2))
        sets = probs.sum((-1, -2)) + y.sum((-1, -2))
        dice = ((inter + 1e-6) / (torch.where(sets == 0, inter, sets) + 1e-6)).mean()
        loss = bce(logits, y) + (1 - dice)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return batch * iters / dt


if __name__ == "__main__":
    ips = measure()
    out = {
        "torch_cpu_images_per_sec_572_train": ips,
        "config": "RefUNet(3,1,bilinear=False) 572x572 batch1 fwd+bwd+clip+RMSprop, BCE+Dice, torch 2.13.0+cpu",
        "threads": torch.get_num_threads(),
    }
    Path("BASELINE_MEASURED.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
