"""Produce LPIPS golden values + weight files for tests/test_pretrained.py.

Run this on a machine WITH network access and the `lpips` + `torchvision`
packages, then copy the output directory to the target machine and point
GMTPU_WEIGHTS_DIR at it:

    python tools/make_lpips_golden.py --out weights/

Writes:
    alexnet.pth        torchvision alexnet state_dict (LPIPS backbone)
    lpips_alex.pth     lpips lin-head checkpoint
    lpips_golden.json  reference LPIPS values on fixed random pairs
"""
from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import lpips
    import numpy as np
    import torch
    import torchvision

    alex = torchvision.models.alexnet(weights=torchvision.models.AlexNet_Weights.IMAGENET1K_V1)
    torch.save(alex.state_dict(), os.path.join(args.out, "alexnet.pth"))

    metric = lpips.LPIPS(net="alex")
    # lin heads only (the backbone is saved separately above)
    lin_sd = {k: v for k, v in metric.state_dict().items() if k.startswith("lin")}
    torch.save(lin_sd, os.path.join(args.out, "lpips_alex.pth"))

    pairs = []
    for sx, sy in [(0, 1), (2, 3), (4, 5)]:
        x = torch.from_numpy(
            (np.random.RandomState(sx).rand(1, 3, 64, 64).astype(np.float32)) * 2 - 1
        )
        y = torch.from_numpy(
            (np.random.RandomState(sy).rand(1, 3, 64, 64).astype(np.float32)) * 2 - 1
        )
        with torch.no_grad():
            pairs.append([sx, sy, float(metric(x, y))])
    with open(os.path.join(args.out, "lpips_golden.json"), "w") as f:
        json.dump({"pairs": pairs}, f, indent=2)
    print("wrote", args.out, pairs)


if __name__ == "__main__":
    main()
