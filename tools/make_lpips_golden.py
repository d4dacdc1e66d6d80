"""Produce perceptual-loss golden values + weight files for tests/test_pretrained.py.

Run this on a machine WITH network access and the `lpips` + `torchvision`
packages (torch.hub access for the RadImageNet / MedicalNet families),
then copy the output directory to the target machine and point
GMTPU_WEIGHTS_DIR at it:

    python tools/make_lpips_golden.py --out weights/

Writes (each backbone is optional — failures are recorded and skipped):
    alexnet.pth / vgg16.pth / squeezenet1_1.pth
                            torchvision backbone state_dicts (LPIPS nets)
    lpips_alex.pth / lpips_vgg.pth / lpips_squeeze.pth
                            lpips lin-head checkpoints
    resnet50.pth            torchvision ResNet50 state_dict
    radimagenet_resnet50.pth            torch.hub Warvito/radimagenet-models
    medicalnet_resnet10_23datasets.pth  torch.hub Warvito/MedicalNet-models
    perceptual_golden.json  {"<net>": [[seed_x, seed_y, value], ...]}
                            reference loss values on fixed random pairs,
                            computed with the published formulas
                            (reference generative/losses/perceptual.py:
                            LPIPS package for alex/vgg/squeeze; :150-196
                            MedicalNet, :215-268 RadImageNet, :270-330
                            torchvision ResNet50)
    lpips_golden.json       legacy alex-only format (back-compat)
"""
from __future__ import annotations

import argparse
import json
import os

SEED_PAIRS = [(0, 1), (2, 3), (4, 5)]


def _pair_2d(sx, sy, lo, hi):
    import numpy as np
    import torch

    def mk(seed):
        a = np.random.RandomState(seed).rand(1, 3, 64, 64).astype(np.float32)
        return torch.from_numpy(a * (hi - lo) + lo)

    return mk(sx), mk(sy)


def _pair_3d(sx, sy):
    import numpy as np
    import torch

    def mk(seed):
        a = np.random.RandomState(seed).rand(1, 1, 32, 32, 32).astype(np.float32)
        return torch.from_numpy(a)

    return mk(sx), mk(sy)


def _normalize(t):
    import torch

    return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + 1e-10)


def _spatial_mean(t):
    return t.mean(dim=list(range(2, t.ndim)), keepdim=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import torch

    golden: dict[str, list] = {}
    failures: dict[str, str] = {}

    # ---- LPIPS families: alex / vgg / squeeze ------------------------------
    try:
        import lpips
        import torchvision

        backbones = {
            "alex": (torchvision.models.alexnet,
                     torchvision.models.AlexNet_Weights.IMAGENET1K_V1, "alexnet.pth"),
            "vgg": (torchvision.models.vgg16,
                    torchvision.models.VGG16_Weights.IMAGENET1K_V1, "vgg16.pth"),
            "squeeze": (torchvision.models.squeezenet1_1,
                        torchvision.models.SqueezeNet1_1_Weights.IMAGENET1K_V1,
                        "squeezenet1_1.pth"),
        }
        for net, (ctor, weights, fname) in backbones.items():
            try:
                model = ctor(weights=weights)
                torch.save(model.state_dict(), os.path.join(args.out, fname))
                metric = lpips.LPIPS(net=net)
                lin_sd = {k: v for k, v in metric.state_dict().items()
                          if k.startswith("lin")}
                torch.save(lin_sd, os.path.join(args.out, f"lpips_{net}.pth"))
                pairs = []
                for sx, sy in SEED_PAIRS:
                    x, y = _pair_2d(sx, sy, -1.0, 1.0)
                    with torch.no_grad():
                        pairs.append([sx, sy, float(metric(x, y))])
                golden[net] = pairs
            except Exception as e:  # noqa: BLE001 — record and continue
                failures[net] = repr(e)
    except Exception as e:  # noqa: BLE001
        failures["lpips-family"] = repr(e)

    # ---- torchvision ResNet50 (reference :270-330) -------------------------
    try:
        import torchvision
        from torchvision.models.feature_extraction import create_feature_extractor

        net = torchvision.models.resnet50(
            weights=torchvision.models.ResNet50_Weights.DEFAULT
        )
        torch.save(net.state_dict(), os.path.join(args.out, "resnet50.pth"))
        extractor = create_feature_extractor(net, ["layer4.2.relu_2"]).eval()
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        pairs = []
        for sx, sy in SEED_PAIRS:
            x, y = _pair_2d(sx, sy, 0.0, 1.0)
            with torch.no_grad():
                fx = _normalize(extractor((x - mean) / std)["layer4.2.relu_2"])
                fy = _normalize(extractor((y - mean) / std)["layer4.2.relu_2"])
                v = _spatial_mean(((fx - fy) ** 2).sum(dim=1, keepdim=True))
            pairs.append([sx, sy, float(v.mean())])
        golden["resnet50"] = pairs
    except Exception as e:  # noqa: BLE001
        failures["resnet50"] = repr(e)

    # ---- RadImageNet ResNet50 (reference :215-268) -------------------------
    try:
        model = torch.hub.load(
            "Warvito/radimagenet-models", model="radimagenet_resnet50", verbose=False
        ).eval()
        torch.save(model.state_dict(),
                   os.path.join(args.out, "radimagenet_resnet50.pth"))
        bgr_mean = torch.tensor([0.406, 0.456, 0.485]).view(1, 3, 1, 1)
        pairs = []
        for sx, sy in SEED_PAIRS:
            x, y = _pair_2d(sx, sy, 0.0, 1.0)
            with torch.no_grad():
                fx = _normalize(model(x[:, [2, 1, 0]] - bgr_mean))
                fy = _normalize(model(y[:, [2, 1, 0]] - bgr_mean))
                v = _spatial_mean(((fx - fy) ** 2).sum(dim=1, keepdim=True))
            pairs.append([sx, sy, float(v.mean())])
        golden["radimagenet_resnet50"] = pairs
    except Exception as e:  # noqa: BLE001
        failures["radimagenet_resnet50"] = repr(e)

    # ---- MedicalNet ResNet10 (3D, reference :150-196) ----------------------
    try:
        torch.hub._validate_not_a_forked_repo = lambda a, b, c: True
        model = torch.hub.load(
            "Warvito/MedicalNet-models", model="medicalnet_resnet10_23datasets",
            verbose=False,
        ).eval()
        torch.save(model.state_dict(),
                   os.path.join(args.out, "medicalnet_resnet10_23datasets.pth"))
        pairs = []
        for sx, sy in SEED_PAIRS:
            x, y = _pair_3d(sx, sy)
            with torch.no_grad():
                xn = (x - x.mean()) / x.std()
                yn = (y - y.mean()) / y.std()
                fx = _normalize(model(xn))
                fy = _normalize(model(yn))
                v = _spatial_mean(((fx - fy) ** 2).sum(dim=1, keepdim=True))
            pairs.append([sx, sy, float(v.mean())])
        golden["medicalnet_resnet10_23datasets"] = pairs
    except Exception as e:  # noqa: BLE001
        failures["medicalnet_resnet10_23datasets"] = repr(e)

    with open(os.path.join(args.out, "perceptual_golden.json"), "w") as f:
        json.dump({"golden": golden, "failures": failures}, f, indent=2)
    if "alex" in golden:  # legacy file consumed by older tests
        with open(os.path.join(args.out, "lpips_golden.json"), "w") as f:
            json.dump({"pairs": golden["alex"]}, f, indent=2)
    print("wrote", args.out)
    print("golden nets:", sorted(golden))
    if failures:
        print("failures:", failures)


if __name__ == "__main__":
    main()
