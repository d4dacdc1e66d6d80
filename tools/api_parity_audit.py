"""Constructor-signature parity audit vs the reference library.

Parses the reference sources with `ast` (no torch import needed) and
compares each public class's __init__ parameter list against the
same-named class in generativemodels_tpu. The goal of the audit: a user
porting reference code 1:1 must find every constructor argument they
already use — extra TPU-side knobs (dtype, use_flash, ...) are fine,
*missing* reference parameters are the defect class this guards against.

Reference files audited are listed in REF_CLASSES below with their
`path -> [classes]`. Run: python tools/api_parity_audit.py
"""
from __future__ import annotations

import ast
import importlib
import inspect
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REF = "/root/reference/generative"

# reference file -> (our module, [class names])
REF_CLASSES = {
    "networks/nets/diffusion_model_unet.py": (
        "generativemodels_tpu.networks.nets.diffusion_model_unet",
        ["DiffusionModelUNet", "DiffusionModelEncoder"],
    ),
    "networks/nets/autoencoderkl.py": (
        "generativemodels_tpu.networks.nets.autoencoderkl",
        ["AutoencoderKL"],
    ),
    "networks/nets/vqvae.py": (
        "generativemodels_tpu.networks.nets.vqvae",
        ["VQVAE"],
    ),
    "networks/nets/controlnet.py": (
        "generativemodels_tpu.networks.nets.controlnet",
        ["ControlNet"],
    ),
    "networks/nets/transformer.py": (
        "generativemodels_tpu.networks.nets.transformer",
        ["DecoderOnlyTransformer"],
    ),
    "networks/nets/patchgan_discriminator.py": (
        "generativemodels_tpu.networks.nets.patchgan_discriminator",
        ["PatchDiscriminator", "MultiScalePatchDiscriminator"],
    ),
    "networks/nets/spade_autoencoderkl.py": (
        "generativemodels_tpu.networks.nets.spade_autoencoderkl",
        ["SPADEAutoencoderKL"],
    ),
    "networks/nets/spade_diffusion_model_unet.py": (
        "generativemodels_tpu.networks.nets.spade_diffusion_model_unet",
        ["SPADEDiffusionModelUNet"],
    ),
    "networks/nets/spade_network.py": (
        "generativemodels_tpu.networks.nets.spade_network",
        ["SPADENet"],
    ),
    "networks/blocks/selfattention.py": (
        "generativemodels_tpu.networks.blocks.selfattention",
        ["SABlock"],
    ),
    "networks/blocks/transformerblock.py": (
        "generativemodels_tpu.networks.blocks.selfattention",
        ["TransformerBlock"],
    ),
    "networks/blocks/encoder_modules.py": (
        "generativemodels_tpu.networks.blocks.encoder_modules",
        ["SpatialRescaler"],
    ),
    "networks/blocks/spade_norm.py": (
        "generativemodels_tpu.networks.blocks.spade_norm",
        ["SPADE"],
    ),
    "networks/layers/vector_quantizer.py": (
        "generativemodels_tpu.networks.layers.vector_quantizer",
        ["EMAQuantizer", "VectorQuantizer"],
    ),
    "networks/schedulers/ddpm.py": (
        "generativemodels_tpu.networks.schedulers.ddpm",
        ["DDPMScheduler"],
    ),
    "networks/schedulers/ddim.py": (
        "generativemodels_tpu.networks.schedulers.ddim",
        ["DDIMScheduler"],
    ),
    "networks/schedulers/pndm.py": (
        "generativemodels_tpu.networks.schedulers.pndm",
        ["PNDMScheduler"],
    ),
    "inferers/inferer.py": (
        "generativemodels_tpu.inferers",
        [
            "DiffusionInferer",
            "LatentDiffusionInferer",
            "ControlNetDiffusionInferer",
            "ControlNetLatentDiffusionInferer",
            "VQVAETransformerInferer",
        ],
    ),
    "losses/adversarial_loss.py": (
        "generativemodels_tpu.losses.adversarial_loss",
        ["PatchAdversarialLoss"],
    ),
    "losses/perceptual.py": (
        "generativemodels_tpu.losses.perceptual",
        ["PerceptualLoss"],
    ),
    "losses/spectral_loss.py": (
        "generativemodels_tpu.losses.spectral_loss",
        ["JukeboxLoss"],
    ),
    "metrics/fid.py": ("generativemodels_tpu.metrics.fid", ["FIDMetric"]),
    "metrics/mmd.py": ("generativemodels_tpu.metrics.mmd", ["MMDMetric"]),
    "metrics/ssim.py": ("generativemodels_tpu.metrics.ssim", ["SSIMMetric"]),
    "metrics/ms_ssim.py": (
        "generativemodels_tpu.metrics.ssim",
        ["MultiScaleSSIMMetric"],
    ),
    "utils/ordering.py": ("generativemodels_tpu.utils.ordering", ["Ordering"]),
    "utils/component_store.py": (
        "generativemodels_tpu.utils.component_store",
        ["ComponentStore"],
    ),
    "engines/prepare_batch.py": (
        "generativemodels_tpu.engines.prepare_batch",
        ["DiffusionPrepareBatch", "VPredictionPrepareBatch"],
    ),
    "engines/trainer.py": (
        "generativemodels_tpu.engines.trainer",
        ["AdversarialTrainer"],
    ),
}


# Intentional constructor-parameter differences, keyed "Class.param" ->
# documented JAX-side equivalent. Only torch/Ignite runtime plumbing with
# no meaning under jit belongs here.
CONSTRUCTOR_EXCEPTIONS = {
    # AdversarialTrainer: the Ignite Engine surface. The training maths
    # (losses, warmup, event hooks) all have same-named args; what is
    # excepted is torch runtime plumbing:
    "AdversarialTrainer.device": "no device placement under jit",
    "AdversarialTrainer.g_network": "g_forward callable (functional module)",
    "AdversarialTrainer.d_network": "d_forward callable",
    "AdversarialTrainer.g_optimizer": "g_tx (optax transformation)",
    "AdversarialTrainer.d_optimizer": "d_tx",
    "AdversarialTrainer.epoch_length": "len(train_data_loader) per epoch",
    "AdversarialTrainer.non_blocking": "async host->device copies are the default",
    "AdversarialTrainer.prepare_batch": "DiffusionPrepareBatch composes outside the step",
    "AdversarialTrainer.iteration_update": "the fused jitted step is the iteration",
    "AdversarialTrainer.g_inferer": "g_forward already closes over any inferer",
    "AdversarialTrainer.d_inferer": "d_forward likewise",
    "AdversarialTrainer.postprocessing": "apply to `trainer.output` in a handler",
    "AdversarialTrainer.key_train_metric": "metrics attach via handlers",
    "AdversarialTrainer.additional_metrics": "handlers",
    "AdversarialTrainer.metric_cmp_fn": "handlers",
    "AdversarialTrainer.train_handlers": "handlers= (event -> callback mapping)",
    "AdversarialTrainer.amp": "bf16 via model dtype; no GradScaler on TPU",
    "AdversarialTrainer.event_names": "AdversarialIterationEvents are built in",
    "AdversarialTrainer.event_to_attr": "not applicable (no Ignite state object)",
    "AdversarialTrainer.decollate": "outputs stay batched jnp arrays",
    "AdversarialTrainer.optim_set_to_none": "no grad buffers in functional optax",
    "AdversarialTrainer.to_kwargs": "no .to() under jit",
    "AdversarialTrainer.amp_kwargs": "see amp",
}

# Intentional method-level differences (torch idioms with a documented
# JAX-side equivalent), keyed "Class.method" -> reason. Anything listed
# here is exempt from the method audit; everything else must exist with
# a superset of the reference's parameter names.
METHOD_EXCEPTIONS = {
    "PatchDiscriminator.initialise_weights": (
        "torch nn.Module.apply init-callback idiom; the N(0,0.02) init is "
        "applied at construction via flax kernel_init instead"
    ),
    "MultiScalePatchDiscriminator.forward.i": (
        "reference names the input tensor `i`; ours uses `x` (positional "
        "call compatible; flax __call__ convention)"
    ),
    "PNDMScheduler.step_prk": (
        "folded into the stateful step(state, ...) lax.cond dispatch — "
        "PNDM's counter/ets history is an explicit PNDMState carry"
    ),
    "PNDMScheduler.step_plms": "see PNDMScheduler.step_prk",
    # torch.FloatTensor staticmethod helpers on the reference Scheduler
    # base are instance methods here operating on jnp arrays
}


def ref_public_methods(path: str, cls: str) -> dict[str, list[str]]:
    """{method: [param names]} for public (non-underscore) methods."""
    tree = ast.parse(open(os.path.join(REF, path)).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls:
            out = {}
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and not item.name.startswith("_"):
                    a = item.args
                    names = [p.arg for p in a.posonlyargs + a.args if p.arg != "self"]
                    names += [p.arg for p in a.kwonlyargs]
                    out[item.name] = names
            return out
    return {}


def method_gaps(path: str, module: str, cls: str) -> list[str]:
    """Human-readable method-parity defects for one class (empty = ok).

    `forward` maps to `__call__`; methods/params listed in
    METHOD_EXCEPTIONS are skipped with their documented reason.
    """
    try:
        obj = getattr(importlib.import_module(module), cls)
    except (ImportError, AttributeError):
        return [f"{cls}: not importable from {module}"]
    gaps = []
    for name, params in ref_public_methods(path, cls).items():
        if f"{cls}.{name}" in METHOD_EXCEPTIONS:
            continue
        ours = getattr(obj, name, None)
        if ours is None and name == "forward":
            ours = getattr(obj, "__call__", None)
        if ours is None:
            gaps.append(f"{cls}.{name} missing (ref params: {params})")
            continue
        try:
            sig = inspect.signature(ours)
        except (TypeError, ValueError):
            continue
        our_params = [p for p in sig.parameters if p not in ("self", "args", "kwargs")]
        missing = [
            p for p in params
            if p not in our_params and f"{cls}.{name}.{p}" not in METHOD_EXCEPTIONS
        ]
        if missing:
            gaps.append(f"{cls}.{name} missing params {missing} (ours: {our_params})")
    return gaps


def ref_init_params(path: str, cls: str) -> list[str] | None:
    """Parameter names of `cls.__init__` in a reference file, via ast."""
    tree = ast.parse(open(os.path.join(REF, path)).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == cls:
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name == "__init__":
                    a = item.args
                    names = [p.arg for p in a.posonlyargs + a.args if p.arg != "self"]
                    names += [p.arg for p in a.kwonlyargs]
                    return names
    return None


def our_init_params(module: str, cls: str) -> list[str] | None:
    try:
        mod = importlib.import_module(module)
        obj = getattr(mod, cls)
    except (ImportError, AttributeError):
        return None
    try:
        sig = inspect.signature(obj.__init__)
    except (TypeError, ValueError):
        return None
    skip = {"self", "args", "kwargs"}
    try:
        import flax.linen as nn

        if isinstance(obj, type) and issubclass(obj, nn.Module):
            skip |= {"parent", "name"}  # flax dataclass internals
    except ImportError:
        pass
    return [p for p in sig.parameters if p not in skip]


def main() -> None:
    report = {"classes": [], "missing_total": 0}
    for path, (module, classes) in sorted(REF_CLASSES.items()):
        for cls in classes:
            ref = ref_init_params(path, cls)
            ours = our_init_params(module, cls)
            if ref is None:
                row = {"class": cls, "error": f"not found in reference {path}"}
            elif ours is None:
                row = {"class": cls, "error": f"not importable from {module}"}
            else:
                missing = [
                    p for p in ref
                    if p not in ours and f"{cls}.{p}" not in CONSTRUCTOR_EXCEPTIONS
                ]
                extra = [p for p in ours if p not in ref]
                mgaps = method_gaps(path, module, cls)
                row = {
                    "class": cls,
                    "ref_file": path,
                    "missing": missing,
                    "extra_tpu_knobs": extra,
                    "method_gaps": mgaps,
                }
                report["missing_total"] += len(missing) + len(mgaps)
            report["classes"].append(row)
    print(json.dumps(report, indent=1))
    sys.exit(1 if report["missing_total"] else 0)


if __name__ == "__main__":
    main()
