"""Config parser + preset tests (bundle-semantics parity)."""
import pytest

from generativemodels_tpu.config import ConfigParser, load_preset
from generativemodels_tpu.inferers import DiffusionInferer, LatentDiffusionInferer
from generativemodels_tpu.networks.nets import AutoencoderKL, DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DDIMScheduler, DDPMScheduler


class TestConfigParser:
    def test_target_instantiation(self):
        parser = ConfigParser({
            "sched": {
                "_target_": "generativemodels_tpu.networks.schedulers.DDPMScheduler",
                "num_train_timesteps": 50,
            }
        })
        sched = parser.resolve("sched")
        assert isinstance(sched, DDPMScheduler)
        assert sched.num_train_timesteps == 50

    def test_references_and_expressions(self):
        parser = ConfigParser({
            "T": 100,
            "sched": {
                "_target_": "generativemodels_tpu.networks.schedulers.DDPMScheduler",
                "num_train_timesteps": "@T",
            },
            "half": "$@T // 2",
            "inferer": {
                "_target_": "generativemodels_tpu.inferers.DiffusionInferer",
                "scheduler": "@sched",
            },
        })
        assert parser.resolve("half") == 50
        inferer = parser.resolve("inferer")
        assert isinstance(inferer, DiffusionInferer)
        # references resolve to the same cached object
        assert inferer.scheduler is parser.resolve("sched")

    def test_nested_ids(self):
        parser = ConfigParser({"a": {"b": {"c": 3}}})
        assert parser.resolve("a::b::c") == 3
        assert parser.resolve("a#b#c") == 3

    def test_disabled(self):
        parser = ConfigParser({
            "x": {"_target_": "generativemodels_tpu.networks.schedulers.DDPMScheduler",
                  "_disabled_": True}
        })
        assert parser.resolve("x") is None

    def test_override_mixin(self):
        parser = ConfigParser({"T": 10})
        parser.update({"T": 20})
        assert parser.resolve("T") == 20


class TestPresets:
    def test_mednist_ddpm(self):
        parser = load_preset("mednist_ddpm")
        net = parser.resolve("network")
        assert isinstance(net, DiffusionModelUNet)
        assert tuple(net.num_channels) == (128, 256, 256)
        assert isinstance(parser.resolve("inferer"), DiffusionInferer)

    def test_brain_3d_ldm(self):
        parser = load_preset("brain_3d_ldm")
        aekl = parser.resolve("autoencoder")
        assert isinstance(aekl, AutoencoderKL)
        net = parser.resolve("network")
        assert net.in_channels == 7  # $-expression: latent + 4
        assert isinstance(parser.resolve("scheduler"), DDIMScheduler)
        assert isinstance(parser.resolve("inferer"), LatentDiffusionInferer)

    def test_unknown_preset(self):
        with pytest.raises(FileNotFoundError):
            load_preset("bogus")

    def test_cxr_ldm(self):
        parser = load_preset("cxr_ldm")
        net = parser.resolve("network")
        assert net.cross_attention_dim == 1024
        assert isinstance(parser.resolve("inferer"), LatentDiffusionInferer)


REFERENCE = "/root/reference"


@pytest.mark.skipif(
    not __import__("os").path.isdir(REFERENCE), reason="reference checkout absent"
)
class TestReferenceBundleCompat:
    """Instantiate TPU components from the reference's own bundle files."""

    def test_mednist_common_yaml(self):
        from generativemodels_tpu.config import load_reference_bundle

        path = (
            REFERENCE
            + "/model-zoo/models/mednist_ddpm/bundle/configs/common.yaml"
        )
        parser = load_reference_bundle(path)
        net = parser.resolve("network_def")
        assert isinstance(net, DiffusionModelUNet)
        assert tuple(net.num_channels) == (64, 128, 128)
        assert net.num_head_channels == 128 or tuple(
            getattr(net, "num_head_channels", ())
        ) == (128, 128, 128)
        sched = parser.resolve("scheduler")
        assert isinstance(sched, DDPMScheduler)
        assert sched.num_train_timesteps == 1000
        inferer = parser.resolve("inferer")
        assert isinstance(inferer, DiffusionInferer)
        assert inferer.scheduler is sched

    def test_brain_inference_json(self):
        from generativemodels_tpu.config import load_reference_bundle

        path = (
            REFERENCE
            + "/model-zoo/models/brain_image_synthesis_latent_diffusion_model"
            + "/configs/inference.json"
        )
        parser = load_reference_bundle(path)
        aekl = parser.resolve("autoencoder_def")
        assert isinstance(aekl, AutoencoderKL)
        assert tuple(aekl.num_channels) == (64, 128, 128, 128)
        unet = parser.resolve("diffusion_def")
        assert isinstance(unet, DiffusionModelUNet)
        assert unet.in_channels == 7 and unet.with_conditioning
        # `_requires_` (torch state_dict loads) must be stripped, so the
        # scheduler resolves without touching torch or weight files
        sched = parser.resolve("scheduler")
        assert isinstance(sched, DDIMScheduler)
        assert sched.num_train_timesteps == 1000 and not sched.clip_sample

    def test_requires_semantics_in_own_parser(self):
        seen = []

        class Probe:
            def __init__(self):
                seen.append("made")

        import generativemodels_tpu.config as cfg_pkg

        cfg_pkg._probe_cls = Probe  # importable dotted path for _target_
        try:
            parser = ConfigParser({
                "flag": "$[1].append(2)",
                "obj": {
                    "_target_": "generativemodels_tpu.config._probe_cls",
                    "_requires_": "@flag",
                },
            })
            assert isinstance(parser.resolve("obj"), Probe)
            assert seen == ["made"]
        finally:
            del cfg_pkg._probe_cls
