from .fid import FIDMetric, compute_frechet_distance, get_fid_score
from .mmd import MMDMetric
from .ssim import MultiScaleSSIMMetric, SSIMMetric, compute_ssim_and_cs

__all__ = [
    "FIDMetric",
    "compute_frechet_distance",
    "get_fid_score",
    "MMDMetric",
    "MultiScaleSSIMMetric",
    "SSIMMetric",
    "compute_ssim_and_cs",
]
