"""Model registry (string -> factory), mirroring the reference's
module-`__dict__` lookup (`/root/reference/src/models/__init__.py`,
used as `models.__dict__[arch](**kwargs)`)."""

from hourglass_pose_estimation_tpu.models.hourglass import HourglassNet, hg
from hourglass_pose_estimation_tpu.models.modules import (
    Bottleneck, Hourglass, ResidualChain)
from hourglass_pose_estimation_tpu.models.mspn import MSPN, mspn

REGISTRY = {
    'hg': hg,
    'mspn': mspn,
}


def get_model(arch: str, **kwargs):
    if arch not in REGISTRY:
        raise KeyError(f"unknown arch '{arch}'; available: {sorted(REGISTRY)}")
    return REGISTRY[arch](**kwargs)
