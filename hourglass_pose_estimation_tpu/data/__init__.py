"""Dataset registry. Importing this package registers all datasets
(mirrors the reference's module-`__dict__` factory lookup,
`/root/reference/src/datasets/__init__.py:1-5`)."""

from hourglass_pose_estimation_tpu.data.common import (
    PoseDataset, PoseRecords, Loader, get_dataset, REGISTRY)
from hourglass_pose_estimation_tpu.data import synthetic as _synthetic  # noqa
from hourglass_pose_estimation_tpu.data import mpii as _mpii  # noqa
from hourglass_pose_estimation_tpu.data import mscoco as _mscoco  # noqa
from hourglass_pose_estimation_tpu.data.mpii import MPII, evaluate_pckh
from hourglass_pose_estimation_tpu.data.mscoco import MSCOCO, CrowdPose, Hands
from hourglass_pose_estimation_tpu.data.synthetic import Synthetic
from hourglass_pose_estimation_tpu.data.pipeline import (
    PipelineSpec, make_spec, augment_batch, sample_augmentations)


def n_joints_for(name: str) -> int:
    if name not in REGISTRY:
        raise KeyError(name)
    return REGISTRY[name].n_joints


def resolve_num_classes(cfg) -> int:
    """Joint-count resolution shared by the Trainer and the checkpoint
    importer: explicit MODEL.num_classes, else len(MODEL.subset), else
    the dataset's joint count (the reference CLI's derivation,
    `/root/reference/scripts/train_and_evaluate.py:17-18`)."""
    mc = cfg.model
    return (mc.num_classes or (len(mc.subset) if mc.subset else 0)
            or n_joints_for(cfg.dataset.name))
