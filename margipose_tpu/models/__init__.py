"""Model registry: create models from versioned ``model_desc`` dicts.

(reference: src/margipose/models/__init__.py:10-34)
"""

from __future__ import annotations

from margipose_tpu.data.specs import DataSpecs, ImageSpecs, JointsSpecs
from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc
from margipose_tpu.models.chatterbox import ChatterboxModel, Default_Chatterbox_Desc
from margipose_tpu.models.factory import ModelFactory
from margipose_tpu.models.margipose import Default_MargiPose_Desc, MargiPoseModel


def default_data_specs(input_size: int = 256) -> DataSpecs:
    """Both architectures consume 256x256 ImageNet-normalised crops and emit
    canonical 17-joint 3D skeletons
    (reference: src/margipose/models/margipose_model.py:206-209)."""
    return DataSpecs(
        ImageSpecs(input_size, mean=ImageSpecs.IMAGENET_MEAN,
                   stddev=ImageSpecs.IMAGENET_STDDEV),
        JointsSpecs(CanonicalSkeletonDesc, n_dims=3),
    )


def data_specs_for_desc(model_desc: dict) -> DataSpecs:
    """DataSpecs dictated by a model_desc — the reference's inversion where
    the model owns its input resolution/normalisation
    (reference: src/margipose/bin/train_3d.py:302-303). An optional
    ``input_size`` setting (margipose_tpu extension, default 256) supports
    small smoke configs."""
    return default_data_specs(model_desc.get("settings", {}).get("input_size", 256))


class MargiPoseModelFactory(ModelFactory):
    def __init__(self):
        super().__init__("margipose", "^6.0.0")

    def create(self, model_desc: dict) -> MargiPoseModel:
        s = model_desc["settings"]
        return MargiPoseModel(
            n_joints=CanonicalSkeletonDesc.n_joints,
            n_stages=s.get("n_stages", 4),
            axis_permutation=s.get("axis_permutation", True),
            feature_extractor=s.get("feature_extractor", "inceptionv4"),
            pixelwise_loss=s.get("pixelwise_loss", "jsd"),
        )


class ChatterboxModelFactory(ModelFactory):
    def __init__(self):
        super().__init__("chatterbox", "^1.3.0")

    def create(self, model_desc: dict) -> ChatterboxModel:
        s = model_desc["settings"]
        return ChatterboxModel(
            n_joints=CanonicalSkeletonDesc.n_joints,
            pixelwise_loss=s.get("pixelwise_loss", "jsd"),
        )


MODEL_FACTORIES = [
    MargiPoseModelFactory(),
    ChatterboxModelFactory(),
]


def create_model(model_desc: dict):
    type_name = model_desc["type"]
    version = model_desc["version"]
    for factory in MODEL_FACTORIES:
        if factory.is_for(type_name, version):
            return factory.create(model_desc)
    raise ValueError(f"unrecognised model {type_name} v{version}")


__all__ = [
    "Default_Chatterbox_Desc",
    "Default_MargiPose_Desc",
    "MODEL_FACTORIES",
    "create_model",
    "default_data_specs",
]
