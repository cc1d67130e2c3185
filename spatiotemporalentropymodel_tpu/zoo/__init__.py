"""Model registry and quality configurations.

Parity: compressai/zoo/__init__.py:17-24 (name → constructor) and
compressai/zoo/image.py:131-215 (quality → (N, M) configs, loader). Pretrained
S3 downloads are replaced by ``load_torch_checkpoint`` — a converter for
locally provided torch ``.pth.tar`` files (this environment has no network
egress; the converter is the parity oracle for reference weights).
"""

from ..models import (
    Cheng2020Anchor,
    Cheng2020Attention,
    FactorizedPrior,
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    ScaleHyperprior,
    SpatioTemporalPriorModel,
    StemBaseline,
    StemBaselineV2,
    StemROI,
    StemROIWoGsc,
    StemROI_I,
)
from ..models import SpatioTemporalPriorModelChannelAR
from .convert import KEY_MAPS, convert_state_dict, rename_key

model_architectures = {
    "bmshj2018-factorized": FactorizedPrior,
    "bmshj2018-hyperprior": ScaleHyperprior,
    "mbt2018-mean": MeanScaleHyperprior,
    "mbt2018": JointAutoregressiveHierarchicalPriors,
    "cheng2020-anchor": Cheng2020Anchor,
    "cheng2020-attn": Cheng2020Attention,
}

# quality index → constructor args (zoo/image.py:131-188)
cfgs = {
    "bmshj2018-factorized": {q: (128, 192) for q in range(1, 6)}
    | {q: (192, 320) for q in range(6, 9)},
    "bmshj2018-hyperprior": {q: (128, 192) for q in range(1, 6)}
    | {q: (192, 320) for q in range(6, 9)},
    "mbt2018-mean": {q: (128, 192) for q in range(1, 5)}
    | {q: (192, 320) for q in range(5, 9)},
    "mbt2018": {q: (192, 192) for q in range(1, 5)}
    | {q: (192, 320) for q in range(5, 9)},
    "cheng2020-anchor": {q: (128,) for q in range(1, 4)}
    | {q: (192,) for q in range(4, 7)},
    "cheng2020-attn": {q: (128,) for q in range(1, 4)}
    | {q: (192,) for q in range(4, 7)},
}

# STEM variants by reference class name (README parity)
stem_models = {
    "stpm_without_spm_tpm": lambda **kw: SpatioTemporalPriorModel(
        variant="without_spm_tpm", **kw
    ),
    "stpm_without_spm": lambda **kw: SpatioTemporalPriorModel(
        variant="without_spm", **kw
    ),
    "stpm_without_tpm": lambda **kw: SpatioTemporalPriorModel(
        variant="without_tpm", **kw
    ),
    "stpm": lambda **kw: SpatioTemporalPriorModel(variant="full", **kw),
    "stpm_res": lambda **kw: SpatioTemporalPriorModel(variant="res", **kw),
    # beyond-reference: channel-autoregressive STEM (models/charm.py) —
    # SPM-class conditioning with a fully parallel spatial decode
    "stpm_charm": SpatioTemporalPriorModelChannelAR,
}

# ROI / pixel-domain video family (stem_roi.py class names)
roi_models = {
    "stem_baseline": StemBaseline,
    "stem_baselinev2": StemBaselineV2,
    "stem_roi": StemROI,
    "stem_roi_wo_gsc": StemROIWoGsc,
    "stem_roi_i": StemROI_I,
}

# video model name → (key-map name, example-arg builder) for the converter
def _video_examples(name, size=64, in_channels=192):
    import numpy as np

    img = np.zeros((1, size, size, 3), np.float32)
    qmap = np.zeros((1, size, size, 1), np.float32)
    lat = np.zeros((1, size // 16, size // 16, in_channels), np.float32)
    return {
        "stem_baseline": (img, img),
        "stem_baselinev2": (img, img),
        "stem_roi": (img, img, qmap),
        "stem_roi_wo_gsc": (img, img, qmap),
        "stem_roi_i": (img, qmap),
        **{k: (lat, lat) for k in stem_models},
    }[name]


_VIDEO_KEY_MAP = {
    "stem_baseline": "stem-baseline",
    "stem_baselinev2": "stem-baseline",
    "stem_roi": "stem-roi",
    "stem_roi_wo_gsc": "stem-roi",
    "stem_roi_i": "stem-roi",
}


def load_video_torch_checkpoint(name: str, path_or_state, **kwargs):
    """Build a video model (STEM / ROI family) from a torch checkpoint.

    Covers the archs the reference trains via stem/trainSTEM.py and
    stem_roi/train_stem_roi.py; `path_or_state` is a ``.pth.tar`` path or an
    already-loaded state dict. Tables are rebuilt via ``update(force=True)``.
    """
    state = path_or_state
    if isinstance(state, (str, bytes)):
        import torch

        state = torch.load(state, map_location="cpu")
    if "state_dict" in state:
        state = state["state_dict"]

    if name in roi_models:
        model = roi_models[name](**kwargs)
        key_map = KEY_MAPS[_VIDEO_KEY_MAP[name]]
    elif name in stem_models:
        model = stem_models[name](**kwargs)
        key_map = KEY_MAPS["stem"]
    else:
        raise ValueError(f'Invalid video model name "{name}"')
    model.init(*_video_examples(
        name, in_channels=kwargs.get("in_channels", 192)
    ))
    model.params = convert_state_dict(state, model.params, key_map)
    _install_tables(model, state)
    return model


def _install_tables(model, state):
    """Prefer the checkpoint's shipped CDF buffers (byte-compatible
    bitstreams); rebuild via update() only when the checkpoint has none."""
    from .convert import tables_from_state_dict

    tables = tables_from_state_dict(
        state,
        bottleneck_names=model.bottleneck_names,
        has_gaussian=model.has_gaussian,
    )
    if tables is not None:
        model.set_tables(tables)
    else:
        model.update(force=True)


models = dict(model_architectures)


def create_model(architecture: str, quality: int = 1, **kwargs):
    """Instantiate a zoo model at a quality level (zoo/image.py:191-215,
    without the pretrained download path)."""
    if architecture not in model_architectures:
        raise ValueError(f'Invalid architecture name "{architecture}"')
    if quality not in cfgs[architecture]:
        raise ValueError(f'Invalid quality value "{quality}"')
    return model_architectures[architecture](*cfgs[architecture][quality], **kwargs)


def load_torch_checkpoint(architecture: str, path: str, quality: int = 1,
                          example_input=None):
    """Build a model and fill its params from a torch ``.pth.tar`` checkpoint.

    The checkpoint is read with ``torch.load`` (CPU); keys are normalized via
    ``rename_key`` and tensors converted to the NHWC/HWIO layouts. Codec
    tables are rebuilt with ``model.update(force=True)``.
    """
    import jax.numpy as jnp
    import torch

    state = torch.load(path, map_location="cpu")
    if "state_dict" in state:
        state = state["state_dict"]

    model = create_model(architecture, quality)
    if example_input is None:
        import jax

        example_input = jax.random.uniform(
            jax.random.PRNGKey(0), (1, 64, 64, 3), jnp.float32
        )
    model.init(example_input)
    key_map = KEY_MAPS.get(architecture)
    if key_map is None:
        raise NotImplementedError(
            f"no checkpoint key map for architecture {architecture!r}"
        )
    model.params = convert_state_dict(state, model.params, key_map)
    _install_tables(model, state)
    return model


__all__ = [
    "models",
    "model_architectures",
    "stem_models",
    "roi_models",
    "cfgs",
    "create_model",
    "load_torch_checkpoint",
    "load_video_torch_checkpoint",
    "convert_state_dict",
    "rename_key",
    "KEY_MAPS",
]
