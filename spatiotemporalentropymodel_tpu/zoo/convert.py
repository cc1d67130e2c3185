"""Torch checkpoint → JAX parameter-tree converter (the parity oracle).

Layout rules (validated against torch CPU in tests/test_layers.py):
  Conv2d weight (O, I, kh, kw)         → Conv.kernel (kh, kw, I, O)
  ConvTranspose2d weight (I, O, kh, kw)→ Deconv.kernel = spatially flipped,
                                         (kh, kw, I, O)
  GDN beta/gamma, EB matrices/biases/factors/quantiles → copied as-is
  MaskedConv2d weight                  → like Conv2d (mask is re-applied in
                                         the pure forward, layers/masked_conv.py)

Key-name normalization mirrors compressai/zoo/pretrained.py:16-44
(DataParallel ``module.`` strip, ``_biases.N`` → ``_biasN`` etc.). The
reference's CDF buffers (_quantized_cdf/_offset/_cdf_length, scale_table) are
NOT copied — tables are rebuilt deterministically via ``model.update()``,
which the reference's own tests pin to ±2 of shipped tables
(compressai_tests/test_entropy_models.py:305-321).
"""

from typing import Any, Dict, Mapping

import numpy as np


def rename_key(key: str) -> str:
    """Normalize legacy checkpoint keys (zoo/pretrained.py:16-38)."""
    if key.startswith("module."):
        key = key[7:]
    if ".downsample." in key:
        key = key.replace("downsample", "skip")
    for legacy, new in (
        ("._biases.", "._bias"),
        ("._matrices.", "._matrix"),
        ("._factors.", "._factor"),
    ):
        if legacy in key:
            key = key.replace(legacy, new)
    return key


def convert_conv_weight(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) → (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_deconv_weight(w: np.ndarray) -> np.ndarray:
    """(I, O, kh, kw) → flipped (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def invert_conv_weight(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def invert_deconv_weight(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k[::-1, ::-1], (2, 3, 0, 1)))


_SKIP_SUFFIXES = (
    "_quantized_cdf",
    "_offset",
    "_cdf_length",
    "scale_table",
    "scale_bound",
    "target",
    "mask",
    "_noise",
)


def convert_state_dict(
    state_dict: Mapping[str, Any],
    params_template,
    key_map,
) -> Dict:
    """Fill a flax param-tree template from a (renamed) torch state dict.

    Args:
      state_dict: torch-layout name → tensor/ndarray.
      params_template: the target flax params pytree (shapes define layout).
      key_map: callable (flax_path: tuple[str]) -> (torch_key, kind) where
        kind ∈ {"conv", "deconv", "copy"}; return None to keep the template
        leaf (e.g. for params absent from the checkpoint).

    Returns a new pytree with converted leaves; raises on shape mismatch.
    """
    import jax

    renamed = {rename_key(k): v for k, v in state_dict.items()}

    def fill(path, leaf):
        path_names = tuple(
            p.key for p in path if hasattr(p, "key")
        )
        spec = key_map(path_names)
        if spec is None:
            return leaf
        torch_key, kind = spec
        if torch_key not in renamed:
            raise KeyError(
                f"checkpoint missing key {torch_key!r} for param {path_names}"
            )
        v = _to_numpy(renamed[torch_key])
        if kind == "conv":
            v = convert_conv_weight(v)
        elif kind == "deconv":
            v = convert_deconv_weight(v)
        if v.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {path_names}: checkpoint {v.shape} vs "
                f"model {leaf.shape}"
            )
        return v.astype(np.float32)

    return jax.tree_util.tree_map_with_path(fill, params_template)


def sequential_key_map(seq_kinds: Mapping[str, Mapping[int, str]]):
    """Build a key_map for models whose top level is named Sequential stacks.

    seq_kinds: {"g_a": {0: "conv", 2: "conv", ...}, ...} mapping layer index →
    layer kind for conv-like layers; GDN/EB params are handled generically.
    """

    def key_map(path):
        if not path:
            return None
        top = path[0]

        # EntropyBottleneck params: entropy_bottleneck.{matrixN,biasN,factorN,quantiles}
        if top == "entropy_bottleneck":
            name = path[1]
            if name == "quantiles":
                return ("entropy_bottleneck.quantiles", "copy")
            return (f"entropy_bottleneck._{name}", "copy")

        # masked conv context model
        if top == "context_prediction":
            if path[-1] == "kernel":
                return ("context_prediction.weight", "conv")
            return ("context_prediction.bias", "copy")

        if top in seq_kinds and len(path) >= 2 and path[1].startswith("layers_"):
            idx = int(path[1].split("_")[1])
            kind = seq_kinds[top].get(idx)
            leafname = path[-1]
            if kind in ("conv", "deconv"):
                if leafname == "kernel":
                    return (f"{top}.{idx}.weight", kind)
                if leafname == "bias":
                    return (f"{top}.{idx}.bias", "copy")
            if kind == "gdn":
                return (f"{top}.{idx}.{leafname}", "copy")
            if kind == "subpel":  # Sequential(conv, pixelshuffle) in torch
                if leafname == "kernel":
                    return (f"{top}.{idx}.0.weight", "conv")
                if leafname == "bias":
                    return (f"{top}.{idx}.0.bias", "copy")
        return None

    return key_map


# per-architecture Sequential layouts (torch index → kind)
_CONV_GDN_GA = {0: "conv", 1: "gdn", 2: "conv", 3: "gdn", 4: "conv", 5: "gdn",
                6: "conv"}
_DECONV_GDN_GS = {0: "deconv", 1: "gdn", 2: "deconv", 3: "gdn", 4: "deconv",
                  5: "gdn", 6: "deconv"}

KEY_MAPS = {
    "bmshj2018-factorized": sequential_key_map(
        {"g_a": _CONV_GDN_GA, "g_s": _DECONV_GDN_GS}
    ),
    "bmshj2018-hyperprior": sequential_key_map(
        {
            "g_a": _CONV_GDN_GA,
            "g_s": _DECONV_GDN_GS,
            "h_a": {0: "conv", 2: "conv", 4: "conv"},
            "h_s": {0: "deconv", 2: "deconv", 4: "conv"},
        }
    ),
    "mbt2018-mean": sequential_key_map(
        {
            "g_a": _CONV_GDN_GA,
            "g_s": _DECONV_GDN_GS,
            "h_a": {0: "conv", 2: "conv", 4: "conv"},
            "h_s": {0: "deconv", 2: "deconv", 4: "conv"},
        }
    ),
    "mbt2018": sequential_key_map(
        {
            "g_a": _CONV_GDN_GA,
            "g_s": _DECONV_GDN_GS,
            "h_a": {0: "conv", 2: "conv", 4: "conv"},
            "h_s": {0: "deconv", 2: "deconv", 4: "conv"},
            "entropy_parameters": {0: "conv", 2: "conv", 4: "conv"},
        }
    ),
    "stem": sequential_key_map(
        {
            "HE": {0: "conv", 2: "conv", 4: "conv"},
            "HD": {0: "deconv", 2: "deconv", 4: "conv"},
            "TPM": {0: "conv", 2: "conv", 4: "conv"},
            "EPM": {0: "conv", 2: "conv", 4: "conv"},
        }
    ),
}
