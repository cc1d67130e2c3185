"""Load the actual reference implementation (/root/reference) as a live oracle.

The reference tree cannot be imported verbatim (documented bit-rot and
platform issues — SURVEY.md "repo-level quirks"):

  * ``compressai/models/__init__.py:17`` does ``from .gain import *`` but
    ``gain.py`` does not exist → stub an empty module.
  * ``compressai.ans`` / ``compressai._CXX`` are Windows-only pybind11
    binaries (the checked-in ``.py`` files are IDE stubs) → shim them with
    this repo's own list-API coder (``coders/compat.py``) and CDF quantizer
    (``entropy/cdf.py``). Everything *above* the native boundary — the torch
    entropy models, conv stacks, quantization, index construction, symbol
    ordering — runs as the unmodified reference code, which is exactly the
    layer the parity tests target. The coder itself is pinned separately by
    golden bitstreams (tests/test_coders.py).
  * ``spatiotemporalpriors.py`` / ``stem_roi.py`` import torchvision (absent
    here) only for unused ``make_grid/save_image`` → stub.

Usage: ``compressai = load_reference()`` (cached). Tests should treat a
``None`` return (torch missing) as a skip condition.
"""

import importlib.util
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_cache = {}


def load_reference():
    """Import the reference ``compressai`` with functional native shims."""
    if "compressai" in _cache:
        return _cache["compressai"]

    if REFERENCE_ROOT not in sys.path:
        # append (not insert) so the reference's top-level modules
        # (utils.py, stem/, ...) never shadow anything of ours
        sys.path.append(REFERENCE_ROOT)

    # -- empty gain module (models/__init__.py:17 bit-rot)
    gain = types.ModuleType("compressai.models.gain")
    gain.__all__ = []
    sys.modules.setdefault("compressai.models.gain", gain)

    # -- torchvision stub (only make_grid/save_image are imported, unused)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvu.save_image = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu

    # -- functional _CXX shim: this repo's CDF quantizer (list API)
    from spatiotemporalentropymodel_tpu.entropy.cdf import pmf_to_quantized_cdf

    cxx = types.ModuleType("compressai._CXX")
    cxx.pmf_to_quantized_cdf = lambda pmf, precision: [
        int(v)
        for v in pmf_to_quantized_cdf(np.asarray(pmf, np.float64), precision)
    ]
    sys.modules["compressai._CXX"] = cxx

    # -- functional ans shim: this repo's list-API coder classes
    from spatiotemporalentropymodel_tpu.coders import compat

    ans = types.ModuleType("compressai.ans")
    ans.BufferedRansEncoder = compat.BufferedRansEncoder
    ans.RansEncoder = compat.RansEncoder
    ans.RansDecoder = compat.RansDecoder
    sys.modules["compressai.ans"] = ans

    import compressai  # noqa: E402

    compressai.ans = ans
    compressai._CXX = cxx
    _cache["compressai"] = compressai
    return compressai


def load_stem_roi():
    """The reference's models/__init__ never imports stem_roi (only priors/
    waseda/spatiotemporalpriors) — import the module explicitly."""
    load_reference()
    import importlib

    return importlib.import_module("compressai.models.stem_roi")


def load_reference_utils():
    """Load the reference's root utils.py (EMLoss etc.) under a unique name."""
    if "ref_utils" in _cache:
        return _cache["ref_utils"]
    spec = importlib.util.spec_from_file_location(
        "_reference_root_utils", f"{REFERENCE_ROOT}/utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _cache["ref_utils"] = mod
    return mod


def to_nchw(x_nhwc) -> "np.ndarray":
    return np.ascontiguousarray(np.moveaxis(np.asarray(x_nhwc), -1, 1))


def to_nhwc(x_nchw) -> np.ndarray:
    return np.ascontiguousarray(np.moveaxis(np.asarray(x_nchw), 1, -1))


def torch_state_dict(module) -> dict:
    """state_dict → numpy dict (keeps torch out of downstream imports)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
