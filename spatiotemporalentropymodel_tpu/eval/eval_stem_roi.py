"""ROI / variable-rate evaluation (stem_roi/eval_stem_roi.py and
eval_stem_baseline.py parity).

Per GOP sequence: I-frames through the variable-rate I model (stem_roi_i),
P-frames through stem_roi conditioned on the previous *reconstruction*
(:230-246); uniform Qmaps at a sweep of levels (11 levels in the reference,
:427), gradient test maps (levels −1/−2), and the rate-control sweep
``eval_rc`` over target levels {0.30, 0.45, 0.55, 0.70} (:368-376). Reports
PSNR / MS-SSIM / actual bpp / estimated bpp per level.
"""

import json
import time
from typing import Dict, Iterable, List, Optional

import jax.numpy as jnp
import numpy as np

from ..data.qmap import gradient_qmap, uniform_qmap
from ..ops.padding import crop_centered, pad_centered
from .metrics import actual_bpp, estimate_bpp, ms_ssim_or_nan, psnr

DEFAULT_LEVELS = [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
RC_LEVELS = [0.30, 0.45, 0.55, 0.70]


def _make_qmap(shape, level, level_max=100):
    """level >= 0 → uniform; −1/−2 → horizontal/vertical gradient maps."""
    h, w = shape
    if level == -1:
        return gradient_qmap((h, w), 0, level_max, horizontal=True)
    if level == -2:
        return gradient_qmap((h, w), 0, level_max, horizontal=False)
    q = uniform_qmap(max(h, w), level, level_max)[:h, :w]
    return q


def inference_i(model_i, x, qmap, entropy_estimation=False) -> Dict:
    x_padded, pads = pad_centered(jnp.asarray(x), 64)
    q_padded, _ = pad_centered(jnp.asarray(qmap)[None], 64)
    num_pixels = x.shape[1] * x.shape[2]

    fwd = model_i.forward(x_padded, q_padded)
    bpp_est = float(estimate_bpp(fwd["likelihoods"], num_pixels))
    if entropy_estimation:
        x_hat, bpp, enc_t, dec_t = fwd["x_hat"], bpp_est, 0.0, 0.0
    else:
        t0 = time.time()
        enc = model_i.compress(x_padded, q_padded)
        enc_t = time.time() - t0
        t0 = time.time()
        dec = model_i.decompress(enc["strings"], enc["shape"])
        dec_t = time.time() - t0
        x_hat = dec["x_hat"]
        bpp = actual_bpp(enc["strings"], num_pixels)
    x_hat_c = crop_centered(jnp.asarray(x_hat), pads)
    return {
        "x_hat": x_hat,  # padded reconstruction carries to the next frame
        "psnr": float(psnr(jnp.asarray(x), x_hat_c)),
        "ms-ssim": ms_ssim_or_nan(jnp.asarray(x), x_hat_c),
        "bpp": bpp,
        "estimate_bpp": bpp_est,
        "encoding_time": enc_t,
        "decoding_time": dec_t,
    }


def inference_p(model_p, x, x_conditioned, qmap,
                entropy_estimation=False) -> Dict:
    x_padded, pads = pad_centered(jnp.asarray(x), 64)
    q_padded, _ = pad_centered(jnp.asarray(qmap)[None], 64)
    num_pixels = x.shape[1] * x.shape[2]

    fwd = model_p.forward(x_padded, x_conditioned, q_padded)
    bpp_est = float(estimate_bpp(fwd["likelihoods"], num_pixels))
    if entropy_estimation:
        x_hat, bpp, enc_t, dec_t = fwd["x_hat"], bpp_est, 0.0, 0.0
    else:
        t0 = time.time()
        enc = model_p.compress(x_padded, x_conditioned, q_padded)
        enc_t = time.time() - t0
        t0 = time.time()
        dec = model_p.decompress(enc["strings"], enc["shape"], x_conditioned)
        dec_t = time.time() - t0
        x_hat = dec["x_hat"]
        bpp = actual_bpp(enc["strings"], num_pixels)
    x_hat_c = crop_centered(jnp.asarray(x_hat), pads)
    return {
        "x_hat": x_hat,
        "psnr": float(psnr(jnp.asarray(x), x_hat_c)),
        "ms-ssim": ms_ssim_or_nan(jnp.asarray(x), x_hat_c),
        "bpp": bpp,
        "estimate_bpp": bpp_est,
        "encoding_time": enc_t,
        "decoding_time": dec_t,
    }


def eval_sequence_at_level(model_i, model_p, sequence, level,
                           entropy_estimation=False) -> Dict[str, float]:
    """One sequence at one Qmap level; reconstruction carry across frames."""
    sums = {"psnr": 0.0, "ms-ssim": 0.0, "bpp": 0.0, "estimate_bpp": 0.0}
    n = 0
    x_conditioned = None
    for frame in sequence:
        x = frame.image[None]
        qmap = _make_qmap(x.shape[1:3], level)
        if frame.is_intra or x_conditioned is None:
            out = inference_i(model_i, x, qmap, entropy_estimation)
        else:
            out = inference_p(model_p, x, x_conditioned, qmap,
                              entropy_estimation)
        x_conditioned = out["x_hat"]
        for k in sums:
            sums[k] += out[k]
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()} | {"frames": n}


def eval_levels(model_i, model_p, dataset, levels: Optional[List] = None,
                entropy_estimation=False, out_json=None) -> Dict:
    """Level sweep over all sequences (eval_stem_roi._eval_stem_roi parity)."""
    levels = DEFAULT_LEVELS if levels is None else levels
    results = {}
    for level in levels:
        per_seq = [
            eval_sequence_at_level(model_i, model_p, seq, level,
                                   entropy_estimation)
            for seq in dataset
        ]
        results[str(level)] = {
            k: float(np.mean([r[k] for r in per_seq]))
            for k in ("psnr", "ms-ssim", "bpp", "estimate_bpp")
        }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)
    return results


def eval_rc(model_i, model_p, dataset, levels: Optional[List[float]] = None,
            entropy_estimation=False) -> Dict:
    """Rate-control sweep at fractional uniform levels (eval_rc parity,
    eval_stem_roi.py:368-376)."""
    levels = RC_LEVELS if levels is None else levels
    return eval_levels(
        model_i, model_p, dataset, [l * 100 for l in levels],
        entropy_estimation,
    )


# ---------------------------------------------------------------------------
# single-rate pixel-domain baseline (eval_stem_baseline.py parity)
# ---------------------------------------------------------------------------


def inference_p_baseline(model_p, x, x_conditioned,
                         entropy_estimation=False) -> Dict:
    """P-frame through stem_baseline(v2): image-in / image-out, no Qmap."""
    x_padded, pads = pad_centered(jnp.asarray(x), 64)
    num_pixels = x.shape[1] * x.shape[2]
    fwd = model_p.forward(x_padded, x_conditioned)
    bpp_est = float(estimate_bpp(fwd["likelihoods"], num_pixels))
    if entropy_estimation:
        x_hat, bpp = fwd["x_hat"], bpp_est
    else:
        enc = model_p.compress(x_padded, x_conditioned)
        dec = model_p.decompress(enc["strings"], enc["shape"], x_conditioned)
        x_hat = dec["x_hat"]
        bpp = actual_bpp(enc["strings"], num_pixels)
    x_hat_c = crop_centered(jnp.asarray(x_hat), pads)
    return {
        "x_hat": x_hat,
        "psnr": float(psnr(jnp.asarray(x), x_hat_c)),
        "ms-ssim": ms_ssim_or_nan(jnp.asarray(x), x_hat_c),
        "bpp": bpp,
        "estimate_bpp": bpp_est,
    }


def eval_baseline_sequence(model_i, model_p, sequence,
                           entropy_estimation=False) -> Dict[str, float]:
    """GOP sequence through (image codec, stem_baseline) with a
    reconstruction carry (stem_roi/eval_stem_baseline.py:30-330 parity);
    ``model_i`` is a plain image codec (no Qmap)."""
    sums = {"psnr": 0.0, "ms-ssim": 0.0, "bpp": 0.0, "estimate_bpp": 0.0}
    n = 0
    x_conditioned = None
    for frame in sequence:
        x = frame.image[None]
        if frame.is_intra or x_conditioned is None:
            x_padded, pads = pad_centered(jnp.asarray(x), 64)
            num_pixels = x.shape[1] * x.shape[2]
            fwd = model_i.forward(x_padded)
            bpp_est = float(estimate_bpp(fwd["likelihoods"], num_pixels))
            if entropy_estimation:
                x_hat, bpp = fwd["x_hat"], bpp_est
            else:
                enc = model_i.compress(x_padded)
                dec = model_i.decompress(enc["strings"], enc["shape"])
                x_hat = dec["x_hat"]
                bpp = actual_bpp(enc["strings"], num_pixels)
            x_hat_c = crop_centered(jnp.asarray(x_hat), pads)
            out = {
                "x_hat": x_hat,
                "psnr": float(psnr(jnp.asarray(x), x_hat_c)),
                "ms-ssim": ms_ssim_or_nan(jnp.asarray(x), x_hat_c),
                "bpp": bpp,
                "estimate_bpp": bpp_est,
            }
        else:
            out = inference_p_baseline(model_p, x, x_conditioned,
                                       entropy_estimation)
        x_conditioned = out["x_hat"]
        for k in sums:
            sums[k] += out[k]
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()} | {"frames": n}
