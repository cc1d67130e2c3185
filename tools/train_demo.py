"""End-to-end training demonstration on real hardware.

Trains a small MeanScaleHyperprior on structured synthetic images (gradients +
discs + texture) for a few hundred steps and reports the RD trajectory plus a
real-codec round-trip before/after — evidence that the loss, optimizer split,
noise quantization, CDF update and bitstream path compose correctly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from spatiotemporalentropymodel_tpu.eval.metrics import actual_bpp, psnr
from spatiotemporalentropymodel_tpu.models import MeanScaleHyperprior
from spatiotemporalentropymodel_tpu.parallel import (
    init_train_state,
    make_image_train_step,
)
from spatiotemporalentropymodel_tpu.training import configure_optimizers

SIZE = 128
BATCH = 8
STEPS = int(os.environ.get("STEM_DEMO_STEPS", 400))


def batch_images(rng: np.random.Generator, n: int) -> np.ndarray:
    """Structured content: random gradients + discs + mild texture."""
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    out = np.empty((n, SIZE, SIZE, 3), np.float32)
    for i in range(n):
        a, b = rng.normal(size=2) / SIZE
        base = (a * xx + b * yy) % 1.0
        img = np.stack([base, (base + 0.33) % 1.0, (base + 0.66) % 1.0], -1)
        for _ in range(rng.integers(1, 4)):
            cx, cy, r = rng.uniform(0, SIZE, 2).tolist() + [rng.uniform(8, 32)]
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r**2
            img[mask] = rng.uniform(0, 1, 3)
        img += 0.02 * rng.standard_normal(img.shape)
        out[i] = np.clip(img, 0, 1)
    return out


def roundtrip_metrics(model, x_eval) -> dict:
    model.update(force=True)
    enc = model.compress(x_eval)
    dec = model.decompress(enc["strings"], enc["shape"])
    return {
        "psnr": float(psnr(x_eval, dec["x_hat"])),
        "bpp": actual_bpp(enc["strings"], x_eval.shape[0] * SIZE * SIZE),
    }


def main():
    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)

    model = MeanScaleHyperprior(64, 96)
    x_eval = jnp.asarray(batch_images(rng_np, 2))
    model.init(x_eval)

    before = roundtrip_metrics(model, x_eval)
    print(f"before training: psnr={before['psnr']:.2f} dB  "
          f"bpp={before['bpp']:.3f}")

    optimizers = configure_optimizers(model.params, 1e-4, 1e-3)
    step = jax.jit(make_image_train_step(model.module, optimizers,
                                         lmbda=0.01))
    state = init_train_state(model.params, optimizers)

    t0 = time.time()
    for it in range(1, STEPS + 1):
        batch = jnp.asarray(batch_images(rng_np, BATCH))
        rng, k = jax.random.split(rng)
        state, metrics = step(state, batch, k)
        if it % 50 == 0 or it == 1:
            print(
                f"step {it:4d}: loss={float(metrics['loss']):8.4f} "
                f"bpp={float(metrics['bpp_loss']):7.4f} "
                f"mse={float(metrics['mse_loss']):.6f} "
                f"aux={float(metrics['aux_loss']):9.2f}"
            )
    print(f"trained {STEPS} steps in {time.time() - t0:.1f}s")

    model.params = state.params
    after = roundtrip_metrics(model, x_eval)
    print(f"after training:  psnr={after['psnr']:.2f} dB  "
          f"bpp={after['bpp']:.3f}")
    print(
        "improvement: "
        f"{after['psnr'] - before['psnr']:+.2f} dB at "
        f"{after['bpp'] - before['bpp']:+.3f} bpp"
    )


if __name__ == "__main__":
    main()
