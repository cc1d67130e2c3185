"""Miniature end-to-end RD sweep through the REAL training harness.

VERDICT r1 #6: run the actual pipelines — train_image (λ·255²·MSE + bpp,
main/aux split) for the frozen I-model at 3 λs, then train_stem (frozen
I-model, EMLoss, plateau-LR harness) on its latents — on structured synthetic
video, then GOP-evaluate with REAL entropy coding (eval/eval_stem.py) and
plot the resulting (bpp, PSNR) points against the published baselines
(eval/rd_data.py). Artifacts: artifacts/rd_sweep.{json,png}.

Everything is CPU-sized (small nets, 64×64 crops) — the point is evidence
that the full train→eval→code path improves RD monotonically, not SOTA.

Usage: python tools/train_rd_sweep.py [--i-steps 400] [--p-steps 250]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _structured_frames(rng, n_frames=7, hw=(128, 128)):
    """Compressible moving content: gradient background + moving blocks."""
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([yy / h, xx / w, (xx + yy) / (h + w)], -1)
    base = 0.3 + 0.4 * base
    n_obj = rng.integers(2, 4)
    objs = []
    for _ in range(n_obj):
        objs.append({
            "pos": rng.uniform(8, min(h, w) - 24, 2),
            "vel": rng.uniform(-3, 3, 2),
            "size": rng.integers(10, 28, 2),
            "color": rng.uniform(0, 1, 3),
        })
    frames = []
    for t in range(n_frames):
        img = base.copy()
        for o in objs:
            y0 = int(np.clip(o["pos"][0] + t * o["vel"][0], 0, h - 1))
            x0 = int(np.clip(o["pos"][1] + t * o["vel"][1], 0, w - 1))
            img[y0:y0 + o["size"][0], x0:x0 + o["size"][1]] = o["color"]
        img = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)
        frames.append((img * 255).astype(np.uint8))
    return frames


def make_data(root: str, n_train_seqs=24, n_eval_seqs=2, eval_frames=12):
    """Vimeo-style train tree + ImageFolder tree + GOP eval dirs."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img_train = os.path.join(root, "images", "train")
    os.makedirs(img_train, exist_ok=True)
    seq_root = os.path.join(root, "vimeo")
    names = []
    k = 0
    for i in range(n_train_seqs):
        frames = _structured_frames(rng)
        d = os.path.join(seq_root, "sequences", f"{i + 1:05d}", "0001")
        os.makedirs(d, exist_ok=True)
        for t, f in enumerate(frames, 1):
            Image.fromarray(f).save(os.path.join(d, f"im{t}.png"))
            if t <= 2:  # subset into the image-training folder
                Image.fromarray(f).save(
                    os.path.join(img_train, f"img{k:04d}.png")
                )
                k += 1
        names.append(f"{i + 1:05d}/0001")
    with open(os.path.join(seq_root, "sep_trainlist.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(seq_root, "sep_testlist.txt"), "w") as f:
        f.write("\n".join(names[:2]) + "\n")

    eval_root = os.path.join(root, "gop")
    rng_eval = np.random.default_rng(99)
    for i in range(n_eval_seqs):
        d = os.path.join(eval_root, f"seq{i}")
        os.makedirs(d, exist_ok=True)
        frames = _structured_frames(rng_eval, n_frames=eval_frames)
        for t, f in enumerate(frames, 1):
            Image.fromarray(f).save(os.path.join(d, f"f{t:05d}.png"))
    return os.path.join(root, "images"), seq_root, eval_root


def run_point(lmbda, data_img, data_vimeo, data_gop, workdir, i_steps,
              p_steps):
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.data import GOPDataset
    from spatiotemporalentropymodel_tpu.eval.eval_stem import eval_dataset
    from spatiotemporalentropymodel_tpu.models import (
        MeanScaleHyperprior,
        SpatioTemporalPriorModel,
    )
    from spatiotemporalentropymodel_tpu.training.train_image import train_image
    from spatiotemporalentropymodel_tpu.training.train_stem import train_stem
    from spatiotemporalentropymodel_tpu.utils.config import (
        TrainImageConfig,
        TrainStemConfig,
    )

    N, M, EBC = 48, 64, 48

    i_model = MeanScaleHyperprior(N, M)
    cfg_i = TrainImageConfig(
        model="mbt2018-mean", lmbda=lmbda, cropsize=64, batch_size=8,
        data_root=data_img, workdir=os.path.join(workdir, "i"),
        steps_per_epoch=i_steps, epochs=1, seed=1,
    )
    train_image(cfg_i, max_steps=i_steps, model=i_model)

    cfg_p = TrainStemConfig(
        variant="without_spm", in_channels=M, entropy_bottleneck_channels=EBC,
        data_root=data_vimeo, cropsize=64, batch_size=4,
        step_mode="per_sequence", eval_every=max(p_steps // 2, 1),
        workdir=os.path.join(workdir, "p"), seed=1,
    )
    state, _ = train_stem(cfg_p, max_steps=p_steps, i_model=i_model)

    stem = SpatioTemporalPriorModel(
        variant="without_spm", in_channels=M,
        entropy_bottleneck_channels=EBC,
    )
    d = jnp.zeros((1, 4, 4, M))
    stem.init(d, d)
    import jax

    stem.params = jax.device_get(state.params)
    stem.update(force=True)
    i_model.update(force=True)

    dataset = GOPDataset(data_gop, gop_size=6)
    res = eval_dataset(i_model, stem, dataset, compute_msssim=False)
    avg = res["average"]
    return {"lmbda": lmbda, "bpp": avg["bpp"], "psnr": avg["psnr"],
            "bpp_est": avg["bpp_est"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--i-steps", type=int, default=400)
    ap.add_argument("--p-steps", type=int, default=250)
    ap.add_argument("--lmbdas", type=float, nargs="+",
                    default=[0.003, 0.015, 0.08])
    ap.add_argument("--out-dir", default="artifacts")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out_dir, exist_ok=True)
    points = []
    with tempfile.TemporaryDirectory() as root:
        data_img, data_vimeo, data_gop = make_data(root)
        for lmbda in args.lmbdas:
            wd = os.path.join(root, f"run_{lmbda}")
            pt = run_point(lmbda, data_img, data_vimeo, data_gop, wd,
                           args.i_steps, args.p_steps)
            points.append(pt)
            print("point:", pt, flush=True)

    result = {
        "name": "stem-tpu mini sweep (synthetic, CPU-sized)",
        "description": f"train_image {args.i_steps} steps + train_stem "
                       f"{args.p_steps} steps per λ; real entropy coding",
        "results": {
            "lambda": [p["lmbda"] for p in points],
            "bpp": [p["bpp"] for p in points],
            "psnr": [p["psnr"] for p in points],
            "bpp_est": [p["bpp_est"] for p in points],
        },
    }
    json_path = os.path.join(args.out_dir, "rd_sweep.json")
    with open(json_path, "w") as f:
        json.dump(result, f, indent=2)

    # plot against the published baselines for context
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from spatiotemporalentropymodel_tpu.eval.rd_data import UVG

        fig, ax = plt.subplots(figsize=(6, 4.5))
        for name, series in UVG.items():
            ax.plot(series["bpp"], series["psnr"], "--", alpha=0.4,
                    label=f"{name} (UVG, published)")
        ax.plot(result["results"]["bpp"], result["results"]["psnr"], "o-",
                color="black", label="this run (synthetic mini sweep)")
        ax.set_xlabel("bpp")
        ax.set_ylabel("PSNR (dB)")
        ax.legend(fontsize=7)
        ax.set_title("Mini RD sweep through the real train/eval harness")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "rd_sweep.png"), dpi=120)
    except Exception as e:  # matplotlib absent → JSON artifact still lands
        print("plot skipped:", e)

    # monotone RD check: more rate ⇒ more quality
    bpp = result["results"]["bpp"]
    psnr = result["results"]["psnr"]
    order = np.argsort(bpp)
    mono = all(
        psnr[order[i]] <= psnr[order[i + 1]] + 1e-6
        for i in range(len(order) - 1)
    )
    print(json.dumps({"points": points, "monotone_rd": bool(mono)}))


if __name__ == "__main__":
    main()
