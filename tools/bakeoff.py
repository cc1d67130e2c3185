"""Spatial-context bake-off + RD sweep through the REAL train/eval harness.

VERDICT r2 #1/#2: train, on the same data and I-models, the spatial-context
candidates — `res` (serial/wavefront SPM, the RD ceiling), tiled-`res` (same
weights, context resets at tile borders) and `charm` (channel-AR, G groups)
— next to the parallel `without_spm` serving baseline, then GOP-evaluate
every config with REAL entropy coding and publish one table of bpp/PSNR
deltas. The λ sweep additionally extends to low rates so at least one
trained model lands at the published operating range (≤ 0.2 bpp,
results/draw_stem_rdcurve.py:60-62) and its weights can run bench.py's real
serving pipeline.

Two subcommands so training can run on the TPU while evaluation runs on CPU
(remote jits compile in ~1 min; CPU eval jits compile in seconds):

  python tools/bakeoff.py train --workdir artifacts/bakeoff [--platform tpu]
  python tools/bakeoff.py eval  --workdir artifacts/bakeoff [--platform cpu]

Artifacts: WORKDIR/ckpt_*.pkl (+ the shared data tree), artifacts/bakeoff.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# model capacity (shared by every config; M must match the I-model's M)
N, M, EBC = 64, 96, 64
CROP = 128
LAMBDAS = [0.0003, 0.001, 0.004, 0.016]  # sweep (without_spm serving model)
LMB_BAKE = 0.004                          # bake-off rate point
BD_LAMBDAS = [0.001, 0.004, 0.016]        # charm-vs-res BD-rate grid
EVAL_HW = 256                             # GOP eval frames (latent 16×16)
TILES = [(4, 16), (4, 4), (2, 4), (1, 4), (1, 2)]  # tiled-res (th, tw)
CHARM_GROUPS = [4, 8]
# hero config (VERDICT r3 #5): production capacity, longer schedule — one
# checkpoint that serves at <=0.25 bpp with >=30 dB through the REAL 1080p
# pipeline (M matches the serving pipeline's 192)
HERO = dict(N=128, M=192, EBC=128, lmbda=0.008, i_steps=8000, p_steps=3000)


def _structured_frames(rng, n_frames=7, hw=(CROP, CROP), noise=0.0):
    """Compressible moving content: gradient background + moving blocks.
    Noise-free by default — round 2's σ=0.01 sensor noise put an
    incompressible-rate floor under every λ and kept the sweep pinned at
    0.6+ bpp."""
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([yy / h, xx / w, (xx + yy) / (h + w)], -1)
    base = 0.3 + 0.4 * base
    n_obj = rng.integers(2, 5)
    objs = []
    for _ in range(n_obj):
        objs.append({
            "pos": rng.uniform(8, min(h, w) - 24, 2),
            "vel": rng.uniform(-3, 3, 2),
            "size": rng.integers(10, 36, 2),
            "color": rng.uniform(0, 1, 3),
        })
    frames = []
    for t in range(n_frames):
        img = base.copy()
        for o in objs:
            y0 = int(np.clip(o["pos"][0] + t * o["vel"][0], 0, h - 1))
            x0 = int(np.clip(o["pos"][1] + t * o["vel"][1], 0, w - 1))
            img[y0:y0 + o["size"][0], x0:x0 + o["size"][1]] = o["color"]
        if noise:
            img = img + rng.normal(0, noise, img.shape)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return frames


def make_data(root, n_train_seqs=32, n_eval_seqs=2, eval_frames=24):
    """Vimeo-style train tree + ImageFolder tree + GOP eval dirs (written
    once under the workdir so the train and eval processes share bytes)."""
    from PIL import Image

    img_root = os.path.join(root, "images")
    seq_root = os.path.join(root, "vimeo")
    eval_root = os.path.join(root, "gop")
    if os.path.exists(os.path.join(seq_root, "sep_trainlist.txt")):
        return img_root, seq_root, eval_root

    rng = np.random.default_rng(0)
    img_train = os.path.join(img_root, "train")
    os.makedirs(img_train, exist_ok=True)
    names = []
    k = 0
    for i in range(n_train_seqs):
        frames = _structured_frames(rng)
        d = os.path.join(seq_root, "sequences", f"{i + 1:05d}", "0001")
        os.makedirs(d, exist_ok=True)
        for t, f in enumerate(frames, 1):
            Image.fromarray(f).save(os.path.join(d, f"im{t}.png"))
            if t <= 2:
                Image.fromarray(f).save(os.path.join(img_train,
                                                     f"img{k:04d}.png"))
                k += 1
        names.append(f"{i + 1:05d}/0001")
    with open(os.path.join(seq_root, "sep_trainlist.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(seq_root, "sep_testlist.txt"), "w") as f:
        f.write("\n".join(names[:2]) + "\n")

    rng_eval = np.random.default_rng(99)
    for i in range(n_eval_seqs):
        d = os.path.join(eval_root, f"seq{i}")
        os.makedirs(d, exist_ok=True)
        frames = _structured_frames(rng_eval, n_frames=eval_frames,
                                    hw=(EVAL_HW, EVAL_HW))
        for t, f in enumerate(frames, 1):
            Image.fromarray(f).save(os.path.join(d, f"f{t:05d}.png"))
    return img_root, seq_root, eval_root


def _maybe_gz(path):
    """Training writes plain .pkl; a compact .pkl.gz copy may be committed
    (artifacts/trained/) so trained-weights evidence survives container
    resets. Prefer the plain file, fall back to the .gz."""
    return path if os.path.exists(path) else path + ".gz"


def _i_ckpt(workdir, lmbda):
    return _maybe_gz(os.path.join(workdir, f"ckpt_i_{lmbda}.pkl"))


def _p_ckpt(workdir, name):
    return _maybe_gz(os.path.join(workdir, f"ckpt_p_{name}.pkl"))


def _train_i(lmbda, data_img, workdir, steps, init_path=None):
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.models import MeanScaleHyperprior
    from spatiotemporalentropymodel_tpu.training.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )
    from spatiotemporalentropymodel_tpu.training.train_image import train_image
    from spatiotemporalentropymodel_tpu.utils.config import TrainImageConfig

    path = _i_ckpt(workdir, lmbda)
    i_model = MeanScaleHyperprior(N, M)
    if os.path.exists(path):
        i_model.init(jnp.zeros((1, 64, 64, 3)))
        i_model.load_state_dict(load_checkpoint(path)["model"])
        return i_model
    if init_path:
        # Warm start (VERDICT r4 #6): fine-tune a converged higher-λ
        # I-model down-rate instead of training from scratch — the λ=0.012
        # from-scratch run converged to a 31.1 dB anchor at the 20k-step
        # schedule and the whole GOP point landed dominated.
        i_model.init(jnp.zeros((1, 64, 64, 3)))
        i_model.load_state_dict(load_checkpoint(init_path)["model"])
        print(f"I-model λ={lmbda}: warm start from {init_path}", flush=True)
    cfg = TrainImageConfig(
        model="mbt2018-mean", lmbda=lmbda, cropsize=CROP, batch_size=8,
        data_root=data_img, workdir=os.path.join(workdir, f"i_{lmbda}"),
        steps_per_epoch=steps, epochs=1, seed=1,
    )
    train_image(cfg, max_steps=steps, model=i_model)
    i_model.update(force=True)
    save_checkpoint({"model": i_model.state_dict()}, path)
    return i_model


def _train_p(name, module_or_variant, lmbda, i_model, data_vimeo, workdir,
             steps):
    import jax
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.training.checkpoints import (
        save_checkpoint,
    )
    from spatiotemporalentropymodel_tpu.training.train_stem import train_stem
    from spatiotemporalentropymodel_tpu.utils.config import TrainStemConfig

    path = _p_ckpt(workdir, name)
    if os.path.exists(path):
        return
    del lmbda  # P training is rate-only (EMLoss); λ enters via the I-model
    cfg = TrainStemConfig(
        variant=(module_or_variant if isinstance(module_or_variant, str)
                 else "without_spm"),
        in_channels=M, entropy_bottleneck_channels=EBC,
        data_root=data_vimeo, cropsize=CROP, batch_size=4,
        step_mode="per_sequence", eval_every=max(steps // 3, 1),
        workdir=os.path.join(workdir, f"p_{name}"), seed=1,
    )
    module = None if isinstance(module_or_variant, str) else module_or_variant
    state, _ = train_stem(cfg, max_steps=steps, i_model=i_model,
                          module=module)
    params = jax.device_get(state.params)
    save_checkpoint({"params": params}, path)
    print(f"trained {name}", flush=True)
    del jnp


def cmd_train(args):
    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    data_img, data_vimeo, _ = make_data(os.path.join(workdir, "data"))

    from spatiotemporalentropymodel_tpu.models.charm import (
        ChannelARSTEMModule,
    )

    for lmbda in LAMBDAS:
        i_model = _train_i(lmbda, data_img, workdir, args.i_steps)
        print(f"I-model λ={lmbda} ready", flush=True)
        _train_p(f"without_spm_{lmbda}", "without_spm", lmbda, i_model,
                 data_vimeo, workdir, args.p_steps)

    i_bake = _train_i(LMB_BAKE, data_img, workdir, args.i_steps)
    _train_p(f"res_{LMB_BAKE}", "res", LMB_BAKE, i_bake, data_vimeo, workdir,
             args.p_steps)
    for g in CHARM_GROUPS:
        _train_p(
            f"charm{g}_{LMB_BAKE}",
            ChannelARSTEMModule(g, EBC, M, residual=True, lrp=True),
            LMB_BAKE, i_bake, data_vimeo, workdir, args.p_steps,
        )

    # BD-rate grid (VERDICT r3 #3): res and charm at >=3 shared rate points
    g_bd = CHARM_GROUPS[0]
    for lmbda in BD_LAMBDAS:
        i_model = _train_i(lmbda, data_img, workdir, args.i_steps)
        _train_p(f"res_{lmbda}", "res", lmbda, i_model, data_vimeo, workdir,
                 args.p_steps)
        _train_p(
            f"charm{g_bd}_{lmbda}",
            ChannelARSTEMModule(g_bd, EBC, M, residual=True, lrp=True),
            lmbda, i_model, data_vimeo, workdir, args.p_steps,
        )
    print("training complete", flush=True)


def _load_i(workdir, lmbda):
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.models import MeanScaleHyperprior
    from spatiotemporalentropymodel_tpu.training.checkpoints import (
        load_checkpoint,
    )

    i_model = MeanScaleHyperprior(N, M)
    i_model.init(jnp.zeros((1, 64, 64, 3)))
    i_model.load_state_dict(load_checkpoint(_i_ckpt(workdir, lmbda))["model"])
    i_model.update(force=True)
    return i_model


def _load_p(workdir, name, ctor):
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.training.checkpoints import (
        load_checkpoint,
    )

    stem = ctor()
    d = jnp.zeros((1, 4, 4, M))
    stem.init(d, d)
    import jax

    stem.params = jax.tree_util.tree_map(
        jnp.asarray, load_checkpoint(_p_ckpt(workdir, name))["params"]
    )
    stem.update(force=True)
    return stem


def _eval_cfg(i_model, stem, data_gop, gop=12):
    from spatiotemporalentropymodel_tpu.data import GOPDataset
    from spatiotemporalentropymodel_tpu.eval.eval_stem import eval_dataset

    res = eval_dataset(i_model, stem, GOPDataset(data_gop, gop_size=gop),
                       compute_msssim=False, report_estimated_bpp=True)
    avg = res["average"]
    return {"bpp": avg["bpp"], "psnr": avg["psnr"],
            "bpp_est": avg["bpp_est"]}


def bd_rate(anchor, test):
    """Bjøntegaard delta-rate (%) of ``test`` vs ``anchor``.

    anchor/test: lists of (bpp, psnr). Cubic fit of log-rate as a function
    of PSNR, integrated over the overlapping PSNR interval (the standard
    BD-rate recipe, VCEG-M33). Positive = test needs more rate."""
    import numpy as _np

    def fit(points):
        pts = sorted(points, key=lambda p: p[1])
        r = _np.log([p[0] for p in pts])
        d = _np.array([p[1] for p in pts])
        deg = min(3, len(pts) - 1)
        return _np.polyfit(d, r, deg), d.min(), d.max()

    pa, lo_a, hi_a = fit(anchor)
    pt, lo_t, hi_t = fit(test)
    lo, hi = max(lo_a, lo_t), min(hi_a, hi_t)
    if hi <= lo:
        return None
    ia = _np.polyint(pa)
    it = _np.polyint(pt)
    avg_a = (_np.polyval(ia, hi) - _np.polyval(ia, lo)) / (hi - lo)
    avg_t = (_np.polyval(it, hi) - _np.polyval(it, lo)) / (hi - lo)
    return float((_np.exp(avg_t - avg_a) - 1.0) * 100.0)


def cmd_eval(args):
    workdir = os.path.abspath(args.workdir)
    _, _, data_gop = make_data(os.path.join(workdir, "data"))

    from spatiotemporalentropymodel_tpu.models import (
        SpatioTemporalPriorModel,
        SpatioTemporalPriorModelChannelAR,
    )

    out = {"sweep": [], "bakeoff": {}}

    for lmbda in LAMBDAS:
        name = f"without_spm_{lmbda}"
        if not os.path.exists(_p_ckpt(workdir, name)):
            print(f"skip {name} (not trained)", flush=True)
            continue
        i_model = _load_i(workdir, lmbda)
        stem = _load_p(workdir, name, lambda: SpatioTemporalPriorModel(
            variant="without_spm", entropy_bottleneck_channels=EBC,
            in_channels=M))
        pt = {"lmbda": lmbda} | _eval_cfg(i_model, stem, data_gop)
        out["sweep"].append(pt)
        print("sweep point:", pt, flush=True)

    i_bake = _load_i(workdir, LMB_BAKE)

    def stem_res(tile=None):
        return _load_p(workdir, f"res_{LMB_BAKE}",
                       lambda: SpatioTemporalPriorModel(
                           variant="res", entropy_bottleneck_channels=EBC,
                           in_channels=M, wavefront_tile=tile))

    if os.path.exists(_p_ckpt(workdir, f"res_{LMB_BAKE}")):
        out["bakeoff"]["res"] = _eval_cfg(i_bake, stem_res(), data_gop)
        print("bakeoff res:", out["bakeoff"]["res"], flush=True)
        for tile in TILES:
            key = f"res_tiled_{tile[0]}x{tile[1]}"
            try:
                out["bakeoff"][key] = _eval_cfg(i_bake, stem_res(tile),
                                                data_gop)
                print(f"bakeoff {key}:", out["bakeoff"][key], flush=True)
            except Exception as e:  # one bad tile must not kill the sweep
                print(f"bakeoff {key} FAILED: {e!r}", flush=True)
    for g in CHARM_GROUPS:
        name = f"charm{g}_{LMB_BAKE}"
        if not os.path.exists(_p_ckpt(workdir, name)):
            continue
        stem = _load_p(workdir, name,
                       lambda: SpatioTemporalPriorModelChannelAR(
                           groups=g, entropy_bottleneck_channels=EBC,
                           in_channels=M, lrp=True))
        out["bakeoff"][f"charm_g{g}"] = _eval_cfg(i_bake, stem, data_gop)
        print(f"bakeoff charm_g{g}:", out["bakeoff"][f"charm_g{g}"],
              flush=True)
    name = f"without_spm_{LMB_BAKE}"
    if os.path.exists(_p_ckpt(workdir, name)):
        stem = _load_p(workdir, name, lambda: SpatioTemporalPriorModel(
            variant="without_spm", entropy_bottleneck_channels=EBC,
            in_channels=M))
        out["bakeoff"]["without_spm"] = _eval_cfg(i_bake, stem, data_gop)
        print("bakeoff without_spm:", out["bakeoff"]["without_spm"],
              flush=True)

    # charm-vs-res BD-rate over the shared λ grid (VERDICT r3 #3)
    g_bd = CHARM_GROUPS[0]
    bd = {"lambdas": [], "res": [], f"charm_g{g_bd}": []}
    for lmbda in BD_LAMBDAS:
        nr, nc = f"res_{lmbda}", f"charm{g_bd}_{lmbda}"
        if not (os.path.exists(_p_ckpt(workdir, nr))
                and os.path.exists(_p_ckpt(workdir, nc))):
            continue
        i_model = _load_i(workdir, lmbda)
        res_m = _load_p(workdir, nr, lambda: SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M))
        charm_m = _load_p(
            workdir, nc, lambda: SpatioTemporalPriorModelChannelAR(
                groups=g_bd, entropy_bottleneck_channels=EBC,
                in_channels=M, lrp=True))
        er = _eval_cfg(i_model, res_m, data_gop)
        ec = _eval_cfg(i_model, charm_m, data_gop)
        bd["lambdas"].append(lmbda)
        bd["res"].append(er)
        bd[f"charm_g{g_bd}"].append(ec)
        print(f"bd λ={lmbda}: res={er} charm={ec}", flush=True)
    if len(bd["lambdas"]) >= 3:
        pts_r = [(p["bpp"], p["psnr"]) for p in bd["res"]]
        pts_c = [(p["bpp"], p["psnr"]) for p in bd[f"charm_g{g_bd}"]]
        bd["bd_rate_charm_vs_res_pct"] = bd_rate(pts_r, pts_c)
        bd["coding_gap_pct"] = {
            "res": [round(100 * (p["bpp"] / p["bpp_est"] - 1), 1)
                    for p in bd["res"]],
            f"charm_g{g_bd}": [round(100 * (p["bpp"] / p["bpp_est"] - 1), 1)
                               for p in bd[f"charm_g{g_bd}"]],
        }
        print("BD-rate charm vs res:",
              bd["bd_rate_charm_vs_res_pct"], "%", flush=True)
    if bd["lambdas"]:
        out["bd"] = bd

    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, "bakeoff.json")
    # carry forward sections a partial run didn't recompute (e.g. the λ
    # sweep from a previous full run), marked so readers can tell
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f).get("results", {})
            have = {p["lmbda"] for p in out["sweep"]}
            for p in prev.get("sweep", []):
                if p["lmbda"] not in have:
                    out["sweep"].append({**p, "carried": True})
            out["sweep"].sort(key=lambda p: p["lmbda"])
            for k, v in prev.get("bakeoff", {}).items():
                out["bakeoff"].setdefault(k, {**v, "carried": True})
        except Exception as e:  # pragma: no cover
            print("carry-forward skipped:", e, flush=True)
    with open(path, "w") as f:
        json.dump({
            "config": {"N": N, "M": M, "EBC": EBC, "crop": CROP,
                       "eval_hw": EVAL_HW, "gop": 12,
                       "i_steps": args.i_steps, "p_steps": args.p_steps,
                       "lambda_bakeoff": LMB_BAKE},
            "results": out,
        }, f, indent=2)
    print("wrote", path, flush=True)


def _make_gop_set(data_root, hw, n_seqs=2, n_frames=24, seed=98):
    """A GOP eval dir at an arbitrary resolution (the 256² set comes from
    make_data; hero runs also want >=512² — VERDICT r4 #6)."""
    from PIL import Image

    root = os.path.join(data_root, f"gop{hw}")
    if os.path.exists(root):
        return root
    rng = np.random.default_rng(seed)
    for i in range(n_seqs):
        d = os.path.join(root, f"seq{i}")
        os.makedirs(d, exist_ok=True)
        for t, f in enumerate(
                _structured_frames(rng, n_frames=n_frames, hw=(hw, hw)), 1):
            Image.fromarray(f).save(os.path.join(d, f"f{t:05d}.png"))
    return root


def _serving_1080p(i_model, stem, n_frames=4):
    """P-frame serving rate/quality through the REAL 1080p pipeline (the
    probe bench.py::run_trained_weights uses, factored here so every hero
    RD point records its serving bpp — VERDICT r4 #6)."""
    import jax
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.eval.metrics import psnr as _psnr
    from spatiotemporalentropymodel_tpu.eval.pipeline import StemVideoPipeline

    H, W = 1088, 1920
    pipe = StemVideoPipeline(i_model, stem, transport_mode="sparse")
    rng = np.random.default_rng(1)
    frames = [jnp.asarray(f, jnp.float32)[None] / 255.0
              for f in _structured_frames(rng, n_frames=n_frames,
                                          hw=(H, W))]
    enc0 = i_model.compress(frames[0])
    dec0 = i_model.decompress(enc0["strings"], tuple(enc0["shape"]))
    yc = dec0["y_hat"]
    total_bytes, psnrs = 0, []
    for t in range(1, n_frames):
        enc, _ = pipe.encode_frame(frames[t], yc)
        x_hat, yc = pipe.decode_frame(enc, y_cond=yc)
        total_bytes += sum(
            len(s) for grp in enc["strings"] for s in grp
        ) + np.asarray(enc.get("counts", np.empty(0))).nbytes
        psnrs.append(float(_psnr(frames[t], x_hat)))
    jax.block_until_ready(yc)
    return {"bpp": round(total_bytes * 8.0 / ((n_frames - 1) * H * W), 4),
            "psnr": round(float(np.mean(psnrs)), 2)}


def cmd_hero(args):
    """Production-capacity single-config run (VERDICT r3 #5): train an
    M=192 res pipeline long enough to serve at <=0.25 bpp / >=30 dB on the
    GOP eval set, then gzip the checkpoints under artifacts/trained/hero/
    (with a hero.json sidecar) for bench.py's trained_weights section."""
    global N, M, EBC
    N, M, EBC = HERO["N"], HERO["M"], HERO["EBC"]
    if args.workdir == "artifacts/bakeoff":  # don't mix capacities
        args.workdir = "artifacts/hero"
    lmbda = args.hero_lmbda
    i_steps = args.i_steps if args.i_steps != 3000 else HERO["i_steps"]
    p_steps = args.p_steps if args.p_steps != 1500 else HERO["p_steps"]

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    # Hero capacity (N=128/M=192) memorizes the default 32-seq/64-image
    # tree: the λ=0.02 run measured 0.154 bpp TRAIN vs 3.27 bpp on unseen
    # frames (y-stream, not tables — artifacts/hero probe). Production-
    # capacity runs need a production-sized synthetic corpus.
    data_img, data_vimeo, data_gop = make_data(
        os.path.join(workdir, "data"), n_train_seqs=args.train_seqs)

    from spatiotemporalentropymodel_tpu.models import SpatioTemporalPriorModel

    i_model = _train_i(lmbda, data_img, workdir, i_steps,
                       init_path=args.i_init)
    print(f"hero I-model λ={lmbda} ready", flush=True)
    # Standalone I-model eval — the P-frame PSNR CEILING (P training is
    # rate-only; reconstruction quality rides the frozen I transforms, so a
    # weak number here means a longer i_steps schedule, not more p_steps).
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.eval.metrics import (
        actual_bpp,
        psnr as _psnr,
    )

    rng_i = np.random.default_rng(7)
    vals = []
    for _ in range(3):
        fr = _structured_frames(rng_i, n_frames=1, hw=(EVAL_HW, EVAL_HW))[0]
        x = jnp.asarray(fr, jnp.float32)[None] / 255.0
        enc = i_model.compress(x)
        dec = i_model.decompress(enc["strings"], tuple(enc["shape"]))
        vals.append((actual_bpp(enc["strings"], EVAL_HW * EVAL_HW),
                     float(_psnr(x, dec["x_hat"]))))
    i_eval = {"bpp": round(float(np.mean([v[0] for v in vals])), 4),
              "psnr": round(float(np.mean([v[1] for v in vals])), 3)}
    print(f"hero I-model standalone eval: {i_eval}", flush=True)
    # res = the RD point (flagship family); without_spm = the parallel
    # serving pipeline's model (StemVideoPipeline drives non-SPM variants)
    _train_p(f"res_{lmbda}", "res", lmbda, i_model, data_vimeo, workdir,
             p_steps)
    variants = ("res",) if args.res_only else ("res", "without_spm")
    if not args.res_only:
        _train_p(f"without_spm_{lmbda}", "without_spm", lmbda, i_model,
                 data_vimeo, workdir, p_steps)

    evals = {}
    evals_hi = {}
    serving = None
    for variant in variants:
        stem = _load_p(workdir, f"{variant}_{lmbda}",
                       lambda: SpatioTemporalPriorModel(
                           variant=variant, entropy_bottleneck_channels=EBC,
                           in_channels=M))
        evals[variant] = _eval_cfg(i_model, stem, data_gop)
        print(f"hero eval {variant}:", evals[variant], flush=True)
        if args.eval_hw_extra:
            # VERDICT r4 #6: evaluate at >=512² GOP-12 alongside 256² —
            # the eval→serving rate gap is resolution-dependent
            gop_hi = _make_gop_set(os.path.join(workdir, "data"),
                                   args.eval_hw_extra)
            evals_hi[variant] = _eval_cfg(i_model, stem, gop_hi)
            print(f"hero eval {variant} @{args.eval_hw_extra}:",
                  evals_hi[variant], flush=True)
        if variant == "without_spm":
            # per-point 1080p SERVING rate (VERDICT r4 #6): the same probe
            # bench.py's trained_weights section runs, so every RD point
            # carries its real-pipeline rate, not only the headline λ.
            # TPU-only: the 1080p transforms take tens of minutes on the
            # one-core CPU smoke path.
            import jax as _jax
            if _jax.default_backend() == "tpu":
                serving = _serving_1080p(i_model, stem)
                print(f"hero serving 1080p λ={lmbda}:", serving, flush=True)

    import gzip
    import shutil

    os.makedirs(args.out_dir, exist_ok=True)
    trained = os.path.join(args.out_dir, "trained", "hero")
    os.makedirs(trained, exist_ok=True)
    meta = {"config": {**HERO, "lmbda": lmbda, "crop": CROP,
                       "eval_hw": EVAL_HW, "i_steps": i_steps,
                       "p_steps": p_steps, "train_seqs": args.train_seqs},
            "i_model_standalone": i_eval,
            "eval": evals}
    if evals_hi:
        meta[f"eval_{args.eval_hw_extra}"] = evals_hi
    if serving:
        meta["serving_1080p"] = serving
    # Merge with any existing curated hero.json instead of clobbering it
    # (the λ=0.012 run once erased the RD-curve block and replaced a
    # 0.245 bpp/34.5 dB headline with a dominated 0.387/31.6 point).
    # Policy: rd_points accumulates every measured λ (same-λ re-runs
    # replace); the headline (config/i_model_standalone/eval) and the
    # committed checkpoints only move when the new `res` point is NOT
    # RD-dominated by the current headline.
    prev, prev_path = None, os.path.join(trained, "hero.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
    new_pt = {"lmbda": lmbda,
              "bpp": round(evals["res"]["bpp"], 4),
              "psnr": round(evals["res"]["psnr"], 2)}
    if evals_hi:
        new_pt[f"bpp_{args.eval_hw_extra}"] = round(
            evals_hi["res"]["bpp"], 4)
        new_pt[f"psnr_{args.eval_hw_extra}"] = round(
            evals_hi["res"]["psnr"], 2)
    if serving:
        new_pt["serving_1080p"] = serving
    rd = (prev or {}).get("rd_points") or {"res": []}
    rd["res"] = [p for p in rd.get("res", []) if p["lmbda"] != lmbda]
    dominated = False
    if prev is not None and "res" in prev.get("eval", {}):
        old = prev["eval"]["res"]
        dominated = (new_pt["bpp"] >= old["bpp"] - 1e-9
                     and new_pt["psnr"] <= old["psnr"] + 1e-9)
    if dominated:
        new_pt["dominated"] = True
    rd["res"].append(new_pt)
    rd["res"].sort(key=lambda p: p["lmbda"])
    keep_headline = (dominated or args.no_archive) and prev is not None
    out = dict(prev) if keep_headline else meta
    out["rd_points"] = rd
    if keep_headline:
        why = ("--no-archive run (RD-curve extension)" if args.no_archive
               else f"dominated by the current headline "
                    f"{prev['eval']['res']}")
        print(f"λ={lmbda} point {new_pt}: {why}; keeping old headline and "
              "checkpoints, recording the point only", flush=True)
    else:
        for src in (f"ckpt_i_{lmbda}.pkl", f"ckpt_p_res_{lmbda}.pkl",
                    f"ckpt_p_without_spm_{lmbda}.pkl"):
            sp = _maybe_gz(os.path.join(workdir, src))
            dst = os.path.join(trained, src + ".gz")
            if sp == dst:  # workdir IS the trained dir (re-eval runs)
                continue
            if sp.endswith(".gz"):  # fresh runs save via _maybe_gz names
                shutil.copyfile(sp, dst)
            else:
                with open(sp, "rb") as fi, gzip.open(dst, "wb") as fo:
                    shutil.copyfileobj(fi, fo)
        # keep only the headline λ's triple in git (VERDICT r4 #8: the
        # trained artifacts stay under the 150 MB cap; superseded points
        # keep their numbers in rd_points, not their weights)
        import glob as _glob
        for p in _glob.glob(os.path.join(trained, "ckpt_*.pkl.gz")):
            tag = os.path.basename(p).rsplit("_", 1)[-1][:-len(".pkl.gz")]
            if tag != str(lmbda):
                os.remove(p)
                print(f"pruned superseded checkpoint {p}", flush=True)
    with open(prev_path, "w") as f:
        json.dump(out, f, indent=2)
    path = os.path.join(args.out_dir, "hero.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, "and", trained, flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cname, fn in (("train", cmd_train), ("eval", cmd_eval),
                      ("hero", cmd_hero)):
        p = sub.add_parser(cname)
        p.add_argument("--workdir", default="artifacts/bakeoff")
        p.add_argument("--i-steps", type=int, default=3000)
        p.add_argument("--p-steps", type=int, default=1500)
        p.add_argument("--out-dir", default="artifacts")
        p.add_argument("--platform", default=None,
                       choices=(None, "cpu", "tpu"))
        p.add_argument("--lambdas", type=float, nargs="+", default=None,
                       help="override the λ sweep grid (smoke tests)")
        p.add_argument("--charm-groups", type=int, nargs="+", default=None)
        p.add_argument("--bd-lambdas", type=float, nargs="+", default=None,
                       help="override the charm-vs-res BD-rate grid")
        p.add_argument("--hero-lmbda", type=float, default=HERO["lmbda"])
        p.add_argument("--i-init", default=None,
                       help="warm-start the I-model from this checkpoint "
                            "(.pkl/.pkl.gz) — the low-rate RD recipe")
        p.add_argument("--eval-hw-extra", type=int, default=0,
                       help="also GOP-eval at this resolution (e.g. 512)")
        p.add_argument("--no-archive", action="store_true",
                       help="record the RD point (+512² eval, serving bpp) "
                            "in hero.json but never touch the committed "
                            "trained/ checkpoints — the low-rate curve-"
                            "extension mode (the serving headline pair "
                            "stays the λ=0.015 triple; trained/ holds ONE "
                            "triple under the 150 MB cap)")
        p.add_argument("--res-only", action="store_true",
                       help="curve-extension fast path: train/eval only the "
                            "flagship `res` P-model (skips the without_spm "
                            "twin and the 1080p serving probe, which rides "
                            "the non-SPM pipeline) — for low-rate RD points "
                            "that must fit a round's remaining budget")
        p.add_argument("--train-seqs", type=int, default=32,
                       help="synthetic training sequences (hero runs want "
                            "hundreds: 32 seqs overfit at N=128 capacity)")
        p.set_defaults(fn=fn)
    args = ap.parse_args()

    global LAMBDAS, LMB_BAKE, CHARM_GROUPS, BD_LAMBDAS
    if args.lambdas:
        LAMBDAS = list(args.lambdas)
        LMB_BAKE = LAMBDAS[-1]
        BD_LAMBDAS = LAMBDAS  # keep smoke runs inside the override grid
    if args.bd_lambdas:
        BD_LAMBDAS = list(args.bd_lambdas)
    if args.charm_groups:
        CHARM_GROUPS = list(args.charm_groups)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
