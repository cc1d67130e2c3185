"""File-level GOP video codec with a real bitstream container (.stemv).

Beyond-reference capability: the reference ships a file codec for *images*
only (compressai_examples/codec.py:92-220); its video evaluation keeps
streams in memory (stem/evalSTEM.py:93-153). This tool closes the serving
loop — PNG frames → ONE .stemv file → decoded PNGs — with I-frames through
the image codec and P-frames through the streaming sparse-transport pipeline
(eval/pipeline.py), whose containers carry the CDF-row counts so file decode
is fetch-free.

Container format v2 (big-endian, mirroring codec.py's conventions):

  magic  b"STMV", u8 version
  u8 i_model_id, u8 i_quality, u8 stem_variant_id, u16 stem_channels
                      (decode rebuilds the exact model pair — same idea as
                       the image codec's 2-byte header, codec.py:92-117)
  u8 gop, u32 n_frames, u32 h, u32 w          (original size, pre-×64-pad)
  per frame:
    u8 ftype            0 = I, 1 = P sparse, 2 = P dense (int8 overflow)
    u16 zh, u16 zw      hyper-latent spatial shape
    ftype 1 only: u16 levels, levels × u32 CDF-row counts
    u32 y_len, y bytes, u32 z_len, z bytes

Usage:
  python -m spatiotemporalentropymodel_tpu.eval.video_codec encode DIR \
      -o OUT.stemv [--gop 12] [--i-checkpoint CKPT] [--stem-checkpoint CKPT]
  python -m spatiotemporalentropymodel_tpu.eval.video_codec decode OUT.stemv \
      -o OUTDIR [--i-checkpoint CKPT] [--stem-checkpoint CKPT]
"""

import argparse
import struct
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops.padding import pad_centered
from .codec import _load_image, _read_uints, _write_uints

MAGIC = b"STMV"
VERSION = 2
UNSPECIFIED = 0xFF  # model ids for API users who pass models directly

# pipeline-compatible (non-SPM) STEM variants
STEM_VARIANT_IDS = {"without_spm_tpm": 0, "without_spm": 1}


def read_header(f):
    """Validate magic/version and return the header dict (file position is
    left at the first frame record)."""
    magic = f.read(4)
    if magic != MAGIC:
        raise ValueError(f"not a .stemv container (magic {magic!r})")
    (version,) = struct.unpack(">B", f.read(1))
    if version != VERSION:
        raise ValueError(f"unsupported .stemv version {version}")
    i_id, i_q, sv_id, s_ch = struct.unpack(">3BH", f.read(5))
    gop, n_frames, h, w = struct.unpack(">B3I", f.read(13))
    return {
        "i_model_id": i_id, "i_quality": i_q, "stem_variant_id": sv_id,
        "stem_channels": s_ch, "gop": gop, "n_frames": n_frames,
        "h": h, "w": w,
    }


def _write_frame(f, ftype, shape, strings, counts=None):
    f.write(struct.pack(">B2H", ftype, *shape))
    if ftype == 1:
        counts = np.asarray(counts, np.uint32).reshape(-1)
        f.write(struct.pack(">H", counts.size))
        f.write(struct.pack(f">{counts.size}I", *counts.tolist()))
    for group in strings:
        s = group[0]
        _write_uints(f, (len(s),))
        f.write(s)


def _read_frame(f):
    ftype, zh, zw = struct.unpack(">B2H", f.read(5))
    counts = None
    if ftype == 1:
        (levels,) = struct.unpack(">H", f.read(2))
        counts = np.asarray(
            struct.unpack(f">{levels}I", f.read(4 * levels)), np.int32
        )
    strings = []
    for _ in range(2):
        (length,) = _read_uints(f, 1)
        strings.append([f.read(length)])
    return ftype, (zh, zw), counts, strings


def encode_video(frames, i_model, stem, output, gop: int = 12,
                 pipeline=None, meta=None) -> dict:
    """frames: iterable of (H, W, 3) float arrays in [0, 1] (all same size).

    The conditioning carry is the decoder-consistent ŷ throughout — on the
    rare int8-overflow dense fallback the encoder replicates the decoder to
    re-derive it (evalSTEM.py:144-153 carries out_dec['y_hat']).

    meta: optional {"i_model", "i_quality", "stem_variant", "stem_channels"}
    recorded in the header so the decode CLI can rebuild the exact model
    pair; API callers who pass models directly may omit it."""
    from .pipeline import StemVideoPipeline

    if not 1 <= gop <= 255:
        raise ValueError(f"gop must be in [1, 255] (container u8), got {gop}")
    pipe = pipeline or StemVideoPipeline(i_model, stem,
                                         transport_mode="sparse")
    y_cond = None
    n_frames = 0
    h = w = None
    body = []
    t0 = time.time()
    for t, img in enumerate(frames):
        x = jnp.asarray(img, jnp.float32)[None]
        if h is None:
            h, w = x.shape[1], x.shape[2]
        elif (x.shape[1], x.shape[2]) != (h, w):
            raise ValueError(
                f"frame {t} is {x.shape[1]}x{x.shape[2]}, but the sequence "
                f"started at {h}x{w} — .stemv holds one fixed-size sequence"
            )
        x_padded, _ = pad_centered(x, 64)
        if t % gop == 0:
            enc = i_model.compress(x_padded)
            dec = i_model.decompress(enc["strings"], tuple(enc["shape"]))
            if "y_hat" not in dec:
                raise ValueError(
                    f"I-frame model {type(i_model).__name__} does not expose "
                    "the latent in decompress(); the video codec needs a "
                    "mean-scale family model (mbt2018-mean) whose decode "
                    "returns y_hat for the P-frame conditioning"
                )
            y_cond = dec["y_hat"]
            body.append((0, tuple(enc["shape"]), None, enc["strings"]))
        else:
            enc, carry = pipe.encode_frame(x_padded, y_cond)
            if enc.get("transport") == "sparse":
                y_cond = carry  # decoder-consistent ŷ
                body.append((1, tuple(enc["shape"]), enc["counts"],
                             enc["strings"]))
            else:  # dense fallback: replicate the decoder for the carry
                _, y_cond = pipe.decode_frame(enc, y_cond=y_cond)
                body.append((2, tuple(enc["shape"]), None, enc["strings"]))
        n_frames += 1

    from .codec import model_ids

    meta = meta or {}
    i_id = model_ids.get(meta.get("i_model"), UNSPECIFIED)
    sv_id = STEM_VARIANT_IDS.get(meta.get("stem_variant"), UNSPECIFIED)
    with Path(output).open("wb") as f:
        f.write(MAGIC + struct.pack(">B", VERSION))
        f.write(struct.pack(
            ">3BH", i_id, int(meta.get("i_quality", 0)) & 0xFF, sv_id,
            int(meta.get("stem_channels", 0)) & 0xFFFF,
        ))
        f.write(struct.pack(">B3I", gop, n_frames, h, w))
        for ftype, shape, counts, strings in body:
            _write_frame(f, ftype, shape, strings, counts)

    size = Path(output).stat().st_size
    bpp = size * 8.0 / (h * w * n_frames)
    print(f"{n_frames} frames | {bpp:.4f} bpp | "
          f"encoded in {time.time() - t0:.2f}s")
    return {"bpp": bpp, "bytes": size, "frames": n_frames}


def decode_video(input_path, i_model, stem, output_dir=None, pipeline=None):
    """Returns the decoded frames as a list of (H, W, 3) float arrays;
    optionally writes frame_%04d.png into output_dir."""
    from .pipeline import StemVideoPipeline

    pipe = pipeline or StemVideoPipeline(i_model, stem,
                                         transport_mode="sparse")
    t0 = time.time()
    with Path(input_path).open("rb") as f:
        hdr = read_header(f)
        gop, n_frames = hdr["gop"], hdr["n_frames"]
        h, w = hdr["h"], hdr["w"]
        records = [_read_frame(f) for _ in range(n_frames)]

    frames = []
    y_cond = None
    for ftype, shape, counts, strings in records:
        if ftype == 0:
            dec = i_model.decompress(strings, shape)
            if "y_hat" not in dec:
                raise ValueError(
                    f"I-frame model {type(i_model).__name__} does not expose "
                    "the latent in decompress(); use a mean-scale family "
                    "model (mbt2018-mean) for .stemv decode"
                )
            x_hat, y_cond = dec["x_hat"], dec["y_hat"]
        else:
            enc = {"strings": strings, "shape": shape,
                   "transport": "sparse" if ftype == 1 else "dense"}
            if ftype == 1:
                enc["counts"] = counts[None]  # batch of one sequence
            x_hat, y_cond = pipe.decode_frame(enc, y_cond=y_cond)
        x_np = np.asarray(x_hat)[0]
        ph, pw = x_np.shape[0], x_np.shape[1]
        top, left = (ph - h) // 2, (pw - w) // 2
        frames.append(x_np[top:top + h, left:left + w])
    print(f"{len(frames)} frames decoded in {time.time() - t0:.2f}s "
          f"(gop {gop})")

    if output_dir is not None:
        from PIL import Image

        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        for i, fr in enumerate(frames):
            arr = (np.clip(fr, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(out / f"frame_{i:04d}.png")
    return frames


def _load_frames(path):
    files = sorted(
        p for p in Path(path).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not files:
        raise FileNotFoundError(f"no image frames under {path}")
    return [_load_image(p)[0] for p in files]


def _build_models(args, example_hw):
    from ..models import SpatioTemporalPriorModel
    from .codec import _build_model

    i_model = _build_model(args.i_model, args.i_quality, args.i_checkpoint,
                           example_hw)
    stem = SpatioTemporalPriorModel(
        variant=args.stem_variant,
        entropy_bottleneck_channels=args.stem_channels,
        in_channels=i_model.M,
    )
    if args.stem_checkpoint:
        from ..training.checkpoints import load_checkpoint

        stem.load_state_dict(load_checkpoint(args.stem_checkpoint)["model"])
    else:
        d = jnp.zeros((1, example_hw[0] // 16, example_hw[1] // 16,
                       i_model.M), jnp.float32)
        stem.init(d, d)
    stem.update()
    return i_model, stem


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        # restricted to architectures whose decompress() exposes y_hat
        # (the P-frame conditioning latent)
        p.add_argument("--i-model", default="mbt2018-mean",
                       choices=("mbt2018-mean", "mbt2018", "cheng2020-anchor",
                                "cheng2020-attn"))
        p.add_argument("--i-quality", type=int, default=3)
        p.add_argument("--i-checkpoint")
        p.add_argument("--stem-variant", default="without_spm",
                       choices=("without_spm_tpm", "without_spm"))
        p.add_argument("--stem-channels", type=int, default=256)
        p.add_argument("--stem-checkpoint")

    def gop_type(v):
        v = int(v)
        if not 1 <= v <= 255:
            raise argparse.ArgumentTypeError("gop must be in [1, 255]")
        return v

    enc = sub.add_parser("encode")
    enc.add_argument("frames_dir")
    enc.add_argument("-o", "--output", required=True)
    enc.add_argument("--gop", type=gop_type, default=12)
    common(enc)
    dec = sub.add_parser("decode")
    dec.add_argument("input")
    dec.add_argument("-o", "--output-dir", required=True)
    common(dec)
    args = parser.parse_args(argv)

    if args.command == "encode":
        frames = _load_frames(args.frames_dir)
        hw = pad_centered(jnp.zeros((1, *frames[0].shape[:2], 3)), 64)[0].shape[1:3]
        i_model, stem = _build_models(args, tuple(hw))
        encode_video(frames, i_model, stem, args.output, gop=args.gop,
                     meta={"i_model": args.i_model,
                           "i_quality": args.i_quality,
                           "stem_variant": args.stem_variant,
                           "stem_channels": args.stem_channels})
    else:
        # validate magic/version and adopt the recorded model configuration
        # BEFORE building anything (codec.py:104's precedent)
        from .codec import _inverse, model_ids

        with Path(args.input).open("rb") as f:
            hdr = read_header(f)
        if hdr["i_model_id"] != UNSPECIFIED:
            args.i_model = _inverse(model_ids)[hdr["i_model_id"]]
            args.i_quality = hdr["i_quality"]
        if hdr["stem_variant_id"] != UNSPECIFIED:
            args.stem_variant = _inverse(STEM_VARIANT_IDS)[
                hdr["stem_variant_id"]
            ]
            args.stem_channels = hdr["stem_channels"]
        hw = pad_centered(
            jnp.zeros((1, hdr["h"], hdr["w"], 3)), 64
        )[0].shape[1:3]
        i_model, stem = _build_models(args, tuple(hw))
        decode_video(args.input, i_model, stem, args.output_dir)


if __name__ == "__main__":
    main()
