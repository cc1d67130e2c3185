"""File-level codec CLI with a real bitstream container.

Parity: compressai_examples/codec.py — header is 2 bytes
(model id, metric<<4 | quality−1), then original (h, w) as big-endian u32,
the latent shape + string count, and length-prefixed string payloads
(codec.py:92-117, 150-220). Images are center-padded to ×64 (codec.py:119-148).

Usage:
  python -m spatiotemporalentropymodel_tpu.eval.codec encode IMG -o OUT.bin \
      --model bmshj2018-factorized --quality 1 [--checkpoint CKPT]
  python -m spatiotemporalentropymodel_tpu.eval.codec decode OUT.bin -o REC.png
"""

import argparse
import struct
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops.padding import crop_centered, pad_centered
from ..zoo import cfgs, model_architectures

model_ids = {name: i for i, name in enumerate(model_architectures)}
metric_ids = {"mse": 0, "ms-ssim": 1}


def _inverse(d):
    return {v: k for k, v in d.items()}


def get_header(model_name: str, metric: str, quality: int):
    code = (metric_ids[metric] << 4) | ((quality - 1) & 0x0F)
    return model_ids[model_name], code


def parse_header(header):
    model_id, code = header
    return (
        _inverse(model_ids)[model_id],
        _inverse(metric_ids)[code >> 4],
        (code & 0x0F) + 1,
    )


def _write_uints(fd, values):
    fd.write(struct.pack(f">{len(values)}I", *values))


def _read_uints(fd, n):
    return struct.unpack(f">{n}I", fd.read(4 * n))


def _build_model(model_name, quality, checkpoint=None, example_hw=(64, 64)):
    model = model_architectures[model_name](*cfgs[model_name][quality])
    if checkpoint:
        from ..training.checkpoints import load_checkpoint

        model.load_state_dict(load_checkpoint(checkpoint)["model"])
    else:
        model.init(jnp.zeros((1, *example_hw, 3), jnp.float32))
    model.update()
    return model


def _load_image(path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32)[None] / 255.0


def encode(image_path, output, model_name="bmshj2018-factorized", quality=1,
           metric="mse", checkpoint=None, model=None):
    t0 = time.time()
    x = jnp.asarray(_load_image(image_path))
    h, w = x.shape[1], x.shape[2]
    x_padded, _ = pad_centered(x, 64)
    if model is None:
        model = _build_model(model_name, quality, checkpoint,
                             x_padded.shape[1:3])
    out = model.compress(x_padded)
    shape = out["shape"]

    with Path(output).open("wb") as f:
        f.write(struct.pack(">2B", *get_header(model_name, metric, quality)))
        _write_uints(f, (h, w))
        _write_uints(f, (shape[0], shape[1], len(out["strings"])))
        for group in out["strings"]:
            s = group[0]
            _write_uints(f, (len(s),))
            f.write(s)

    size = Path(output).stat().st_size
    bpp = size * 8.0 / (h * w)
    print(f"{bpp:.3f} bpp | Encoded in {time.time() - t0:.2f}s")
    return {"bpp": bpp, "bytes": size}


def decode(input_path, output=None, checkpoint=None, model=None):
    t0 = time.time()
    with Path(input_path).open("rb") as f:
        model_name, metric, quality = parse_header(
            struct.unpack(">2B", f.read(2))
        )
        h, w = _read_uints(f, 2)
        sh, sw, n_strings = _read_uints(f, 3)
        strings = []
        for _ in range(n_strings):
            (length,) = _read_uints(f, 1)
            strings.append([f.read(length)])

    if model is None:
        model = _build_model(model_name, quality, checkpoint)
    out = model.decompress(strings, (sh, sw))

    x_hat = np.asarray(out["x_hat"])
    ph, pw = x_hat.shape[1], x_hat.shape[2]
    top = (ph - h) // 2
    left = (pw - w) // 2
    x_hat = x_hat[:, top : top + h, left : left + w, :]
    print(f"Model: {model_name}, metric: {metric}, quality: {quality}")
    print(f"Decoded in {time.time() - t0:.2f}s")

    if output is not None:
        from PIL import Image

        arr = (np.clip(x_hat[0], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(output)
    return x_hat


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)
    import spatiotemporalentropymodel_tpu as stem_tpu

    enc = sub.add_parser("encode")
    enc.add_argument("image")
    enc.add_argument("-o", "--output", required=True)
    enc.add_argument("--model", default="bmshj2018-factorized",
                     choices=list(model_ids))
    enc.add_argument("--quality", type=int, default=1)
    enc.add_argument("--metric", default="mse", choices=list(metric_ids))
    enc.add_argument("--checkpoint")
    enc.add_argument("-c", "--coder",
                     choices=stem_tpu.available_entropy_coders(),
                     default=stem_tpu.get_entropy_coder())
    dec = sub.add_parser("decode")
    dec.add_argument("input")
    dec.add_argument("-o", "--output")
    dec.add_argument("--checkpoint")
    dec.add_argument("-c", "--coder",
                     choices=stem_tpu.available_entropy_coders(),
                     default=stem_tpu.get_entropy_coder())
    args = parser.parse_args(argv)

    stem_tpu.set_entropy_coder(args.coder)
    if args.command == "encode":
        encode(args.image, args.output, args.model, args.quality, args.metric,
               args.checkpoint)
    else:
        decode(args.input, args.output, args.checkpoint)


if __name__ == "__main__":
    main()
