"""Post-training CDF update + hash-stamped re-export.

Parity: compressai/utils/update_model (__main__.py:100-137): load a training
checkpoint, rebuild the codec tables (update(force=True)), and write a
deployment checkpoint whose filename carries a SHA256 prefix for integrity.
"""

import argparse
import hashlib
import os

import jax.numpy as jnp

from ..training.checkpoints import load_checkpoint, save_checkpoint


def update_checkpoint(model, in_path: str, out_dir: str,
                      name: str = "model") -> str:
    """Rebuild tables and export {name}-{sha256[:8]}.pkl; returns the path."""
    state = load_checkpoint(in_path)
    if "model" in state:
        model.load_state_dict(state["model"])
    elif "train_state" in state:
        model.params = state["train_state"][0]
    model.update(force=True)

    os.makedirs(out_dir, exist_ok=True)
    tmp_path = os.path.join(out_dir, f"{name}.pkl")
    save_checkpoint({"model": model.state_dict()}, tmp_path)
    with open(tmp_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    final = os.path.join(out_dir, f"{name}-{digest}.pkl")
    os.replace(tmp_path, final)
    return final


def main(argv=None):
    from ..zoo import cfgs, model_architectures

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("-a", "--architecture", required=True,
                        choices=list(model_architectures))
    parser.add_argument("-q", "--quality", type=int, default=1)
    parser.add_argument("-d", "--dir", default=".")
    parser.add_argument("-n", "--name", default=None)
    args = parser.parse_args(argv)

    model = model_architectures[args.architecture](
        *cfgs[args.architecture][args.quality]
    )
    model.init(jnp.zeros((1, 64, 64, 3), jnp.float32))
    name = args.name or args.architecture
    out = update_checkpoint(model, args.checkpoint, args.dir, name)
    print(out)


if __name__ == "__main__":
    main()
