"""Post-training CDF update + hash-stamped re-export.

Parity: compressai/utils/update_model (__main__.py:100-137): load a training
checkpoint, rebuild the codec tables (update(force=True)), and write a
deployment checkpoint whose filename carries a SHA256 prefix for integrity.
"""

import argparse
import hashlib
import os

import jax
import jax.numpy as jnp

from ..training.checkpoints import load_checkpoint, save_checkpoint


def update_checkpoint(model, in_path: str, out_dir: str,
                      name: str = "model", solve_aux: bool = True) -> str:
    """Rebuild tables and export {name}-{sha256[:8]}.pkl; returns the path.

    ``solve_aux`` (beyond-reference): converge every EntropyBottleneck's
    quantiles to the exact aux-loss optimum in closed form
    (entropy/bottleneck.solve_quantiles) before building tables — the aux
    Adam only approximates this, and under-converged quantiles inflate the
    CDF tail buckets (wasted rate on every encoded frame).
    """
    import numpy as np

    state = load_checkpoint(in_path)
    if "model" in state:
        model.load_state_dict(state["model"])
    elif "train_state" in state:
        model.params = state["train_state"][0]
    if solve_aux:
        from ..entropy.bottleneck import solve_quantiles

        params = jax.tree_util.tree_map(np.asarray, model.params)
        for bn in model.bottleneck_names:
            sub = params
            for part in bn.split("/"):
                sub = sub[part]
            q = solve_quantiles(sub)
            if np.all(np.abs(q) < 9e3):  # bracket hit → keep trained values
                sub["quantiles"] = q.astype(np.float32)
        model.params = jax.tree_util.tree_map(jnp.asarray, params)
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
