"""CompressionModel host wrapper.

The reference's ``CompressionModel`` (compressai/models/priors.py:42-106) is an
nn.Module with mutable CDF buffers. Here the same API surface —
``forward / compress / decompress / update / aux_loss / load_state_dict-like
serialization`` — is a thin host wrapper around:

  * a pure flax module (``self.module``) holding the architecture,
  * an immutable parameter pytree (``self.params``),
  * explicit :class:`CodecTables` per entropy-model instance
    (``self.tables``), produced by pure ``update()`` functions,
  * cached jitted device functions for the codec transforms.

Everything device-side is jitted with static shapes; the host side only runs
the rANS coder and orchestration.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import base as entropy_base
from ..entropy import (
    get_scale_table,
    update_bottleneck_tables,
    update_gaussian_tables,
)
from ..coders import get_coder


class CompressionModel:
    """Base wrapper; subclasses set ``module`` and implement the codec path."""

    # names of EntropyBottleneck submodules inside the flax param tree
    bottleneck_names = ("entropy_bottleneck",)
    # whether the model owns a GaussianConditional (scale-table driven)
    has_gaussian = False

    def __init__(self, module, params=None, rng=None, entropy_coder=None):
        self.module = module
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._jit_cache: Dict[str, Any] = {}
        self.params = params
        self.tables: Dict[str, Any] = {}
        self._coder_name = entropy_coder

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        # jitted codec functions capture the params at trace time; any
        # reassignment must invalidate them or compress/decompress would
        # silently run with the previous weights
        self._params = value
        self._jit_cache.clear()
        wf = getattr(self, "_wavefront_cache", None)
        if wf is not None:
            wf.clear()

    # ---- init / params ----------------------------------------------------

    def init(self, *example_args):
        """Initialize parameters from example inputs."""
        self._rng, k1, k2 = jax.random.split(self._rng, 3)
        variables = self.module.init(
            {"params": k1, "noise": k2}, *example_args, train=False
        )
        self.params = variables["params"]
        if self.compute_dtype is not None:  # constructor-set serving dtype
            self.set_compute_dtype(self.compute_dtype)
        return self.params

    @property
    def coder(self):
        return get_coder(self._coder_name)

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # serving compute dtype for the transform nets; None = float32. Set via
    # set_compute_dtype() — entropy/quantize math stays float32 inside the
    # fused codec expressions regardless (they cast explicitly).
    compute_dtype = None

    def set_compute_dtype(self, dtype=None):
        """Serve the transform nets at ``dtype`` (e.g. ``jnp.bfloat16``).

        Casts the floating leaves of the parameter pytree and marks inputs
        for casting in :meth:`_apply`; integer params and the codec tables
        stay exact, and every fused codec expression casts back to float32
        before quantization/CDF indexing, so encoder and decoder evaluate
        identical entropy parameters and the bitstream stays
        self-consistent — only the RD point shifts marginally.

        Call AFTER ``init()``/checkpoint load and AFTER ``update()`` (so CDF
        tables are built from full-precision quantiles). The cast is lossy:
        pass ``None`` to serve float32 again, but reload the checkpoint to
        recover exact float32 weights. Serving-only — keep training at f32.
        """
        self.compute_dtype = dtype
        target = dtype if dtype is not None else jnp.float32
        if self._params is not None:
            self.params = jax.tree_util.tree_map(
                lambda p: p.astype(target)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                self._params,
            )

    def _cast_in(self, a):
        cd = self.compute_dtype
        if (cd is not None and hasattr(a, "dtype")
                and jnp.issubdtype(a.dtype, jnp.floating)):
            return jnp.asarray(a, cd)
        return a

    def _apply(self, *args, method=None, train=False, **kwargs):
        rngs = {"noise": self._next_rng()} if train else None
        if self.compute_dtype is not None and not train:
            args = tuple(self._cast_in(a) for a in args)
        return self.module.apply(
            {"params": self.params},
            *args,
            train=train,
            method=method,
            rngs=rngs,
            **kwargs,
        )

    def _jitted(self, name: str, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # ---- reference API ----------------------------------------------------

    def forward(self, *args, train: bool = False):
        """Differentiable forward returning the reference's dict contract."""
        return self._apply(*args, train=train)

    __call__ = forward

    def aux_loss(self):
        """Aggregated EntropyBottleneck aux loss (priors.py:58-65)."""
        return self.module.apply({"params": self.params}, method="aux_loss")

    def update(self, scale_table=None, force: bool = False) -> bool:
        """(Re)build codec tables from parameters (priors.py:77-96).

        Returns True if tables were (re)computed.
        """
        if self.tables and not force:
            return False
        for name in self.bottleneck_names:
            sub = self.params
            for part in name.split("/"):
                sub = sub[part]
            self.tables[name] = update_bottleneck_tables(sub)
        if self.has_gaussian:
            if scale_table is None:
                scale_table = get_scale_table()
            self.tables["gaussian_conditional"] = update_gaussian_tables(scale_table)
        self._jit_cache.clear()
        wf = getattr(self, "_wavefront_cache", None)
        if wf is not None:
            wf.clear()  # wavefront closures capture tables at build time
        return True

    def set_tables(self, tables: Dict[str, Any]) -> None:
        """Install externally provided codec tables (e.g. the CDF buffers
        shipped inside a reference torch checkpoint — zoo/convert.py::
        tables_from_state_dict) and invalidate captured jit closures."""
        self.tables = dict(tables)
        self._jit_cache.clear()
        wf = getattr(self, "_wavefront_cache", None)
        if wf is not None:
            wf.clear()

    def _require_tables(self):
        if not self.tables:
            raise RuntimeError("Uninitialized CDFs. Run update() first")

    # ---- EB coding helpers -------------------------------------------------

    def _eb_compress(self, z, name="entropy_bottleneck"):
        return entropy_base.bottleneck_compress(
            np.asarray(z), self.tables[name], self.coder
        )

    def _eb_decompress(self, strings, spatial_shape, name="entropy_bottleneck"):
        return self._eb_z_hat_from_symbols(
            entropy_base.decompress(
                strings,
                entropy_base.bottleneck_indexes(
                    (len(strings), *spatial_shape, self.tables[name].rows),
                    self.tables[name].rows,
                ),
                self.tables[name],
                self.coder,
            ),
            name,
        )

    def _eb_z_hat_from_symbols(self, symbols, name="entropy_bottleneck"):
        med = self.tables[name].medians[None, None, None, :]
        return (np.asarray(symbols) + med).astype(np.float32)

    def _eb_quantize(self, z, name="entropy_bottleneck"):
        """Encoder-side ẑ: identical to decode(encode(z)) by construction
        (compress must replicate the decoder state — SURVEY §7 hard parts).
        Uses the same saturated-symbol path as the actual coder."""
        med = self.tables[name].medians[None, None, None, :]
        symbols = entropy_base.safe_symbols(np.asarray(z), med)
        return (symbols + med).astype(np.float32)

    # ---- GC coding helpers -------------------------------------------------

    def _gc_compress(self, y, indexes, means=None):
        t = self.tables["gaussian_conditional"]
        symbols = entropy_base.safe_symbols(np.asarray(y), means)
        return entropy_base.compress(symbols, np.asarray(indexes), t, self.coder)

    def _gc_decompress(self, strings, indexes, means=None):
        t = self.tables["gaussian_conditional"]
        symbols = entropy_base.decompress(strings, np.asarray(indexes), t, self.coder)
        if means is not None:
            return (symbols + np.asarray(means)).astype(np.float32)
        return symbols.astype(np.float32)

    # ---- serialization -----------------------------------------------------

    def state_dict(self):
        """Checkpoint pytree: params + codec tables (no shape surgery needed
        on load, unlike models/utils.py:46-109)."""
        return {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "tables": {k: v.asdict() for k, v in self.tables.items()},
        }

    def load_state_dict(self, state):
        from ..entropy.tables import CodecTables

        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self.tables = {
            k: CodecTables.fromdict(v) for k, v in state.get("tables", {}).items()
        }
        self._jit_cache.clear()
