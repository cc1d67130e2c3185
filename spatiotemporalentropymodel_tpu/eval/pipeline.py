"""Production video-codec pipeline: minimal-dispatch P-frame serving.

Remote/accelerator hosts pay a fixed RPC/launch cost per device dispatch
(tens of ms through a tunnel; ~10 µs locally, still worth batching). This
pipeline composes the I-model transforms and the STEM fused codec expressions
into the minimum number of jitted calls per frame:

  encode: ONE dispatch  (g_a → HE → EB-quantize → entropy params → symbol
                         planes, packed byte buffer out) + host rANS
  decode: ONE dispatch  (params-from-ẑ + reconstruct + g_s) + host rANS,
                         with ZERO device→host fetches: the sparse container
                         carries the 64 CDF-row counts (256 B/frame of side
                         info that is itself derivable from ẑ), so the host
                         can run the rANS decoder before touching the device
                         and the GOP recurrence rides device-resident futures

versus five-plus dispatches when calling the generic model APIs. The
conditioning latent stays device-resident across frames (GOP recurrence,
stem/evalSTEM.py:93-153).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import base as entropy_base
from ..entropy import transport


class StemVideoPipeline:
    """(i_model: MeanScaleHyperprior-like, stem: parallel STEM variant).

    Construct AFTER the models' final params and ``update()`` — the jitted
    stages capture both at build time; rebuild the pipeline if they change.

    ``transport="sparse"`` (default) ships symbols as bitmask + compacted
    int8 nonzeros in grouped-by-CDF-row order (~8× fewer bytes over the
    host link; entropy/transport.py) and falls back to the dense int16
    format automatically when a frame overflows int8. ``"dense"`` keeps the
    dense format whose y/z streams are byte-identical to the model APIs'.
    """

    def __init__(self, i_model, stem, transport_mode: str = "sparse",
                 spatial_mesh=None, spatial_axis: str = "sp"):
        if stem.use_spm:
            raise ValueError(
                "StemVideoPipeline drives the parallel (non-SPM) codec path; "
                "use the model's wavefront codec for SPM variants"
            )
        if transport_mode not in ("sparse", "dense"):
            raise ValueError(f"unknown transport {transport_mode!r}")
        self.i_model = i_model
        self.stem = stem
        self.transport_mode = transport_mode
        # spatial model-parallelism (SURVEY §2.7): with a mesh, every frame
        # and the ŷ carry are W-sharded across it — GSPMD inserts the conv
        # halo exchanges in g_a/g_s/hyper nets — and the ONLY gather is the
        # packed byte buffer at the host-coder boundary (the rANS coder is a
        # host loop either way). Frame W must divide mesh_size*16 (the g_a
        # stride) so every stage keeps an integral shard.
        self._sp_mesh = spatial_mesh
        self._sp_axis = spatial_axis
        stem._require_tables()

        def encode_fn(x, y_cond):
            y_cur = i_model._apply(x, method="analysis")[0]
            return y_cur, stem.fused_encode_expr(y_cur, y_cond)

        def encode_sparse_fn(x, y_cond):
            y_cur = i_model._apply(x, method="analysis")[0]
            packed, y_hat = stem.fused_encode_sparse_carry_expr(y_cur, y_cond)
            return y_cur, self._sp_pin(y_hat), packed

        def analysis_fn(x):
            return i_model._apply(x, method="analysis")[0]

        def params_fn(z_sym, y_cond):
            return stem.fused_params_expr(z_sym, y_cond)

        def params_sparse_fn(z_sym, y_cond):
            return stem.fused_params_sparse_expr(z_sym, y_cond)

        def finish_fn(y_sym, means, y_cond):
            y_hat = stem.fused_reconstruct_expr(y_sym, means, y_cond)
            return y_hat, i_model._apply(y_hat, method="get_x")

        def finish_sparse_fn(maskbits, values, order, means, y_cond):
            y_hat = stem.fused_reconstruct_sparse_expr(
                maskbits, values, order, means, y_cond
            )
            return y_hat, i_model._apply(y_hat, method="get_x")

        self._encode = jax.jit(encode_fn)
        self._encode_sparse = jax.jit(encode_sparse_fn)
        self._analysis = jax.jit(analysis_fn)
        self._params = jax.jit(params_fn)
        self._params_sparse = jax.jit(params_sparse_fn)
        self._finish = jax.jit(finish_fn)
        self._finish_sparse = jax.jit(finish_sparse_fn)
        self._decode_full_cache = {}
        self._gop_forward = None

    # -- spatial model-parallelism helpers -------------------------------------

    def _sp_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(
            self._sp_mesh, P(None, None, self._sp_axis, None)
        )

    def _sp_place(self, arr):
        """Commit an NHWC array W-sharded over the spatial mesh (no-op
        without one). jit follows committed input shardings, so placing the
        frame and the carry is all it takes for GSPMD to partition the
        transform stacks with halo exchanges."""
        if self._sp_mesh is None or arr is None:
            return arr
        n = self._sp_mesh.devices.size
        if getattr(arr, "ndim", 0) != 4 or arr.shape[2] % n:
            raise ValueError(
                f"spatial serving needs NHWC with W divisible by the mesh "
                f"size {n}; got shape {getattr(arr, 'shape', None)}"
            )
        return jax.device_put(arr, self._sp_sharding())

    def _sp_pin(self, arr):
        """Inside-trace constraint keeping the ŷ carry (and x̂) W-sharded —
        XLA's own propagation may otherwise replicate outputs whose producer
        chain ends in a gather (the sparse unpack)."""
        if self._sp_mesh is None:
            return arr
        n = self._sp_mesh.devices.size
        if getattr(arr, "ndim", 0) != 4 or arr.shape[2] % n:
            return arr
        return jax.lax.with_sharding_constraint(arr, self._sp_sharding())

    # -- encoder side ---------------------------------------------------------

    def _code_dense_buffer(self, packed, shape4):
        b, hgt, wid, m = shape4
        zh, zw = -(-hgt // 4), -(-wid // 4)
        zt = self.stem.tables["entropy_bottleneck"]
        zc = zt.rows
        ny = b * hgt * wid * m
        nz = b * zh * zw * zc
        y_sym = packed[: 2 * ny].view(np.int16).reshape(b, hgt, wid, m)
        z_sym = packed[2 * ny : 2 * (ny + nz)].view(np.int16).reshape(
            b, zh, zw, zc
        )
        idx = packed[2 * (ny + nz) :].reshape(b, hgt, wid, m).astype(np.int32)

        z_idx = entropy_base.bottleneck_indexes(z_sym.shape, zc)
        z_strings = entropy_base.compress(
            z_sym.astype(np.int32), z_idx, zt, self.stem.coder
        )
        y_strings = entropy_base.compress(
            y_sym.astype(np.int32), idx,
            self.stem.tables["gaussian_conditional"], self.stem.coder,
        )
        return {
            "strings": [y_strings, z_strings],
            "shape": (zh, zw),
            "transport": "dense",
        }

    def _sparse_layout(self, shape4) -> transport.SparseLayout:
        b, hgt, wid, m = shape4
        zt = self.stem.tables["entropy_bottleneck"]
        gc = self.stem.tables["gaussian_conditional"]
        return transport.SparseLayout(
            b=b,
            n=hgt * wid * m,
            zn=(-(-hgt // 4)) * (-(-wid // 4)) * zt.rows,
            levels=int(gc.scale_table.shape[0]),
        )

    def code_sparse_buffer(self, packed, shape4):
        """Host half of the sparse encode: buffer → enc dict (or None on
        int8/capacity overflow — caller re-encodes dense)."""
        layout = self._sparse_layout(shape4)
        planes = transport.unpack_encode(packed, layout)
        if planes.overflow:
            return None
        b, hgt, wid, m = shape4
        zh, zw = -(-hgt // 4), -(-wid // 4)
        zt = self.stem.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes((b, zh, zw, zt.rows), zt.rows)
        z_strings = entropy_base.compress(
            planes.z_sym.reshape(b, zh, zw, zt.rows), z_idx, zt,
            self.stem.coder,
        )
        y_strings = transport.encode_grouped(
            planes.y_sorted, planes.counts,
            self.stem.tables["gaussian_conditional"], self.stem.coder,
        )
        return {
            "strings": [y_strings, z_strings],
            "shape": (zh, zw),
            "transport": "sparse",
            # 64 CDF-row counts ride in the container (256 B/frame; they are
            # derivable from ẑ on device, but shipping them lets the decoder
            # run host rANS with ZERO device→host fetches per frame)
            "counts": planes.counts,
        }

    def encode_frame(self, x, y_cond) -> Tuple[dict, jnp.ndarray]:
        """x (B, H, W, 3) image, y_cond device-resident conditioning latent.

        Returns (enc dict with strings/shape/transport, carry latent). In
        sparse mode the carry is the decoder-consistent ŷ (what
        evalSTEM.py:144-153 carries — a raw-latent carry drifts from the
        decoder); the dense fallback returns the raw y_cur (its legacy
        contract, used by byte-equality tests). One device dispatch + one
        packed download + host rANS.
        """
        if self._sp_mesh is not None:
            x, y_cond = self._sp_place(x), self._sp_place(y_cond)
        if self.transport_mode == "sparse":
            y_cur, y_hat, packed = self._encode_sparse(x, y_cond)
            enc = self.code_sparse_buffer(np.asarray(packed), y_cur.shape)
            if enc is not None:
                return enc, y_hat
            # overflow → dense fallback (rare; diverged/untrained models)
        y_cur, packed = self._encode(x, y_cond)
        return self._code_dense_buffer(np.asarray(packed), y_cur.shape), y_cur

    def encode_frames(self, frames, y_cond):
        """Encode a GOP of P-frames with the host coder double-buffered
        against the next frame's device work. `frames` is an iterable of
        (B, H, W, 3) images; yields enc dicts in order. The conditioning
        carry is the decoder-consistent ŷ, device-resident throughout.
        """
        from concurrent.futures import ThreadPoolExecutor

        if self.transport_mode != "sparse":
            for x in frames:
                enc, y_cond = self.encode_frame(x, y_cond)
                yield enc
            return

        with ThreadPoolExecutor(1) as fetcher:
            pending = None  # (future_buf, y_cur, x, y_cond_before)
            y_cond = self._sp_place(y_cond) if self._sp_mesh is not None \
                else y_cond
            for x in frames:
                if self._sp_mesh is not None:
                    x = self._sp_place(x)
                y_cond_before = y_cond
                y_cur, y_hat, packed = self._encode_sparse(x, y_cond)
                y_cond = y_hat  # device-resident carry
                fut = fetcher.submit(np.asarray, packed)
                if pending is not None:
                    yield self._finish_encode(*pending)
                pending = (fut, y_cur, x, y_cond_before)
            if pending is not None:
                yield self._finish_encode(*pending)

    def _finish_encode(self, fut, y_cur, x, y_cond_before):
        enc = self.code_sparse_buffer(fut.result(), y_cur.shape)
        if enc is None:
            # int8 overflow → re-encode this frame densely. The sparse carry
            # clips at the dense int16 band (fused_encode_sparse_carry_expr),
            # so frames already dispatched against it stay decodable.
            _, packed = self._encode(x, y_cond_before)
            enc = self._code_dense_buffer(np.asarray(packed), y_cur.shape)
        return enc

    def decode_frames(self, encs, y_cond):
        """Decode a sequence of enc dicts, carrying ŷ on device; yields
        (x_hat, y_hat) per frame.

        With counts-carrying sparse containers every iteration is host rANS +
        one async dispatch — no per-frame device sync anywhere, so decode of
        frame k's host half overlaps the device's work on earlier frames and
        the GOP recurrence rides device-resident futures."""
        for enc in encs:
            x_hat, y_cond = self.decode_frame(enc, y_cond=y_cond)
            yield x_hat, y_cond

    # -- decoder side ---------------------------------------------------------

    def _get_decode_full(self, shape4):
        """Jitted single-dispatch decode for counts-carrying sparse frames:
        one packed u8 payload [maskbits][values i8][z_sym i8] in, (x̂, ŷ)
        out — params-from-ẑ, sparse unpack, reconstruct and g_s in ONE
        dispatch, nothing fetched."""
        key = tuple(int(v) for v in shape4)
        if key in self._decode_full_cache:
            return self._decode_full_cache[key]
        b, hgt, wid, m = key
        layout = self._sparse_layout(key)
        n, cap = layout.n, layout.cap
        zh, zw = -(-hgt // 4), -(-wid // 4)
        zc = self.stem.tables["entropy_bottleneck"].rows
        nbm, nval, nz = b * n // 8, b * cap, b * zh * zw * zc
        stem, i_model = self.stem, self.i_model

        def fn(payload, y_cond):
            maskbits = payload[:nbm].reshape(b, n // 8)
            values = jax.lax.bitcast_convert_type(
                payload[nbm:nbm + nval], jnp.int8
            ).reshape(b, cap)
            z_sym = jax.lax.bitcast_convert_type(
                payload[nbm + nval:nbm + nval + nz], jnp.int8
            ).reshape(b, zh, zw, zc)
            _, order, means = stem.fused_params_sparse_expr(z_sym, y_cond)
            y_hat = self._sp_pin(stem.fused_reconstruct_sparse_expr(
                maskbits, values, order, means, y_cond
            ))
            return (self._sp_pin(i_model._apply(y_hat, method="get_x")),
                    y_hat)

        entry = (jax.jit(fn), layout)
        self._decode_full_cache[key] = entry
        return entry

    def _decode_sparse_fetchfree(self, enc, y_cond):
        """Host rANS (z + grouped y, counts from the container) → one packed
        upload → one dispatch. Returns (x_hat, y_hat) futures."""
        strings = enc["strings"]
        zh, zw = enc["shape"]
        b = len(strings[1])
        shape4 = (b, zh * 4, zw * 4, self.stem.in_channels)
        fn, layout = self._get_decode_full(shape4)

        zt = self.stem.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes((b, zh, zw, zt.rows), zt.rows)
        z_sym = entropy_base.decompress(strings[1], z_idx, zt, self.stem.coder)
        counts = np.asarray(enc["counts"], np.int32)
        gc_tables = self.stem.tables["gaussian_conditional"]
        packed = transport.decode_grouped_packed(
            strings[0], counts, layout.cap, gc_tables, self.stem.coder
        )
        if packed is not None:  # fused rANS→payload (native coders)
            maskbits, values = packed
        else:
            y_sorted = transport.decode_grouped(
                strings[0], counts, gc_tables, self.stem.coder
            )
            maskbits, values = transport.pack_decode_payload(
                y_sorted, layout.cap
            )
        payload = np.concatenate([
            maskbits.reshape(-1),
            values.view(np.uint8).reshape(-1),
            np.ascontiguousarray(z_sym.astype(np.int8)).view(np.uint8)
            .reshape(-1),
        ])
        return fn(jnp.asarray(payload), y_cond)

    def decode_frame(self, enc_or_strings, shape=None, y_cond=None):
        """decode_frame(enc, y_cond=...) or decode_frame(strings, shape,
        y_cond). Returns (x_hat, y_hat); y_hat is the next frame's
        conditioning. Counts-carrying sparse containers decode with ONE
        dispatch and zero fetches; legacy sparse containers fetch the
        256-byte counts vector from device; dense uses two dispatches.
        """
        if self._sp_mesh is not None and y_cond is not None:
            y_cond = self._sp_place(y_cond)
        if isinstance(enc_or_strings, dict):
            strings = enc_or_strings["strings"]
            shape = enc_or_strings["shape"]
            mode = enc_or_strings.get("transport", "dense")
            if mode == "sparse" and "counts" in enc_or_strings:
                return self._decode_sparse_fetchfree(enc_or_strings, y_cond)
        else:
            strings = enc_or_strings
            mode = "dense"
        zt = self.stem.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes(
            (len(strings[1]), *shape, zt.rows), zt.rows
        )
        z_sym = entropy_base.decompress(strings[1], z_idx, zt, self.stem.coder)

        if mode == "sparse":
            counts, order, means = self._params_sparse(
                jnp.asarray(z_sym.astype(np.int8)), y_cond
            )
            counts = np.asarray(counts)
            y_sorted = transport.decode_grouped(
                strings[0], counts,
                self.stem.tables["gaussian_conditional"], self.stem.coder,
            )
            cap = transport.sparse_capacity(y_sorted.shape[1])
            maskbits, values = transport.pack_decode_payload(y_sorted, cap)
            y_hat, x_hat = self._finish_sparse(
                jnp.asarray(maskbits), jnp.asarray(values), order, means,
                y_cond,
            )
            return x_hat, y_hat

        means, idx = self._params(jnp.asarray(z_sym.astype(np.int16)), y_cond)
        y_sym = entropy_base.decompress(
            strings[0], np.asarray(idx, np.int32),
            self.stem.tables["gaussian_conditional"], self.stem.coder,
        )
        y_hat, x_hat = self._finish(
            jnp.asarray(y_sym.astype(np.int16)), means, y_cond
        )
        return x_hat, y_hat

    def analysis(self, x):
        """g_a only (I-frame conditioning bootstrap)."""
        if self._sp_mesh is not None:
            x = self._sp_place(x)
        return self._analysis(x)

    # -- device-only GOP evaluation -------------------------------------------

    def gop_forward(self, frames, y_cond):
        """Whole-GOP entropy-estimation forward in ONE dispatch.

        frames: (T, B, H, W, 3). A jitted ``lax.scan`` over frames runs
        analysis → STEM forward (dequantize quantization) → reconstruction →
        g_s with the ŷ carry device-resident — the zero-host-boundary serving
        mode (the temporal loop of stem/evalSTEM.py:93-153 as one XLA
        program; bench.py's device-only figure measures this shape). Returns
        (x_hat (T, B, H, W, 3), bpp_est (T, B)) with bpp from likelihoods.
        """
        if self._gop_forward is None:
            stem, i_model = self.stem, self.i_model
            log2 = float(np.log(2.0))

            def step(y_cond, x):
                y_cur = i_model._apply(x, method="analysis")[0]
                out = stem._apply(y_cur, y_cond, train=False)
                x_hat = i_model._apply(out["y_hat"], method="get_x")
                n_pix = x.shape[1] * x.shape[2]
                bpp = sum(
                    -jnp.sum(jnp.log(lk), axis=(1, 2, 3)) / (log2 * n_pix)
                    for lk in out["likelihoods"].values()
                )
                return out["y_hat"], (x_hat, bpp)

            def fn(frames, y_cond):
                _, (x_hats, bpps) = jax.lax.scan(step, y_cond, frames)
                return x_hats, bpps

            self._gop_forward = jax.jit(fn)
        return self._gop_forward(frames, y_cond)

    def gop_forward_sharded(self, frames, y_cond, mesh,
                            axis_name: str = "data"):
        """``gop_forward`` batch-sharded over a device mesh.

        frames (T, B, H, W, 3) are sharded on B across ``mesh``'s data axis
        and the carry likewise; parameters replicate and GSPMD partitions the
        same one-dispatch scan — evaluation scales over ICI with zero code
        change to the program (SURVEY.md §2.7's serving analog of the
        data-parallel train step)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        frames = jax.device_put(
            frames, NamedSharding(mesh, P(None, axis_name))
        )
        y_cond = jax.device_put(y_cond, NamedSharding(mesh, P(axis_name)))
        return self.gop_forward(frames, y_cond)


class WavefrontVideoPipeline:
    """Pipelined GOP server for the SPM/tiled-``res`` flagship (VERDICT r4 #4).

    The production serving loop for wavefront-AR STEM variants, promoted out
    of bench.py into a first-class tested API (the reference ships its serial
    path as model API too, spatiotemporalpriors.py:729-768):

      per P-frame: g_a on the pixel frame (encode side) → the model's fused
      wavefront codec (one-dispatch encoder scan; decode in 3(th-1)+tw device
      rounds with host rANS between rounds) → g_s of the decoded ŷ dispatched
      ASYNC so its device execution overlaps the host half of frame k+1's
      rounds. Only ŷ is the recurrence carry — matching evalSTEM.py:144-153,
      where the reconstruction likewise hangs off the conditioning path —
      so x̂ futures never serialize the GOP.

    Multi-stream serving: the batch axis is S independent GOP streams. The
    wavefront rounds stack independent frames' tiles along the tile-batch
    axis bit-exactly (tests/test_stem.py::
    test_wavefront_cross_stream_batching_exact), the transforms batch
    natively, and host rANS serializes per-stream on one core — so one
    pipeline instance serves S streams in lockstep with all device work
    batched.

    Bitstreams are byte-identical to the model API's ``compress`` (the
    pipeline calls the same fused wavefront path; tests/test_pipeline.py::
    test_wavefront_pipeline_bitstream_matches_model_api pins it).

    ``trace`` (optional): callable(event: str, frame: int) fired at
    ``encode``/``decode_rounds``/``gs_dispatch`` boundaries — the scheduling
    tests pin that gs_dispatch(k) precedes encode(k+1) and that nothing
    blocks on an x̂ future until the caller does.
    """

    def __init__(self, i_model, stem, trace=None):
        if not stem.use_spm or getattr(stem, "ar_mode", None) != "wavefront":
            raise ValueError(
                "WavefrontVideoPipeline drives the wavefront-AR codec path; "
                "use StemVideoPipeline for parallel (non-SPM) variants"
            )
        self.i_model = i_model
        self.stem = stem
        self.trace = trace
        stem._require_tables()
        self._analysis = jax.jit(
            lambda x: i_model._apply(x, method="analysis")[0]
        )
        self._gs = jax.jit(lambda y: i_model._apply(y, method="get_x"))

    def _trace(self, event: str, frame: int) -> None:
        if self.trace is not None:
            self.trace(event, frame)

    # -- single-frame pieces ----------------------------------------------

    def analysis(self, x):
        """g_a only (I-frame conditioning bootstrap / encode side)."""
        return self._analysis(x)

    def synthesis_async(self, y_hat):
        """One async g_s dispatch; returns the x̂ future immediately so the
        device works on it while the host runs the next frame's rANS."""
        return self._gs(y_hat)

    def encode_frame(self, y_cur, y_cond) -> dict:
        """Model-API-identical wavefront encode (one encoder-scan dispatch +
        host rANS). y_cur/y_cond: (S, h, w, M) latents, S = streams."""
        return self.stem.compress(y_cur, y_cond)

    def decode_frame(self, enc: dict, y_cond):
        """Wavefront decode (device rounds + host rANS); returns ŷ, the next
        frame's conditioning carry (device-resident)."""
        dec = self.stem.decompress(enc["strings"], tuple(enc["shape"]),
                                   y_cond)
        return dec["y_hat"]

    # -- the pipelined GOP loop --------------------------------------------

    def serve_latent(self, y_cur, y_cond, frame: int = 0):
        """Codec round-trip for one P-frame latent with the async-g_s
        schedule. Returns (enc, ŷ, x̂ future) — the caller must not block on
        the future until the GOP is drained."""
        self._trace("encode", frame)
        enc = self.encode_frame(y_cur, y_cond)
        self._trace("decode_rounds", frame)
        y_hat = self.decode_frame(enc, y_cond)
        self._trace("gs_dispatch", frame)
        return enc, y_hat, self.synthesis_async(y_hat)

    def serve_gop(self, frames, y_cond, latents: bool = False):
        """Serve a GOP of P-frames (pixels, or latents with latents=True)
        through the pipelined loop. Returns (encs, x̂ futures, final ŷ);
        blocks only on the last frame's outputs."""
        encs, x_futs = [], []
        for k, x in enumerate(frames):
            y_cur = x if latents else self._analysis(x)
            enc, y_cond, x_fut = self.serve_latent(y_cur, y_cond, frame=k)
            encs.append(enc)
            x_futs.append(x_fut)
        if x_futs:
            jax.block_until_ready((x_futs[-1], y_cond))
        return encs, x_futs, y_cond
