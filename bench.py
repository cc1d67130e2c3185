"""Headline benchmark: 1080p P-frame encode+decode throughput on one chip.

Pipeline per frame (the evalSTEM GOP inner loop, stem/evalSTEM.py:93-153),
driven through eval/pipeline.py's minimal-dispatch serving path with the
sparse-grouped transport (entropy/transport.py): encode = ONE device dispatch
→ ~0.6 MB packed buffer → host rANS; decode = host rANS straight from the
container's row counts → ONE packed upload → ONE dispatch, zero device→host
fetches — the GOP recurrence rides device-resident futures, so neither side
ever blocks on the device. Host coding of frame k overlaps the device
dispatch/transfer of frame k+1 (double buffering).

Workload realism: trained weights are unavailable offline, so the model's
entropy-parameter head is surgically set to emit a converged-model scale
distribution (most mass at the σ floor, a small active fraction — UVG runs at
0.08-0.16 bpp, README.md:115-119) and the latent is sampled from the model's
own N(μ, σ). Encoder and decoder still evaluate the full real networks.

Reported alongside the tunnel number: device-only fps (all codec math, no
host boundary), per-stage ms, bytes over the link, and a component-wise
projection for a PCIe-attached host (measured device ms + measured host-coder
ms + measured bytes at PCIe bandwidth).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
vs_baseline is against the BASELINE.json target of 30 fps/chip. The stdout
line is a COMPACT summary hard-capped below 2 KB (the driver captures only
the last 2000 characters of output — round 4's 12.8 KB line truncated
mid-string and parsed as null); the full per-section detail is written to
BENCH_SELF.json and artifacts/bench_last_validated.json instead.
"""

import json
import os
import signal
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

import spatiotemporalentropymodel_tpu as stem_tpu
from spatiotemporalentropymodel_tpu.models import (
    MeanScaleHyperprior,
    SpatioTemporalPriorModel,
)

TARGET_FPS = 30.0
H, W = 1088, 1920  # 1080p padded ×64 (stem/evalSTEM.py:41-52)
M, EBC = 192, 256
PCIE_GBPS = 16.0  # gen4 x16 effective


def realistic_stem(variant="without_spm", rng_seed=7, **model_kw):
    """STEM whose entropy head emits converged-model scale statistics.

    The EPM's last conv is shrunk so its output ≈ bias, and the bias is set
    channel-wise: ~88% of scale channels below the 0.11 σ floor (near-zero
    rate) and 12% log-uniform in [0.25, 2.5] (active), means fractional in
    (-2, 2). Symbol statistics — sparsity, row usage, escape rate — then
    match the published 0.08-0.16 bpp operating range instead of the ~9 bpp
    an untrained prior degenerates to.
    """
    stem = SpatioTemporalPriorModel(
        variant=variant, entropy_bottleneck_channels=EBC, in_channels=M,
        **model_kw,
    )
    d = jnp.zeros((1, 64 // 16, 64 // 16, M))
    stem.init(d, d)

    rng = np.random.default_rng(rng_seed)
    params = jax.tree_util.tree_map(np.asarray, stem.params)
    epm_last = params["EPM"]["layers_4"]
    out_ch = epm_last["bias"].shape[0]  # 2M: scales || means
    m = out_ch // 2
    scales_bias = np.full(m, 0.05, np.float32)
    active = rng.random(m) < 0.07
    scales_bias[active] = np.exp(
        rng.uniform(np.log(0.2), np.log(1.8), active.sum())
    )
    # means ≡ 0: the main workload samples y from the model's own N(μ, σ) so
    # μ cancels in round(y−μ) regardless; zero keeps the AR variants (whose
    # sampler can't see μ) on the same symbol statistics
    means_bias = np.zeros(m, np.float32)
    epm_last["bias"] = np.concatenate([scales_bias, means_bias])
    epm_last["kernel"] = epm_last["kernel"] * 1e-3
    # shrink the hyper-encoder tail too: z ≈ const → near-zero hyper rate,
    # matching a converged model's tiny z share
    he_last = params["HE"]["layers_4"]
    he_last["kernel"] = he_last["kernel"] * 1e-3
    he_last["bias"] = he_last["bias"] * 0.0
    # sharpen the factorized prior (a converged model's hyper rate is tiny;
    # an untrained EB spends ~2 bits even on all-zero z) and solve the
    # quantiles to the sharpened density in closed form so medians/supports
    # stay consistent (entropy/bottleneck.py::solve_quantiles)
    from spatiotemporalentropymodel_tpu.entropy.bottleneck import (
        solve_quantiles,
    )

    eb = params["entropy_bottleneck"]
    sp_inv = np.log(np.expm1(0.8))  # softplus⁻¹(0.8): chain slope ≈ 26
    for k in list(eb):
        if k.startswith("matrix"):
            eb[k] = np.full_like(eb[k], sp_inv)
    eb["quantiles"] = solve_quantiles(eb).astype(np.float32)
    stem.params = jax.tree_util.tree_map(jnp.asarray, params)
    stem.update()
    return stem


def build(batch, h=H, w=W):
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, h, w, 3),
                           jnp.float32)
    imodel = MeanScaleHyperprior(192, M)
    imodel.init(x)
    stem = realistic_stem()
    from spatiotemporalentropymodel_tpu.eval.pipeline import StemVideoPipeline

    pipe = StemVideoPipeline(imodel, stem, transport_mode="sparse")
    y_cond = 0.5 * jax.random.normal(
        jax.random.PRNGKey(2), (batch, h // 16, w // 16, M), jnp.float32
    )
    return x, imodel, stem, pipe, y_cond


def make_bench_encode(imodel, stem, sparse: bool):
    """One dispatch: real g_a + real entropy nets; y sampled from the model's
    own N(μ, σ) so coded symbols match the row statistics exactly. Returns
    (packed buffer, decoder-consistent ŷ) so the GOP carry evolves exactly as
    the decoder's does (stream stays decodable along the recurrence)."""
    medians = jnp.asarray(stem.tables["entropy_bottleneck"].medians,
                          jnp.float32)

    def sample_latent(x, y_cond, key):
        y_ga = imodel._apply(x, method="analysis")[0]
        z = stem._apply(y_cond, y_cond, method="hyper_encode")
        z_hat = jnp.round(z - medians) + medians
        scales, means = stem._apply(z_hat, y_cond, method="entropy_params")
        sigma = jnp.clip(jnp.abs(scales), 0.11, 256.0)
        eps = jax.random.normal(key, means.shape, jnp.float32)
        # keep g_a live in the graph without perturbing statistics
        return means + sigma * eps + 1e-30 * jnp.mean(y_ga)

    def fn(x, y_cond, key):
        y_cur = sample_latent(x, y_cond, key)
        if sparse:
            return stem.fused_encode_sparse_carry_expr(y_cur, y_cond)
        return stem.fused_encode_expr(y_cur, y_cond), y_cur

    return jax.jit(fn)


def run_pipeline(batch: int, h: int = H, w: int = W) -> dict:
    """End-to-end enc+dec fps through the tunnel as a streaming GOP:
    double-buffered encode (host rANS of frame k overlaps frame k+1's device
    work) feeding the fetch-free decoder (host rANS from container counts →
    one packed upload → one dispatch; the recurrence rides device futures).
    Returns fps + stage breakdown + bytes over the link."""
    x, imodel, stem, pipe, y_cond = build(batch, h, w)
    bench_encode = make_bench_encode(imodel, stem, sparse=True)
    shape4 = (batch, h // 16, w // 16, M)
    layout = pipe._sparse_layout(shape4)

    key = jax.random.PRNGKey(1)

    def encode_host(buf):
        enc = pipe.code_sparse_buffer(buf, shape4)
        assert enc is not None, "sparse overflow at realistic stats"
        return enc

    # warmup / compile (encode jit + fetch-free decode jit)
    packed, _ = bench_encode(x, y_cond, key)
    enc = encode_host(np.asarray(packed))
    x_hat, y_hat = pipe.decode_frame(enc, y_cond=y_cond)
    jax.block_until_ready(x_hat)

    n_bytes = sum(len(s) for g in enc["strings"] for s in g)
    n_bytes += np.asarray(enc["counts"]).nbytes  # side info in the container
    bpp = n_bytes * 8 / (batch * h * w)

    from spatiotemporalentropymodel_tpu.entropy import base as eb
    from spatiotemporalentropymodel_tpu.entropy import transport as tp

    zt = stem.tables["entropy_bottleneck"]
    gc_tables = stem.tables["gaussian_conditional"]
    z_idx = eb.bottleneck_indexes((batch, h // 64, w // 64, zt.rows), zt.rows)

    # instrumented pass (per-stage syncs, 3 samples → median) for the
    # breakdown; mirrors pipeline._decode_sparse_fetchfree with timers.
    # fetch/dec_upload/dec_dispatch are tunnel-dominated; host_* are pure
    # host work. dec_upload (payload H2D, synced) is split out of
    # dec_dispatch so the 146 ms round-3 aggregate decomposes into
    # transfer vs queue/compute (VERDICT r3 #6).
    stages = {"fetch": [], "host_enc": [], "dec_z": [], "dec_y": [],
              "dec_upload": [], "dec_dispatch": []}
    for _ in range(3):
        packed, _ = bench_encode(x, y_cond, key)
        jax.block_until_ready(packed)
        t = time.perf_counter()
        buf = np.asarray(packed)
        stages["fetch"].append(time.perf_counter() - t)
        t = time.perf_counter()
        enc = encode_host(buf)
        stages["host_enc"].append(time.perf_counter() - t)
        t = time.perf_counter()
        z_sym = eb.decompress(enc["strings"][1], z_idx, zt, stem.coder)
        stages["dec_z"].append(time.perf_counter() - t)
        t = time.perf_counter()
        maskbits, values = tp.decode_grouped_packed(
            enc["strings"][0], np.asarray(enc["counts"], np.int32),
            layout.cap, gc_tables, stem.coder,
        )
        payload = np.concatenate([
            maskbits.reshape(-1), values.view(np.uint8).reshape(-1),
            np.ascontiguousarray(z_sym.astype(np.int8)).view(np.uint8)
            .reshape(-1),
        ])
        stages["dec_y"].append(time.perf_counter() - t)
        t = time.perf_counter()
        payload_dev = jax.device_put(payload)
        payload_dev.block_until_ready()
        stages["dec_upload"].append(time.perf_counter() - t)
        t = time.perf_counter()
        fn, _ = pipe._get_decode_full(shape4)
        x_hat, _ = fn(payload_dev, y_cond)
        jax.block_until_ready(x_hat)
        stages["dec_dispatch"].append(time.perf_counter() - t)

    # throughput pass: streaming GOP, no per-frame sync anywhere
    iters = max(24 // batch, 6)
    keys = jax.random.split(key, iters)

    def enc_stream():
        fetcher = ThreadPoolExecutor(1)
        yc, fut = y_cond, None
        try:
            for i in range(iters):
                pk_buf, yc = bench_encode(x, yc, keys[i])  # async dispatch
                nfut = fetcher.submit(lambda a: np.asarray(a), pk_buf)
                if fut is not None:
                    yield encode_host(fut.result())
                fut = nfut
            yield encode_host(fut.result())
        finally:
            fetcher.shutdown(wait=False)

    t0 = time.perf_counter()
    x_hat = None
    for x_hat, _ in pipe.decode_frames(enc_stream(), y_cond):
        pass
    jax.block_until_ready(x_hat)
    elapsed = time.perf_counter() - t0

    bytes_down = layout.total
    bytes_up = payload.nbytes
    return {
        "fps": batch * iters / elapsed,
        "bpp": bpp,
        "stage_ms": {
            k: round(1e3 * float(np.median(v)) / batch, 2)
            for k, v in stages.items()
        },
        "bytes_per_frame": {
            "down": bytes_down // batch,
            "up": bytes_up // batch,
        },
    }


def run_device_only(batch: int, frames: int = 8, dtype=None) -> dict:
    """Pure device fps: the full codec math (g_a → encode expr → symbols →
    params → reconstruct → g_s) chained over `frames` P-frames inside ONE
    jit — no host boundary, the framework's intrinsic speed. (Round 2's
    number excluded g_a — the encode-side pixel transform — and read 55
    fps; the encode+decode claim requires it.)

    dtype=jnp.bfloat16 runs the transform/entropy nets on the MXU at bf16
    (encoder and decoder share the same nets, so the codec stays
    self-consistent; quantization and likelihood math stay f32)."""
    x, imodel, stem, pipe, y_cond0 = build(batch)
    if dtype is not None:
        cast = lambda p: p.astype(dtype)  # noqa: E731
        imodel.params = jax.tree_util.tree_map(cast, imodel.params)
        stem.params = jax.tree_util.tree_map(cast, stem.params)
    medians = jnp.asarray(stem.tables["entropy_bottleneck"].medians,
                          jnp.float32)
    table = stem.tables["gaussian_conditional"].scale_table

    def one_frame(y_cond, key):
        # per-step jitter defeats loop-invariant hoisting of the analysis
        xk = x + jax.random.normal(key, (1, 1, 1, 3), jnp.float32) * 1e-6
        y_ga = imodel._apply(
            xk if dtype is None else xk.astype(dtype), method="analysis"
        )[0]
        y_cond_c = y_cond if dtype is None else y_cond.astype(dtype)
        z = stem._apply(y_cond_c, y_cond_c, method="hyper_encode")
        z32 = z.astype(jnp.float32)
        z_sym = jnp.round(z32 - medians)
        z_hat = z_sym + medians
        if dtype is not None:
            z_hat = z_hat.astype(dtype)
        scales, means = stem._apply(z_hat, y_cond_c, method="entropy_params")
        scales = scales.astype(jnp.float32)
        means = means.astype(jnp.float32)
        sigma = jnp.clip(jnp.abs(scales), 0.11, 256.0)
        y_cur = (means + sigma * jax.random.normal(key, means.shape)
                 + 1e-30 * jnp.mean(y_ga.astype(jnp.float32)))
        from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

        y_sym, idx = pk.quantize_and_index(y_cur, means, scales, table)
        y_hat = y_sym.astype(jnp.float32) + means
        x_hat = imodel._apply(
            y_hat if dtype is None else y_hat.astype(dtype), method="get_x"
        )
        return y_hat, x_hat, idx

    def gop(y_cond, key):
        def body(carry, k):
            y_cond = carry
            y_hat, x_hat, idx = one_frame(y_cond, k)
            return y_hat, (jnp.mean(x_hat), jnp.sum(idx.astype(jnp.int32)))

        keys = jax.random.split(key, frames)
        _, (xs, _) = jax.lax.scan(body, y_cond, keys)
        return xs

    gop_fn = jax.jit(gop)
    out = gop_fn(y_cond0, jax.random.PRNGKey(3))
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = gop_fn(y_cond0, jax.random.PRNGKey(4 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    res = {"fps": batch * frames * reps / dt,
           "ms_per_frame": round(1e3 * dt / (batch * frames * reps), 2),
           # ADVICE r3: tag the measurement with its dtype so _emit (and
           # the resume path) can never mislabel a bf16 run as f32
           "dtype": "bf16" if dtype is not None else "f32"}
    try:
        # XLA's cost_analysis does not count conv custom-calls inside the
        # scan (tools/roofline.py::analytic_flops) — report both it and the
        # architecture-derived count; MFU uses the analytic one.
        cost = gop_fn.lower(y_cond0, jax.random.PRNGKey(3)).compile()
        flops = cost.cost_analysis()["flops"]
        from tools.roofline import analytic_flops

        per_frame_xla = flops / (batch * frames)
        per_frame = analytic_flops(1)["full_P_chain"] + 10e9  # + entropy nets
        tflops = per_frame / (res["ms_per_frame"] * 1e-3) / 1e12
        res["gflops_per_frame_xla"] = round(per_frame_xla / 1e9, 1)
        res["gflops_per_frame"] = round(per_frame / 1e9, 1)
        res["achieved_tflops"] = round(tflops, 1)
        # v5e peak ≈ 197 TFLOP/s bf16 / ~49 f32 (f32 convs lower to 1-pass
        # bf16 MXU matmuls under JAX's default precision, so bf16 peak is
        # the honest ceiling for both dtypes)
        res["mfu_f32"] = round(tflops / 49.0, 3)
        res["mfu_bf16_peak"] = round(tflops / 197.0, 3)
    except Exception:
        pass
    return res


def run_wavefront(budget_left, tile=None) -> dict:
    """Flagship SpatioTemporalPriorModel_Res (README.md:115): wavefront AR
    codec at 1080p — honest single-frame number through this tunnel.
    tile=(th, tw) measures the tiled fast format (context resets at tile
    borders; all tiles decode in the same round)."""
    stem = realistic_stem(variant="res", wavefront_tile=tile)
    y_shape = (1, H // 16, W // 16, M)
    y_cond = 0.5 * jax.random.normal(jax.random.PRNGKey(5), y_shape)
    sigma = 0.2
    y_cur = y_cond + sigma * jax.random.normal(jax.random.PRNGKey(6), y_shape)

    # warm the jits (wavefront scan compiles are minutes through the tunnel)
    enc = stem.compress(y_cur, y_cond)
    dec = stem.decompress(enc["strings"], tuple(enc["shape"]), y_cond)
    jax.block_until_ready(dec["y_hat"])

    stem._codec_stats = stats = {}
    t0 = time.perf_counter()
    enc = stem.compress(y_cur, y_cond)
    enc_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    dec = stem.decompress(enc["strings"], tuple(enc["shape"]), y_cond)
    dec_t = time.perf_counter() - t0
    jax.block_until_ready(dec["y_hat"])
    stem._codec_stats = None
    # decode-correctness tripwire: ŷ differs from y by at most quantization
    # error (~¼ mean abs) + the prior-mean shift; a stream/container
    # mismatch decodes garbage symbols and blows well past 1.0 (this is the
    # check that was missing while rounds 2-3 timed a mis-paired
    # interleaved-container decode)
    dec_err = float(jnp.mean(jnp.abs(dec["y_hat"] - y_cur)))
    if dec_err > 1.0:
        raise RuntimeError(
            f"wavefront decode insane: mean|ŷ−y| = {dec_err:.3f}"
        )
    nb = sum(len(s) for g in enc["strings"] for s in g)
    th, tw = tile if tile else (H // 16, W // 16)
    n_rounds = 3 * (th - 1) + tw  # ar_wavefront.wavefront_tables
    per_round_ms = 1e3 * dec_t / n_rounds
    # true per-round device cost: the whole wavefront recursion as ONE
    # lax.scan dispatch (tunnel RPC amortizes over all rounds), replacing
    # the subtract-the-RPC guess for the projection
    dev_round_measured = None
    enc_scan_measured = None
    if tile is not None:
        try:
            dev_round_measured = measure_wavefront_rounds(stem, tile)
        except Exception:
            pass
        try:
            enc_scan_measured = measure_wavefront_encode(stem, tile)
        except Exception:
            pass
    # PCIe projection, component-wise from the codec-stats split
    # (stem._codec_stats): decode round = fused dispatch + u8 idx fetch +
    # host rANS, strictly serial (AR dependency); through this tunnel each
    # round pays ~2 RPCs of latency that a PCIe host doesn't.
    rpc_ms = 35.0
    host_dec_ms = 1e3 * stats.get("host_rans_s", 0.0)
    # host rANS for the projection: the standalone measurement when main()
    # took one (in-situ shares the core with the tunnel client's I/O threads
    # and reads ~2x high), charged per-round-call overhead for this tile
    if _WF_HOST is not None:
        # dec_ms was measured as a 4-round split, so only rounds beyond
        # those 4 add per-call overhead
        host_dec_pcie = (_WF_HOST["dec_ms"]
                         + max(n_rounds - 4, 0)
                         * _WF_HOST["dec_round_call_us"] / 1e3)
        enc_host_pcie = _WF_HOST["enc_ms"]
    else:
        host_dec_pcie = host_dec_ms
        enc_host_pcie = None  # filled from in-situ below
    dev_round_ms = 1e3 * stats.get("device_s", 0.0) / n_rounds
    if dev_round_measured is not None:
        dev_round_pcie = dev_round_measured
    else:
        dev_round_pcie = max(dev_round_ms - 2 * rpc_ms, 0.4)
    pcie_dec_ms = n_rounds * (dev_round_pcie + 0.6) + host_dec_pcie
    # encode: one scan dispatch + the sym/idx plane fetch (i16 + u8 since the
    # narrow-dtype encoder; the model records the actual bytes) + host rANS.
    # Device cost of the scan is MEASURED when possible (the tunnel-subtract
    # guess mispriced tiled configs); the fetch is re-priced tunnel → PCIe.
    enc_dev_s = stats.get("enc_device_s", 0.0)
    enc_host_ms = 1e3 * stats.get("enc_host_s", 0.0)
    if enc_host_pcie is None:
        enc_host_pcie = enc_host_ms
    fetch_bytes = stats.get(
        "enc_fetch_bytes", 3 * (H // 16) * (W // 16) * M
    )
    fetch_pcie_ms = fetch_bytes / (PCIE_GBPS * 1e9) * 1e3
    if enc_scan_measured is not None:
        enc_dev_pcie = enc_scan_measured + fetch_pcie_ms
    else:
        enc_dev_pcie = max(
            1e3 * enc_dev_s - fetch_bytes / 25e6 * 1e3 - 2 * rpc_ms, 4.0
        ) + fetch_pcie_ms
    return {
        "fps": 1.0 / (enc_t + dec_t),
        "enc_s": round(enc_t, 2),
        "dec_s": round(dec_t, 2),
        "decode_mean_abs_err": round(dec_err, 4),
        "bpp": round(nb * 8 / (H * W), 4),
        "decode_rounds": n_rounds,
        "per_round_ms": round(per_round_ms, 2),
        "device_round_ms_measured": (
            round(dev_round_measured, 3)
            if dev_round_measured is not None else None
        ),
        "enc_scan_ms_measured": (
            round(enc_scan_measured, 2)
            if enc_scan_measured is not None else None
        ),
        "enc_fetch_bytes": int(fetch_bytes),
        "stage_ms": {
            "enc_device_tunnel": round(1e3 * enc_dev_s, 1),
            "enc_host_rans": round(enc_host_ms, 1),
            "dec_device_tunnel": round(1e3 * stats.get("device_s", 0.0), 1),
            "dec_host_rans": round(host_dec_ms, 1),
        },
        "pcie_projection": {
            "assumptions": "LATENT-codec projection (z decode, prior_feats "
                           "and the shared g_a/g_s pixel transforms are "
                           "excluded — see device_only for their cost; "
                           "g_s of frame k overlaps rounds of k+1 in a "
                           "pipelined server). Per-round device cost = "
                           "measured one-dispatch lax.scan over all rounds "
                           "(device_round_ms_measured) when available, else "
                           "measured round minus 2x35 ms tunnel RPC (floor "
                           "0.4 ms); + 0.6 ms dispatch+transfer per round; "
                           "host rANS from the STANDALONE measurement "
                           "(wavefront_host_coder_standalone — in-situ "
                           "timings share the core with the tunnel client "
                           "and read ~2x high), serial with rounds (AR "
                           "dependency), + measured per-round-call overhead; "
                           "encode fetch re-priced from ~25 MB/s tunnel to "
                           "PCIe",
            "dec_ms": round(pcie_dec_ms, 1),
            "enc_ms": round(enc_dev_pcie + enc_host_pcie, 1),
            "dec_fps": round(1e3 / pcie_dec_ms, 1),
            "enc_dec_fps": round(
                1e3 / (pcie_dec_ms + enc_dev_pcie + enc_host_pcie), 1
            ),
        },
        "pcie_projection_fps": round(1e3 / pcie_dec_ms, 2),
    }


def measure_wavefront_rounds(stem, tile, streams: int = 1) -> float:
    """True device cost of ONE wavefront decode round, measured by running
    the full fused write+params recursion as a single lax.scan dispatch
    (the per-round tunnel RPC amortizes away). Symbols are zeros — the
    round's compute (masked-conv AR step over all tiles + scatter/gather)
    is data-independent.

    ``streams>1`` batches independent serving streams along the tile axis
    (the AR dependency is intra-frame only; cross-stream rounds are
    embarrassingly parallel, exactly like the transforms that already batch
    across streams in the full-stack projection). Returns the LATENCY of
    one batched round — callers divide by ``streams`` for per-frame cost."""
    from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

    hgt, wid, m = H // 16, W // 16, M
    th, tw, nt = stem._tile_dims(hgt, wid)
    zt = stem.tables["entropy_bottleneck"]
    z_hat = jnp.zeros((streams, hgt // 4, wid // 4, zt.rows), jnp.float32)
    y_cond = jnp.zeros((streams, hgt, wid, m), jnp.float32)
    priors = stem._prior_feats_fn()(z_hat, y_cond)
    if nt > 1:
        priors = wf.tile_plane(priors, th, tw)
    coords, valid, _, params_step, _, fused_step = stem._wavefront_setup(
        th, tw
    )
    T, L = coords.shape[0], coords.shape[1]
    target_pad = jnp.zeros((streams * nt, th + 4, tw + 4, m), jnp.float32)
    sym = jnp.zeros((T - 1, streams * nt, L, m), jnp.float32)

    def all_rounds(tp, priors, sym):
        means, idx = params_step(tp, priors, coords[0])

        def body(carry, inp):
            tp, mn = carry
            ct, vt, s, cn = inp
            tp, mn, idx = fused_step(tp, priors, ct, vt, s, mn, cn)
            return (tp, mn), jnp.sum(idx)

        (tp, mn), outs = jax.lax.scan(
            body, (tp, means),
            (coords[:-1], valid[:-1], sym, coords[1:]),
        )
        return tp, outs

    fn = jax.jit(all_rounds)
    out = fn(target_pad, priors, sym)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(target_pad, priors, sym)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return 1e3 * dt / (reps * (T - 1))


def measure_wavefront_encode(stem, tile, streams: int = 1) -> float:
    """True device cost of the full wavefront ENCODER scan, one jitted
    dispatch (mirrors measure_wavefront_rounds for the decode side): the
    tunnel hides it behind RPC + the sym/idx plane fetch, which a PCIe host
    pays at 16 GB/s instead. ``streams>1`` batches independent serving
    streams (returns the batched latency; divide for per-frame cost)."""
    from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

    hgt, wid, m = H // 16, W // 16, M
    th, tw, nt = stem._tile_dims(hgt, wid)
    zt = stem.tables["entropy_bottleneck"]
    z_hat = jnp.zeros((streams, hgt // 4, wid // 4, zt.rows), jnp.float32)
    y_cond = jnp.zeros((streams, hgt, wid, m), jnp.float32)
    priors = stem._prior_feats_fn()(z_hat, y_cond)
    target = jnp.zeros((streams, hgt, wid, m), jnp.float32)
    if nt > 1:
        priors = wf.tile_plane(priors, th, tw)
        target = wf.tile_plane(target, th, tw)
    coords, valid, encoder, *_ = stem._wavefront_setup(th, tw)
    out = encoder(target, priors, coords, valid)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = encoder(target, priors, coords, valid)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / reps


def _scan_ms(fn, x0, iters: int = 6, reps: int = 3) -> float:
    """Per-iteration ms of fn folded into one jitted lax.scan (the tunnel
    memoizes identical dispatches and its RPC floor hides sub-40 ms stages;
    scan-folding with a perturbed carry measures true device cost —
    tools/roofline.py::measure, without its stdout prints)."""

    def scan_fn(x):
        def body(carry, _):
            y = fn(carry)
            flat = sum(jnp.mean(jnp.asarray(v, jnp.float32))
                       for v in jax.tree_util.tree_leaves(y))
            return (carry + (1e-20 * flat).astype(carry.dtype)), flat

        _, outs = jax.lax.scan(body, x, None, length=iters)
        return outs

    jfn = jax.jit(scan_fn)
    out = jfn(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(x0)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / (reps * iters)


def _measure_z_coder(stem) -> dict:
    """Standalone host cost of the hyper-latent (z) enc+dec at 1080p: the
    wavefront serial path pays z decode before round 0."""
    from spatiotemporalentropymodel_tpu.entropy import base as eb

    zt = stem.tables["entropy_bottleneck"]
    shape = (1, H // 64, W // 64, zt.rows)
    z_idx = eb.bottleneck_indexes(shape, zt.rows)
    z_sym = np.zeros(shape, np.int32)  # converged model: z ≈ all-median

    def t3(fn):
        fn(), fn()
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            vals.append(time.perf_counter() - t0)
        return r, round(1e3 * float(np.median(vals)), 2)

    s, enc_ms = t3(lambda: eb.compress(z_sym, z_idx, zt, stem.coder))
    _, dec_ms = t3(lambda: eb.decompress(s, z_idx, zt, stem.coder))
    return {"enc_ms": enc_ms, "dec_ms": dec_ms}


def _build_wavefront_server(tile, streams: int):
    """Shared setup for the pipelined wavefront serving benches: realistic
    stem (bf16 serving dtype), I-model transforms, the library server
    (eval/pipeline.py::WavefrontVideoPipeline) and the synthetic-rate y_cur
    producer (runs g_a at the serving batch for its real cost; the coded
    latent is y_cond + 0.2·noise so the rate point is controlled — the
    trained-weights sections cover the real-latent rate)."""
    from spatiotemporalentropymodel_tpu.eval.pipeline import (
        WavefrontVideoPipeline,
    )

    stem = realistic_stem(variant="res", wavefront_tile=tile)
    stem.set_compute_dtype(jnp.bfloat16)
    imodel = MeanScaleHyperprior(192, M)
    imodel.init(jnp.zeros((1, 64, 64, 3)))
    pipe = WavefrontVideoPipeline(imodel, stem)
    y_shape = (streams, H // 16, W // 16, M)
    y_cond0 = 0.5 * jax.random.normal(jax.random.PRNGKey(5), y_shape)
    x_pix = jax.random.uniform(jax.random.PRNGKey(11), (streams, H, W, 3),
                               jnp.float32)

    def _y_cur(x, y_cond, key):
        y_ga = imodel._apply(x, method="analysis")[0]
        return (y_cond + 0.2 * jax.random.normal(key, y_cond.shape)
                + 1e-30 * jnp.mean(y_ga))

    return pipe, stem, imodel, jax.jit(_y_cur), x_pix, y_cond0


def _run_server_loop(pipe, y_cur_fn, x_pix, y_cond0, frames: int):
    """Timed pipelined GOP loop through the library server. Returns
    (wall_s, stream_bytes, final ŷ carry, last y_cur)."""
    keys = jax.random.split(jax.random.PRNGKey(13), frames)
    y_cond, x_futs, nb = y_cond0, [], 0
    t0 = time.perf_counter()
    for k in range(frames):
        y_cur = y_cur_fn(x_pix, y_cond, keys[k])
        enc, y_cond, x_fut = pipe.serve_latent(y_cur, y_cond, frame=k)
        nb += sum(len(s) for g in enc["strings"] for s in g)
        x_futs.append(x_fut)  # async g_s: overlaps frame k+1's rounds
    jax.block_until_ready((x_futs[-1], y_cond))
    return time.perf_counter() - t0, nb, y_cond, y_cur


def run_wavefront_pipelined(tile=(1, 4), frames: int = 3) -> dict:
    """VERDICT r3 #2: the pipelined GOP server loop the wavefront projections
    assume, MEASURED end-to-end — per frame: g_a of the pixel frame (on the
    encode path of y_cur), z coding, the tiled wavefront rounds with host
    rANS, and g_s of the decoded ŷ dispatched ASYNC so it overlaps the next
    frame's rounds (x̂ hangs off the ŷ recurrence; only ŷ is the carry,
    matching /root/reference/compressai/models/spatiotemporalpriors.py:729-768
    where the reconstruction is likewise off the conditioning path).

    Reports the measured tunnel wall-clock plus a FULL-STACK PCIe projection
    (g_a + HE/priors + encode scan + rounds + host rANS + g_s — not the
    latent-only projection of run_wavefront), from components each measured
    scan-folded on this run:
      - serial critical path (the ŷ recurrence a stream cannot escape):
        z decode + priors dispatch + rounds x (device round + handoff) +
        host rANS decode (serial with rounds, AR dependency)
      - device busy/frame: g_a + g_s (bf16, batch-4 multi-stream serving:
        transforms batch across streams while rounds stay per-stream) +
        encode scan + priors + rounds device math
      - host busy/frame: wavefront rANS enc+dec + z enc+dec
    full-stack fps = 1e3 / max(serial, device_busy + PCIe transfer, host).

    The stem serves at bf16 (set_compute_dtype) like the transforms it is
    priced next to: the AR rounds' masked-conv+EPM math runs on the MXU at
    its native dtype while quantize/CDF-index stay f32 islands, so the
    bitstream round-trips exactly (tests/test_bf16_serving.py::
    test_stem_bf16_roundtrip[res] pins this on the wavefront path).

    The serving loop itself is the library's WavefrontVideoPipeline
    (eval/pipeline.py, VERDICT r4 #4) — this function is setup + timing."""
    pipe, stem, imodel, y_cur_fn, x_pix, y_cond0 = _build_wavefront_server(
        tile, streams=1
    )

    # warm every jit in the loop (wavefront scan compiles are minutes here)
    y_cur = y_cur_fn(x_pix, y_cond0, jax.random.PRNGKey(12))
    _, _, xh = pipe.serve_latent(y_cur, y_cond0)
    jax.block_until_ready(xh)

    # measured pipelined GOP through the tunnel
    stem._codec_stats = stats = {}
    wall, nb, y_cond, y_cur = _run_server_loop(
        pipe, y_cur_fn, x_pix, y_cond0, frames
    )
    stem._codec_stats = None
    dec_err = float(jnp.mean(jnp.abs(y_cond - y_cur)))
    if dec_err > 1.0:
        raise RuntimeError(
            f"pipelined decode insane: mean|ŷ−y| = {dec_err:.3f}"
        )

    # scan-folded device components, batched across S independent serving
    # streams (the AR dependency is intra-frame; cross-stream rounds are
    # embarrassingly parallel, like the transforms below). Batched latency
    # is what one stream waits per round; /S is the per-frame device cost.
    th, tw = tile
    n_rounds = 3 * (th - 1) + tw
    S = 4
    dev_round_lat = measure_wavefront_rounds(stem, tile, streams=S)
    enc_scan_lat = measure_wavefront_encode(stem, tile, streams=S)
    dev_round = dev_round_lat / S
    enc_scan = enc_scan_lat / S
    zt = stem.tables["entropy_bottleneck"]
    zS = jnp.zeros((S, H // 64, W // 64, zt.rows), jnp.float32)
    y_condS = jnp.zeros((S, H // 16, W // 16, M), jnp.float32)
    prior_lat = _scan_ms(
        lambda z: stem._apply(z, y_condS, method="prior_feats"), zS
    )
    prior_ms = prior_lat / S
    # bf16 transforms at serving batch 4 (multi-stream: transforms batch
    # across streams); per-frame = /4
    b4 = 4
    im16 = MeanScaleHyperprior(192, M)
    im16.init(jnp.zeros((1, 64, 64, 3)))
    im16.params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), imodel.params
    )
    x4 = jax.random.uniform(jax.random.PRNGKey(14), (b4, H, W, 3),
                            jnp.float32).astype(jnp.bfloat16)
    y4 = (0.5 * jax.random.normal(
        jax.random.PRNGKey(15), (b4, H // 16, W // 16, M),
    )).astype(jnp.bfloat16)
    ga_ms = _scan_ms(
        lambda v: im16._apply(v, method="analysis")[0], x4) / b4
    gs_ms = _scan_ms(lambda v: im16._apply(v, method="get_x"), y4) / b4
    z_coder = _measure_z_coder(stem)

    # full-stack PCIe projection from the measured components
    if _WF_HOST is not None:
        host_dec = (_WF_HOST["dec_ms"]
                    + max(n_rounds - 4, 0)
                    * _WF_HOST["dec_round_call_us"] / 1e3)
        host_enc = _WF_HOST["enc_ms"]
    else:  # in-situ fallback (reads ~2x high; flagged by absence of _WF_HOST)
        host_dec = 1e3 * stats.get("host_rans_s", 0.0) / frames
        host_enc = 1e3 * stats.get("enc_host_s", 0.0) / frames
    z_ms = z_coder["enc_ms"] + z_coder["dec_ms"]
    # per-round handoff at PCIe: dispatch + u8 idx fetch + i16 symbol upload
    # for all S streams (3 bytes/symbol, S x the single-stream plane)
    hgt, wid = H // 16, W // 16
    round_bytes = S * (hgt * wid * M // n_rounds) * 3
    handoff_ms = 0.6 + round_bytes / (PCIE_GBPS * 1e9) * 1e3
    # serial chain of the lockstep S-stream decode recurrence (a standalone
    # decoder's ŷ carry): per-stream host work serializes S x on one core,
    # device rounds run batched; aggregate per-frame slot = latency / S
    serial_lat = (S * (z_coder["dec_ms"] + host_dec) + prior_lat
                  + n_rounds * (dev_round_lat + handoff_ms))
    serial_ms = serial_lat / S
    fetch_bytes = stats.get("enc_fetch_bytes", 0) / frames
    xfer_ms = fetch_bytes / (PCIE_GBPS * 1e9) * 1e3
    device_busy = (ga_ms + gs_ms + enc_scan + prior_ms
                   + n_rounds * dev_round)
    host_busy = host_enc + host_dec + z_ms
    full_ms = max(serial_ms, device_busy + xfer_ms, host_busy)
    return {
        "tile": list(tile),
        "frames": frames,
        "fps_tunnel_measured": round(frames / wall, 3),
        "decode_mean_abs_err": round(dec_err, 4),
        "bpp": round(nb * 8 / (frames * H * W), 4),
        "decode_rounds": n_rounds,
        "overlap": "g_s of frame k dispatched async against frame k+1's "
                   "rounds; ŷ recurrence device-resident",
        "component_ms": {
            "ar_dtype": "bf16",
            "streams": S,
            "device_round_batched_latency": round(dev_round_lat, 3),
            "device_round": round(dev_round, 3),
            "enc_scan_batched_latency": round(enc_scan_lat, 2),
            "enc_scan": round(enc_scan, 2),
            "priors_batched_latency": round(prior_lat, 2),
            "priors": round(prior_ms, 2),
            "g_a_bf16_b4_per_frame": round(ga_ms, 2),
            "g_s_bf16_b4_per_frame": round(gs_ms, 2),
            "host_rans_enc": round(host_enc, 2),
            "host_rans_dec": round(host_dec, 2),
            "round_handoff": round(handoff_ms, 2),
            "z_coder": z_coder,
        },
        "pcie_projection_full_stack": {
            "assumptions": "FULL-STACK (g_a + HE/priors + encode scan + "
                           "rounds + host rANS + g_s), all components "
                           f"measured this run at {S}-stream serving: "
                           "transforms, AR rounds, encode scan and priors "
                           "all batch across independent streams (per-frame "
                           "cost = batched latency / streams; cross-stream "
                           "rounds carry no AR dependency); per-round "
                           "handoff = 0.6 ms dispatch + S-stream idx/symbol "
                           "planes at PCIe; host coder standalone, 1 core, "
                           "serialized across streams; throughput = slowest "
                           "of the lockstep serial ŷ recurrence (latency/S), "
                           "device busy, host busy",
            "serial_latency_ms": round(serial_lat, 2),
            "serial_ms": round(serial_ms, 2),
            "device_busy_ms": round(device_busy + xfer_ms, 2),
            "host_busy_ms": round(host_busy, 2),
            "fps": round(1e3 / full_ms, 1),
        },
    }


def run_wavefront_pipelined_multistream(tile=(1, 4), streams: int = 4,
                                        frames: int = 8) -> dict:
    """VERDICT r4 #3: the S-stream GOP server EXECUTED end-to-end — not
    component accounting. S independent GOP streams ride the batch axis
    through the library server (transforms at b=S; wavefront rounds stack
    the streams' tiles along the tile-batch axis bit-exactly,
    tests/test_pipeline.py::test_wavefront_pipeline_multistream_bitstreams_
    exact), `frames` frames per stream, through the tunnel, with host rANS
    genuinely serialized across the S streams inside each round (the
    lockstep schedule the round-4 projection assumed is now observed).

    The PCIe projection is re-derived from THIS run's observed schedule:
    observed rounds, observed S-stream host serialization (in-situ, with the
    standalone-coder correction for the shared core), device components
    scan-folded in the same run. It is quoted at the synthetic ~0.22 bpp
    rate AND at the trained-weights ~0.5 bpp host-coder rate (the hero
    λ=0.015 checkpoint serves at 0.512 bpp — detail.trained_weights)."""
    pipe, stem, imodel, y_cur_fn, x_pix, y_cond0 = _build_wavefront_server(
        tile, streams=streams
    )

    # warm every jit in the loop
    y_cur = y_cur_fn(x_pix, y_cond0, jax.random.PRNGKey(12))
    _, _, xh = pipe.serve_latent(y_cur, y_cond0)
    jax.block_until_ready(xh)

    stem._codec_stats = stats = {}
    wall, nb, y_cond, y_cur = _run_server_loop(
        pipe, y_cur_fn, x_pix, y_cond0, frames
    )
    stem._codec_stats = None
    dec_err = float(jnp.mean(jnp.abs(y_cond - y_cur)))
    if dec_err > 1.0:
        raise RuntimeError(
            f"4-stream pipelined decode insane: mean|ŷ−y| = {dec_err:.3f}"
        )
    total_frames = streams * frames
    th, tw = tile
    n_rounds = 3 * (th - 1) + tw

    # observed per-frame schedule through the tunnel (every stage stamped
    # inside the run; host timings share the core with the tunnel client)
    observed = {
        "enc_device_ms": round(
            1e3 * stats.get("enc_device_s", 0.0) / total_frames, 2),
        "enc_host_rans_ms": round(
            1e3 * stats.get("enc_host_s", 0.0) / total_frames, 2),
        "dec_device_rounds_ms": round(
            1e3 * stats.get("device_s", 0.0) / total_frames, 2),
        "dec_host_rans_ms": round(
            1e3 * stats.get("host_rans_s", 0.0) / total_frames, 2),
        "rounds_executed": stats.get("rounds", 0),
        "accounted_ms": round(
            1e3 * (stats.get("enc_device_s", 0.0)
                   + stats.get("enc_host_s", 0.0)
                   + stats.get("device_s", 0.0)
                   + stats.get("host_rans_s", 0.0)) / total_frames, 2),
        "wall_ms_per_frame": round(1e3 * wall / total_frames, 2),
    }

    # device components, scan-folded in this same run at the serving batch
    dev_round_lat = measure_wavefront_rounds(stem, tile, streams=streams)
    enc_scan_lat = measure_wavefront_encode(stem, tile, streams=streams)
    zt = stem.tables["entropy_bottleneck"]
    zS = jnp.zeros((streams, H // 64, W // 64, zt.rows), jnp.float32)
    y_condS = jnp.zeros((streams, H // 16, W // 16, M), jnp.float32)
    prior_lat = _scan_ms(
        lambda z: stem._apply(z, y_condS, method="prior_feats"), zS
    )
    im16 = MeanScaleHyperprior(192, M)
    im16.init(jnp.zeros((1, 64, 64, 3)))
    im16.params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), imodel.params
    )
    xS = x_pix.astype(jnp.bfloat16)
    yS = y_cond0.astype(jnp.bfloat16)
    ga_lat = _scan_ms(lambda v: im16._apply(v, method="analysis")[0], xS)
    gs_lat = _scan_ms(lambda v: im16._apply(v, method="get_x"), yS)
    z_coder = _measure_z_coder(stem)

    # per-round handoff at PCIe: dispatch + S-stream idx/symbol planes
    hgt, wid = H // 16, W // 16
    round_bytes = streams * (hgt * wid * M // n_rounds) * 3
    handoff_ms = 0.6 + round_bytes / (PCIE_GBPS * 1e9) * 1e3
    z_ms = z_coder["enc_ms"] + z_coder["dec_ms"]

    def project(wf_host):
        """PCIe projection of THIS schedule at a given host-coder profile:
        per GOP-step (S frames in lockstep), fps = S·1e3/max(paths)."""
        host_dec = (wf_host["dec_ms"]
                    + max(n_rounds - 4, 0)
                    * wf_host["dec_round_call_us"] / 1e3)
        host_enc = wf_host["enc_ms"]
        serial_lat = (streams * (z_coder["dec_ms"] + host_dec) + prior_lat
                      + n_rounds * (dev_round_lat + handoff_ms))
        device_lat = (ga_lat + gs_lat + enc_scan_lat + prior_lat
                      + n_rounds * dev_round_lat)
        host_lat = streams * (host_enc + host_dec + z_ms)
        fps = streams * 1e3 / max(serial_lat, device_lat, host_lat)
        return {
            "host_profile": wf_host.get("profile", "realistic"),
            "host_workload_bpp": wf_host.get("workload_bpp"),
            "serial_latency_ms": round(serial_lat, 2),
            "device_busy_latency_ms": round(device_lat, 2),
            "host_busy_latency_ms": round(host_lat, 2),
            "fps": round(fps, 1),
        }

    wf_host = _WF_HOST or measure_wavefront_host_coder()
    proj = project(wf_host)
    proj_trained = project(measure_wavefront_host_coder(profile="trained"))
    return {
        "tile": list(tile),
        "streams": streams,
        "frames": frames,
        "fps_tunnel_measured": round(total_frames / wall, 3),
        "decode_mean_abs_err": round(dec_err, 4),
        "bpp": round(nb * 8 / (total_frames * H * W), 4),
        "decode_rounds": n_rounds,
        "observed_schedule_ms_per_frame": observed,
        "component_ms": {
            "ar_dtype": "bf16",
            "device_round_batched_latency": round(dev_round_lat, 3),
            "enc_scan_batched_latency": round(enc_scan_lat, 2),
            "priors_batched_latency": round(prior_lat, 2),
            "g_a_batched_latency": round(ga_lat, 2),
            "g_s_batched_latency": round(gs_lat, 2),
            "round_handoff": round(handoff_ms, 2),
            "z_coder": z_coder,
        },
        "pcie_projection": {
            "assumptions": "re-derived from THIS run's observed S-stream "
                           "schedule: observed round count and S-fold host "
                           "serialization; device components scan-folded at "
                           "the serving batch in the same run; host coder "
                           "standalone (in-situ shares the core with the "
                           "tunnel client and reads ~2x high); per-round "
                           "handoff = 0.6 ms + S-stream planes at PCIe",
            "synthetic_rate": proj,
            "trained_rate": proj_trained,
        },
        "fps_pcie_projection": proj["fps"],
        "fps_pcie_projection_trained_rate": proj_trained["fps"],
    }


def run_charm(groups: int = 4) -> dict:
    """Beyond-reference channel-AR STEM (models/charm.py) at 1080p, with the
    same telemetry depth as the headline entry (VERDICT r2 #6): stage ms,
    link bytes, device-only cost and a PCIe projection."""
    from spatiotemporalentropymodel_tpu.models import (
        SpatioTemporalPriorModelChannelAR,
    )

    model = SpatioTemporalPriorModelChannelAR(
        groups=groups, entropy_bottleneck_channels=EBC, in_channels=M
    )
    y_shape = (1, H // 16, W // 16, M)
    d = jnp.zeros((1, 4, 4, M))
    model.init(d, d)
    model.params = jax.tree_util.tree_map(lambda p: p * 0.02, model.params)
    model.update()
    y_cond = 0.3 * jax.random.normal(jax.random.PRNGKey(7), y_shape)
    y_cur = y_cond + 0.2 * jax.random.normal(jax.random.PRNGKey(8), y_shape)

    enc = model.compress(y_cur, y_cond)  # warm compile
    dec = model.decompress(enc["strings"], tuple(enc["shape"]), y_cond,
                           transport_mode=enc["transport"],
                           counts=enc.get("counts"))
    jax.block_until_ready(dec["y_hat"])

    # stage-instrumented pass: encode = 1 dispatch + 1 fetch + host rANS;
    # decode = host rANS (all G groups, counts from the container) +
    # 1 payload upload + 1 dispatch (fetch-free)
    fused = model._fused_encode_sparse_fn()
    t0 = time.perf_counter()
    packed_dev = fused(y_cur, y_cond)
    jax.block_until_ready(packed_dev)
    enc_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    packed = np.asarray(packed_dev)
    enc_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    enc = model._compress_sparse(y_cur, y_cond)  # re-runs fused (cached jit)
    enc_host = time.perf_counter() - t0 - enc_dispatch - enc_fetch
    bytes_strings = sum(
        len(s) for g in enc["strings"][0] for s in g
    ) + sum(len(s) for s in enc["strings"][1])
    t0 = time.perf_counter()
    dec = model.decompress(enc["strings"], tuple(enc["shape"]), y_cond,
                           transport_mode=enc["transport"],
                           counts=enc.get("counts"))
    jax.block_until_ready(dec["y_hat"])
    dec_total = time.perf_counter() - t0

    # throughput pass (what the fps figure reports)
    t0 = time.perf_counter()
    enc = model.compress(y_cur, y_cond)
    enc_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    dec = model.decompress(enc["strings"], tuple(enc["shape"]), y_cond,
                           transport_mode=enc["transport"],
                           counts=enc.get("counts"))
    jax.block_until_ready(dec["y_hat"])
    dec_t = time.perf_counter() - t0
    dec_err = float(jnp.mean(jnp.abs(dec["y_hat"] - y_cur)))
    if dec_err > 1.0:  # same tripwire as run_wavefront
        raise RuntimeError(f"charm decode insane: mean|ŷ−y| = {dec_err:.3f}")

    # host rANS measured directly on the container streams (all G groups)
    from spatiotemporalentropymodel_tpu.entropy import transport as tp

    gt = model.tables["gaussian_conditional"]
    counts = np.asarray(enc["counts"], np.int32)
    n_g = (H // 16) * (W // 16) * model.module.group_size
    t0 = time.perf_counter()
    for g in range(groups):
        tp.decode_grouped_packed(
            [enc["strings"][0][0][g]], counts[:, g], n_g // 4, gt,
            model.coder,
        )
    host_dec_ms = 1e3 * (time.perf_counter() - t0)

    # device-only: the full charm codec math (hyper round + priors + G-group
    # recursion + reconstruct + g_a/g_s pixel transforms) chained over frames
    # in ONE jit — at batch 4 like the headline device_only (1080p convs at
    # b=1 run ~1.8x slower per frame; batching is the serving deployment)
    dev_b = 4
    imodel = MeanScaleHyperprior(192, M)
    imodel.init(jnp.zeros((1, 64, 64, 3)))
    x_px = jax.random.uniform(jax.random.PRNGKey(9), (dev_b, H, W, 3),
                              jnp.float32)
    y_cond_b = jnp.broadcast_to(y_cond, (dev_b, *y_cond.shape[1:]))
    device = run_device_only_charm(model, y_cond_b, imodel=imodel, x=x_px)
    n = int(np.prod(y_shape[1:]))
    bytes_down = packed.nbytes
    bytes_up = n // 8 + n // 4 + (H // 64) * (W // 64) * EBC
    host_ms = 2.0 * host_dec_ms  # encode ≈ decode cost (same symbol stream)
    xfer_ms = (bytes_down + bytes_up) / (PCIE_GBPS * 1e9) * 1e3
    dev_ms = device["ms_per_frame"]
    projected = 1e3 / (max(dev_ms, host_ms) + xfer_ms + 0.3)
    return {
        "fps": round(1.0 / (enc_t + dec_t), 3),
        "enc_s": round(enc_t, 2), "dec_s": round(dec_t, 2),
        "groups": groups,
        "bpp": round(bytes_strings * 8 / (H * W), 4),
        "stage_ms": {
            "enc_dispatch": round(1e3 * enc_dispatch, 1),
            "enc_fetch": round(1e3 * enc_fetch, 1),
            "enc_host": round(1e3 * max(enc_host, 0.0), 1),
            "dec_total": round(1e3 * dec_total, 1),
            "host_rans_dec_standalone": round(host_dec_ms, 1),
        },
        "bytes_per_frame": {"down": bytes_down, "up": bytes_up},
        "device_only": device,
        "pcie_projection": {
            "assumptions": "1 enc + 1 fetch-free dec dispatch per frame; "
                           "host coder (2x measured standalone G-group "
                           "decode) overlapped with device compute; PCIe "
                           f"{PCIE_GBPS:.0f} GB/s",
            "device_ms": dev_ms,
            "host_coder_ms": round(host_ms, 2),
            "transfer_ms": round(xfer_ms, 3),
            "projected_fps": round(projected, 1),
        },
    }


def run_device_only_charm(model, y_cond0, frames: int = 8,
                          imodel=None, x=None) -> dict:
    """Charm's intrinsic device speed: full codec math over `frames`
    P-frames in one jit (the charm analog of run_device_only — including
    the g_a/g_s pixel transforms when `imodel`/`x` are given, so the
    number is apples-to-apples with the headline device_only)."""
    medians = jnp.asarray(model.tables["entropy_bottleneck"].medians,
                          jnp.float32)
    gs = model.module.group_size

    def one_frame(y_cond, key):
        ga_term = 0.0
        if imodel is not None and x is not None:  # encode-side g_a
            xk = x + jax.random.normal(key, (1, 1, 1, 3), jnp.float32) * 1e-6
            ga_term = 1e-30 * jnp.mean(
                imodel._apply(xk, method="analysis")[0]
            )
        z = model._apply(y_cond, y_cond, method="hyper_encode")
        z_sym = jnp.round(z - medians)
        z_hat = z_sym + medians
        priors = model._apply(z_hat, y_cond, method="priors")
        target = 0.1 * jax.random.normal(key, y_cond.shape) + ga_term
        decoded = []
        for g in range(model.groups):
            ctx = (jnp.concatenate(decoded, axis=-1) if decoded
                   else target[..., :0])
            scales, means = model._apply(priors, ctx, g,
                                         method="group_params")
            t_g = target[..., g * gs:(g + 1) * gs]
            sym = jnp.round(t_g - means)
            decoded.append(model._apply(
                priors, ctx, sym + means, g, method="lrp_refine"
            ))
        target_hat = jnp.concatenate(decoded, axis=-1)
        y_hat = target_hat + y_cond if model.residual else target_hat
        stat = jnp.mean(jnp.abs(scales))
        if imodel is not None:  # decode-side pixel transform (g_s)
            stat = stat + 1e-30 * jnp.mean(
                imodel._apply(y_hat, method="get_x")
            )
        return y_hat, stat

    def gop(y_cond, key):
        def body(carry, k):
            y_hat, s = one_frame(carry, k)
            return y_hat, s

        keys = jax.random.split(key, frames)
        _, out = jax.lax.scan(body, y_cond, keys)
        return out

    gop_fn = jax.jit(gop)
    out = gop_fn(y_cond0, jax.random.PRNGKey(30))
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = gop_fn(y_cond0, jax.random.PRNGKey(31 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    n_frames = int(y_cond0.shape[0]) * frames * reps
    return {"fps": round(n_frames / dt, 1), "batch": int(y_cond0.shape[0]),
            "ms_per_frame": round(1e3 * dt / n_frames, 2)}


def run_trained_weights() -> dict:
    """VERDICT r2 #2: put TRAINED weights (tools/bakeoff.py artifacts)
    through the real 1080p serving pipeline and report the symbol statistics
    next to realistic_stem's synthetic ones — validating (or correcting) the
    synthetic workload the headline number uses. Returns {} when no trained
    checkpoints are committed."""
    import glob

    import tools.bakeoff as bk
    from spatiotemporalentropymodel_tpu.entropy import transport as tp
    from spatiotemporalentropymodel_tpu.eval.metrics import psnr
    from spatiotemporalentropymodel_tpu.eval.pipeline import StemVideoPipeline
    from spatiotemporalentropymodel_tpu.models import SpatioTemporalPriorModel

    here = os.path.dirname(os.path.abspath(__file__))
    # preferred: the production-capacity hero checkpoint (VERDICT r3 #5,
    # tools/bakeoff.py hero — M matches the serving pipeline's 192)
    hero_meta = None
    for hero_dir in (os.path.join(here, "artifacts", "hero"),
                     os.path.join(here, "artifacts", "trained", "hero")):
        mp = os.path.join(hero_dir, "hero.json")
        if os.path.exists(mp):
            with open(mp) as f:
                hero_meta = json.load(f)
            break
    if hero_meta is not None:
        cfg = hero_meta["config"]
        bk.N, bk.M, bk.EBC = cfg["N"], cfg["M"], cfg["EBC"]
        lmb = cfg["lmbda"]
        workdir = hero_dir
        i_model = bk._load_i(workdir, lmb)
        stem = bk._load_p(
            workdir, f"without_spm_{lmb}",
            lambda: SpatioTemporalPriorModel(
                variant="without_spm",
                entropy_bottleneck_channels=cfg["EBC"],
                in_channels=cfg["M"],
            ),
        )
        src = (f"tools/bakeoff.py hero λ={lmb} (N={cfg['N']}, "
               f"M={cfg['M']}, EBC={cfg['EBC']}); "
               f"GOP-eval {hero_meta.get('eval')}")
        if hero_meta.get("rd_points"):
            src += f"; RD curve {hero_meta['rd_points']}"
    else:
        workdir = os.path.join(here, "artifacts", "bakeoff")
        cands = sorted(
            glob.glob(os.path.join(workdir, "ckpt_p_without_spm_*")))
        if not cands:
            # fresh container: the live bake-off tree is gitignored, but
            # compact .pkl.gz copies are committed under artifacts/trained/
            workdir = os.path.join(here, "artifacts", "trained")
            cands = sorted(
                glob.glob(os.path.join(workdir, "ckpt_p_without_spm_*"))
            )
        if not cands:
            return {}
        lmbdas = sorted(
            float(os.path.basename(c).split("_")[-1].split(".pkl", 1)[0])
            for c in cands
        )
        lmb = lmbdas[0]  # lowest rate point = the published operating range
        i_model = bk._load_i(workdir, lmb)
        stem = bk._load_p(
            workdir, f"without_spm_{lmb}",
            lambda: SpatioTemporalPriorModel(
                variant="without_spm", entropy_bottleneck_channels=bk.EBC,
                in_channels=bk.M,
            ),
        )
        src = (f"tools/bakeoff.py without_spm λ={lmb} "
               f"(N={bk.N}, M={bk.M}, EBC={bk.EBC})")
    pipe = StemVideoPipeline(i_model, stem, transport_mode="sparse")

    rng = np.random.default_rng(1)
    n_frames = 5
    frames = [
        jnp.asarray(f, jnp.float32)[None] / 255.0
        for f in bk._structured_frames(rng, n_frames=n_frames, hw=(H, W))
    ]
    # I-frame bootstrap, then stream the P-frames
    enc0 = i_model.compress(frames[0])
    dec0 = i_model.decompress(enc0["strings"], tuple(enc0["shape"]))
    y_cond = dec0["y_hat"]

    # symbol statistics from the encoder's own sparse buffer (frame 1)
    _, _, packed = pipe._encode_sparse(frames[1], y_cond)
    shape4 = (1, H // 16, W // 16, bk.M)
    layout = pipe._sparse_layout(shape4)
    planes = tp.unpack_encode(np.asarray(packed), layout)
    n = layout.n
    # under overflow the sparse planes are zeroed (transport.py:94-100) and
    # the pipeline re-encodes dense — the sparse stats would read 0/∞;
    # report them as None instead of fabricating a perfect-sparsity story
    nz = None if planes.overflow else int((planes.y_sorted != 0).sum())
    counts = np.asarray(planes.counts)[0]
    rows_used = int((counts > 0).sum())
    # row-count distribution: share of symbols in the most-used rows
    share = np.sort(counts)[::-1].cumsum() / max(counts.sum(), 1)

    # warm the decode jit, then stream enc+dec for the throughput figure
    enc, y_hat = pipe.encode_frame(frames[1], y_cond)
    x_hat, _ = pipe.decode_frame(enc, y_cond=y_cond)
    jax.block_until_ready(x_hat)
    t0 = time.perf_counter()
    total_bytes = 0
    psnrs = []
    yc = y_cond
    for t in range(1, n_frames):
        enc, y_hat = pipe.encode_frame(frames[t], yc)
        x_hat, yc = pipe.decode_frame(enc, y_cond=yc)
        total_bytes += sum(
            len(s) for grp in enc["strings"] for s in grp
        ) + np.asarray(enc.get("counts", np.empty(0))).nbytes
        psnrs.append(float(psnr(frames[t], x_hat)))
    jax.block_until_ready(x_hat)
    dt = time.perf_counter() - t0
    return {
        "source": src,
        "fps_tunnel": round((n_frames - 1) / dt, 3),
        "bpp": round(total_bytes * 8 / ((n_frames - 1) * H * W), 4),
        "psnr_p_frames": round(float(np.mean(psnrs)), 2),
        "nonzero_frac": None if nz is None else round(nz / n, 4),
        "rows_used": rows_used,
        "rows_for_90pct_symbols": int(np.searchsorted(share, 0.9) + 1),
        "capacity_headroom": (None if nz is None
                              else round(layout.cap / max(nz, 1), 2)),
        "overflow": bool(planes.overflow),
    }


def _realistic_symbols(seed: int = 0, active_frac: float = 0.07,
                       sig_lo: float = 0.2, sig_hi: float = 1.8):
    """Realistic per-frame (symbols, indexes, tables) mirroring
    realistic_stem's channel statistics: ~93% of channels at the σ floor,
    the rest log-uniform in [sig_lo, sig_hi]; symbols ~ round(N(0, σ)).
    Defaults match the synthetic ~0.12 bpp workload; the trained-rate
    profile (measure_wavefront_host_coder(profile="trained")) widens σ to
    land at the hero checkpoint's ~0.5 bpp serving rate."""
    from spatiotemporalentropymodel_tpu.entropy.gaussian import update_tables

    tables = update_tables()
    hw = (H // 16) * (W // 16)
    rng = np.random.default_rng(seed)
    sigma_c = np.full(M, 0.05)
    active = rng.random(M) < active_frac
    sigma_c[active] = np.exp(rng.uniform(np.log(sig_lo), np.log(sig_hi),
                                         active.sum()))
    sigma = np.broadcast_to(sigma_c, (hw, M)).reshape(-1)
    table = np.asarray(tables.scale_table)
    idx = np.searchsorted(  # build_indexes semantics (entropy/gaussian.py)
        table[:-1], np.maximum(sigma, table[0]), side="left"
    ).astype(np.int32)
    sym_flat = np.round(rng.normal(0.0, sigma)).astype(np.int32)
    return sym_flat, idx, tables


def measure_host_coder() -> dict:
    """Host-coder cost measured STANDALONE, before any device traffic.

    In-situ stage timings share the single core with the tunnel client's
    serialization/streaming threads and read 2-10x high; a real serving host
    gives the coder its own cores, so the PCIe projection uses this clean
    measurement (symbol statistics mirror the realistic workload: ~12%
    nonzeros, rows 0-30)."""
    from spatiotemporalentropymodel_tpu.entropy import transport as tp

    from spatiotemporalentropymodel_tpu.coders import get_coder

    coder = get_coder()
    sym_flat, idx, tables = _realistic_symbols()
    order = np.argsort(idx, kind="stable")
    counts = np.bincount(
        idx, minlength=tables.cdf.shape[0]
    ).astype(np.int32)[None]
    sym = sym_flat[order][None]
    n = sym.shape[1]

    def t3(fn):
        # two warmup calls: the first decode builds the 8 MB LUT and the
        # second still pays its first-touch page faults (764 ms / 477 ms
        # measured); steady state is what a serving loop sees
        fn(), fn()
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            vals.append(time.perf_counter() - t0)
        return r, round(1e3 * float(np.median(vals)), 2)

    s, enc_ms = t3(lambda: tp.encode_grouped(sym, counts, tables, coder))
    # serving decode is the FUSED path: rANS → (bitmask, compacted int8) in
    # one C pass — the dense symbol plane and pack_decode_payload no longer
    # exist on the hot path (rans.cpp::stem_decode_runs packed mode)
    cap = tp.sparse_capacity(n)
    packed, decpack_ms = t3(
        lambda: tp.decode_grouped_packed(s, counts, cap, tables, coder))
    if packed is None:  # non-native coder fallback
        y, dec_ms = t3(lambda: tp.decode_grouped(s, counts, tables, coder))
        _, pack_ms = t3(lambda: tp.pack_decode_payload(y, cap))
        decpack_ms = dec_ms + pack_ms
    return {"enc_ms": enc_ms, "dec_pack_ms": decpack_ms,
            "total_ms": round(enc_ms + decpack_ms, 2)}


# standalone wavefront host-coder measurement, filled by main() BEFORE any
# device traffic; run_wavefront's PCIe projection uses it instead of the
# in-situ stage timings (which share the one core with the tunnel client's
# I/O threads and read ~2x high even against the v1 standalone numbers —
# tools/wavefront_coder_bench.py)
_WF_HOST = None


def measure_wavefront_host_coder(profile: str = "realistic") -> dict:
    """Standalone v1 (lane-order) wavefront host-coder cost per 1080p frame:
    one indexed encode over the frame, stream decode split across rounds.
    The decode split itself is timing-neutral; the per-call overhead is
    measured separately (321-round split) so projections can charge
    dec_ms + rounds·call_us for any tile config.

    profile="trained" measures the same coder on a ~0.5 bpp symbol load
    (wide-σ channels) matching the hero checkpoint's 1080p serving rate
    (BENCH_SELF detail.trained_weights: 0.512 bpp), so multi-stream
    projections can be quoted at the trained rate (VERDICT r4 #3)."""
    from spatiotemporalentropymodel_tpu.coders import get_coder
    from spatiotemporalentropymodel_tpu.entropy import base as eb

    coder = get_coder()
    if profile == "trained":
        # calibrated: this lands at 0.530 bpp measured (hero serves at 0.512)
        sym, idx, tables = _realistic_symbols(
            seed=1, active_frac=0.20, sig_lo=1.0, sig_hi=32.0
        )
    else:
        sym, idx, tables = _realistic_symbols(seed=1)
    esym = eb.get_enc_table(tables, coder)
    lut = eb.get_lut(tables, coder)
    n = sym.size

    def t3(fn):
        fn(), fn()
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            vals.append(time.perf_counter() - t0)
        return r, 1e3 * float(np.median(vals))

    s, enc_ms = t3(lambda: coder.encode_with_indexes(
        sym, idx, tables.cdf, tables.cdf_length, tables.offset, esym=esym
    ))

    def dec(rounds: int):
        d = coder.make_stream_decoder(s)
        bounds = np.linspace(0, n, rounds + 1).astype(np.int64)
        return [
            d.decode(idx[bounds[t]:bounds[t + 1]], tables.cdf,
                     tables.cdf_length, tables.offset, lut=lut)
            for t in range(rounds)
        ]

    _, dec4_ms = t3(lambda: dec(4))
    _, dec321_ms = t3(lambda: dec(321))
    call_us = max(0.0, (dec321_ms - dec4_ms) / 317.0 * 1e3)
    return {
        "enc_ms": round(enc_ms, 2),
        "dec_ms": round(dec4_ms, 2),
        "dec_round_call_us": round(call_us, 1),
        "workload_bpp": round(len(s) * 8 / (H * W), 4),
        "profile": profile,
    }


def pcie_projection(pipe_res, device_res, host_coder) -> dict:
    """Component-wise projection for a PCIe-attached host: measured device
    math + standalone-measured host-coder time (overlapped with device) +
    measured bytes at PCIe bandwidth + small dispatch overhead."""
    host_ms = host_coder["total_ms"] + 2 * pipe_res["stage_ms"]["dec_z"]
    dev_ms = device_res["ms_per_frame"]
    xfer_ms = (
        (pipe_res["bytes_per_frame"]["down"] + pipe_res["bytes_per_frame"]["up"])
        / (PCIE_GBPS * 1e9) * 1e3
    )
    dispatch_ms = 0.3  # ~100 µs × 3 dispatches, PCIe-local
    frame_1core = max(dev_ms, host_ms) + xfer_ms + dispatch_ms
    # the interleaved-lane coder parallelizes across cores; this box has ONE
    # core (coders/build threading benches flat here) — a serving host has
    # many. 8 lanes is conservative for the measured per-core throughput.
    host_8core = host_ms / 8.0
    frame_8core = max(dev_ms, host_8core) + xfer_ms + dispatch_ms
    return {
        "assumptions": f"PCIe {PCIE_GBPS:.0f} GB/s, host coder overlapped "
                       "with device compute (double-buffered); coder cost is "
                       "the standalone measurement (in-situ stage timings "
                       "share this box's ONE core with the tunnel client's "
                       "I/O threads and read 5-10x high); serving hosts run "
                       "the interleaved rANS lanes across cores",
        "device_ms": dev_ms,
        "host_coder_ms_1core": round(host_ms, 2),
        "transfer_ms": round(xfer_ms, 3),
        "projected_fps_1core_host": round(1e3 / frame_1core, 1),
        "projected_fps_8core_host": round(1e3 / frame_8core, 1),
    }


def _device_reachable(timeout_s: float = 60.0) -> bool:
    """Probe the (remote) device in a SUBPROCESS — when the tunnel is down,
    jax.devices() hangs uninterruptibly, which would turn the whole bench
    into a silent timeout. A subprocess can be killed. 60 s is ~3x the
    observed healthy-tunnel handshake; a slower tunnel is as good as down
    for a budgeted run (VERDICT r3 #1)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# ---------------------------------------------------------------------------
# Un-killable emission (VERDICT r3 #1/#8). The driver must capture a headline
# JSON line no matter what hangs or kills us:
#   - every completed section refreshes an in-memory snapshot + BENCH_SELF.json
#     + artifacts/bench_last_validated.json (atomic, monotonically complete:
#     sections from an older snapshot are carried forward with a stale marker
#     instead of silently dropping);
#   - a watchdog THREAD prints the snapshot and exits 0 at the budget deadline
#     (tunnel RPCs release the GIL, so the watchdog runs even when the main
#     thread is stuck inside one);
#   - SIGTERM/SIGINT handlers print the snapshot before dying, so an external
#     `timeout N python bench.py` still yields a parsable stdout.
# Exactly ONE JSON line reaches stdout on every path.
# ---------------------------------------------------------------------------
_PREV_PAYLOAD: dict = {}
_PREV_DETAIL: dict = {}
_SNAPSHOT = None
_FINAL_DONE = False
_EMIT_LOCK = threading.Lock()

# detail keys derived from the CURRENT run's headline — never carried forward
_NON_CARRY = {
    "pipeline", "bpp", "per_batch_fps", "stage_ms_per_frame",
    "bytes_per_frame", "device", "environment_note", "device_only",
    "pcie_projection", "headline_stale", "carried_sections",
    "device_unreachable",
}


def _load_prev_payload() -> dict:
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("BENCH_SELF.json",
                 os.path.join("artifacts", "bench_last_validated.json")):
        try:
            with open(os.path.join(here, name)) as f:
                return json.load(f)
        except Exception:
            continue
    return {}


def _atomic_write(path: str, payload: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload + "\n")
    os.replace(tmp, path)


_STDOUT_CAP = 1900  # bytes; the driver keeps a 2000-char tail of stdout


def _compact_payload(payload: dict) -> str:
    """Collapse a full bench payload into the ONE stdout line (VERDICT r4 #1).

    The full detail dict (12+ KB with every section) lives in
    BENCH_SELF.json; stdout carries only the headline plus the handful of
    numbers the official record needs, hard-capped under _STDOUT_CAP so the
    driver's 2000-char tail capture always holds the complete line."""
    d = payload.get("detail") or {}
    c = {}
    for k in ("headline_stale", "device_unreachable", "error"):
        if k in d:
            c[k] = str(d[k])[:180]
    if "bpp" in d:
        c["bpp"] = d["bpp"]
    if isinstance(d.get("per_batch_fps"), dict):
        c["per_batch_fps"] = d["per_batch_fps"]
    dev = d.get("device_only")
    if not (isinstance(dev, dict) and "ms_per_frame" in dev):
        dev = d.get("device_only_b4_bf16")
    if isinstance(dev, dict) and "ms_per_frame" in dev:
        c["device_only"] = {k: dev[k] for k in
                            ("fps", "ms_per_frame", "dtype") if k in dev}
        if dev.get("stale"):
            c["device_only"]["stale"] = True
    ms4 = d.get("res_pipelined_4stream_measured")
    if isinstance(ms4, dict):
        c["full_stack_4stream"] = {
            k: ms4[k] for k in
            ("fps_tunnel_measured", "fps_pcie_projection",
             "fps_pcie_projection_trained_rate", "streams", "frames")
            if k in ms4}
        if ms4.get("stale"):
            c["full_stack_4stream"]["stale"] = True
    fs = d.get("res_pipelined_full_stack")
    if isinstance(fs, dict):
        proj = fs.get("pcie_projection_full_stack") or {}
        c["full_stack"] = {"tile": fs.get("tile"),
                           "fps_tunnel": fs.get("fps_tunnel_measured"),
                           "fps_pcie_projection": proj.get("fps")}
        if fs.get("stale"):
            c["full_stack"]["stale"] = True
    tw = d.get("trained_weights")
    if isinstance(tw, dict):
        c["trained_weights"] = {k: tw[k] for k in
                                ("bpp", "psnr_p_frames") if k in tw}
        if tw.get("stale"):
            c["trained_weights"]["stale"] = True
    p720 = d.get("per_batch_720p")
    if isinstance(p720, dict):
        pts = {b: v.get("fps") for b, v in p720.items()
               if isinstance(v, dict)}
        if pts:
            c["per_batch_720p_fps"] = pts
            if p720.get("stale"):
                c["per_batch_720p_fps"]["stale"] = True
    carried = d.get("carried_sections")
    if carried:
        c["carried_sections_n"] = len(carried)
    c["full_detail"] = "BENCH_SELF.json"
    out = {
        "metric": payload.get("metric"),
        "value": payload.get("value"),
        "unit": payload.get("unit"),
        "vs_baseline": payload.get("vs_baseline"),
        "detail": c,
    }
    s = json.dumps(out)
    # hard guarantee, least-load-bearing keys dropped first
    drop = ["per_batch_720p_fps", "carried_sections_n", "full_detail",
            "per_batch_fps", "full_stack", "trained_weights",
            "device_only", "full_stack_4stream", "bpp"]
    while len(s) > _STDOUT_CAP and drop:
        c.pop(drop.pop(0), None)
        s = json.dumps(out)
    return s


def _print_final_once() -> None:
    global _FINAL_DONE
    with _EMIT_LOCK:
        if _FINAL_DONE:
            return
        _FINAL_DONE = True
        snap = _SNAPSHOT
    if snap is None:
        if _PREV_PAYLOAD.get("detail"):
            prev = dict(_PREV_PAYLOAD)
            prev["detail"] = dict(prev["detail"])
            prev["detail"]["headline_stale"] = (
                "no section completed this run; numbers are the last "
                "validated snapshot (see BENCH_NOTES)"
            )
            snap = _compact_payload(prev)
        else:
            snap = json.dumps({
                "metric": "stem_1080p_p_frame_encode_decode", "value": 0.0,
                "unit": "frames/s/chip", "vs_baseline": 0.0,
                "detail": {"error": "no section completed and no previous "
                                    "snapshot available"},
            })
    sys.stdout.write(snap + "\n")
    sys.stdout.flush()


def _watchdog(deadline_t: float) -> None:
    while True:
        dt = deadline_t - time.monotonic()
        if dt <= 0:
            break
        time.sleep(min(dt, 5.0))
    _print_final_once()
    os._exit(0)


def main():
    global _PREV_PAYLOAD, _PREV_DETAIL
    budget = float(os.environ.get("STEM_BENCH_BUDGET_S", 1500))
    _PREV_PAYLOAD = _load_prev_payload()
    _PREV_DETAIL = dict(_PREV_PAYLOAD.get("detail") or {})
    threading.Thread(
        target=_watchdog, args=(time.monotonic() + max(budget - 20.0, 30.0),),
        daemon=True,
    ).start()

    def _die(*_):
        _print_final_once()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _die)
        except Exception:  # pragma: no cover - non-main-thread callers
            pass

    stem_tpu.set_entropy_coder("rans_interleaved")
    if not _device_reachable():
        # the TPU tunnel is down: emit the last validated self-run, clearly
        # flagged, instead of hanging past every driver timeout.
        # BENCH_SELF.json is gitignored (it dies with the container), so a
        # committed snapshot (artifacts/bench_last_validated.json) backs it.
        global _SNAPSHOT
        if _PREV_PAYLOAD.get("detail"):
            prev = dict(_PREV_PAYLOAD)
            prev["detail"] = dict(prev["detail"])
            prev["detail"]["device_unreachable"] = (
                "TPU tunnel down at bench time; numbers are the last "
                "validated self-run (see PROGRESS/BENCH_NOTES)"
            )
            with _EMIT_LOCK:
                _SNAPSHOT = _compact_payload(prev)
        _print_final_once()
        return
    # STEM_BENCH_ONLY=charm,wavefront_tiled,... reruns selected sections and
    # merges into the existing BENCH_SELF.json (sections are expensive
    # through the tunnel; iterating on one shouldn't pay for all)
    only = set(filter(None,
                      os.environ.get("STEM_BENCH_ONLY", "").split(",")))
    on = lambda name: not only or name in only  # noqa: E731
    t_start = time.perf_counter()
    left = lambda: budget - (time.perf_counter() - t_start)  # noqa: E731

    results, extras = {}, {}
    if only:
        try:  # keep the previous headline when not rerunning `pipeline`
            prev = _PREV_DETAIL
            # ADVICE r3: route the stored device_only by its dtype tag —
            # never reload a bf16 fallback into the f32 slot
            d0 = prev.get("device_only", {})
            slot = {"f32": "device_only_b4",
                    "bf16": "device_only_b4_bf16"}.get(d0.get("dtype"))
            if slot and "ms_per_frame" in d0:
                extras[slot] = d0
            extras["_prev_per_batch"] = prev.get("per_batch_fps", {})
            results[4] = {
                "fps": prev["per_batch_fps"].get("4", 0.0),
                "bpp": prev["bpp"],
                "stage_ms": prev["stage_ms_per_frame"],
                "bytes_per_frame": prev["bytes_per_frame"],
            }
        except Exception:
            pass

    # Sticky-OOM containment: a RESOURCE_EXHAUSTED can wedge the remote
    # runtime so every later compile/alloc fails the same way (observed in
    # the round-5 validation run: the 720p b=16 OOM poisoned all seven
    # remaining sections). After two consecutive OOM sections, stop running
    # device sections — carry-forward keeps their previous values instead
    # of overwriting the record with identical errors.
    _oom_streak = [0]

    def section(name, key, fn, min_left):
        """Run one bench section with budget gating; record errors instead
        of dying; refresh the snapshot after every completion."""
        if not on(name) or left() < min_left:
            return
        if _oom_streak[0] >= 2:
            extras.setdefault("oom_skipped_sections", []).append(key)
            return
        try:
            r = fn()
            if r:
                extras[key] = r
                _oom_streak[0] = 0
                _emit(results, extras, to_stdout=False)
        except Exception as e:  # pragma: no cover - bench resilience
            extras[key + "_error"] = repr(e)[:200]
            if "RESOURCE_EXHAUSTED" in repr(e):
                _oom_streak[0] += 1

    if on("host_coder"):
        try:  # BEFORE any device traffic: tunnel client shares the one core
            extras["host_coder_standalone"] = measure_host_coder()
        except Exception as e:  # pragma: no cover
            extras["host_coder_error"] = repr(e)[:200]
    try:  # feeds every wavefront projection; also before device traffic
        global _WF_HOST
        _WF_HOST = measure_wavefront_host_coder()
        extras["wavefront_host_coder_standalone"] = _WF_HOST
    except Exception as e:  # pragma: no cover
        extras["wavefront_host_coder_error"] = repr(e)[:200]

    def run_pipeline_point(b, **kw):
        try:
            results[b] = run_pipeline(b, **kw)
        except Exception as e:  # pragma: no cover
            extras[f"pipeline_b{b}_error"] = repr(e)[:200]
            return False
        _emit(results, extras, to_stdout=False)
        return True

    # ---- Flagship sections FIRST (VERDICT r4 #2): the official record
    # needs these four measured fresh in every driver-budget run; extras,
    # tile variants and probes come after. b=4 is the headline batch.
    if on("pipeline"):
        run_pipeline_point(4)
    section("device_only_bf16", "device_only_b4_bf16",
            lambda: run_device_only(4, dtype=jnp.bfloat16), 420)
    section("wavefront_pipelined", "res_pipelined_full_stack",
            lambda: run_wavefront_pipelined((1, 4)), 420)
    section("trained_weights", "trained_weights", run_trained_weights, 240)
    # Real multi-stream serving run (VERDICT r4 #3): S=4 independent GOP
    # streams through the pipelined loop, >=8 frames each; the PCIe
    # projection is re-derived from this run's observed schedule.
    section("wavefront_4stream", "res_pipelined_4stream_measured",
            lambda: run_wavefront_pipelined_multistream((1, 4), streams=4),
            300)

    # ---- Secondary sections ----
    if on("pipeline") and left() > budget * 0.45:
        run_pipeline_point(1) and run_pipeline_point(2)
    section("device_only", "device_only_b4",
            lambda: run_device_only(4), 420)
    # deep tiles — (1,4) and (2,4) are the production serving configs
    for spec in os.environ.get("STEM_BENCH_DEEP_TILE", "1,4;2,4").split(";"):
        th_, tw_ = (int(v) for v in spec.split(","))
        key = ("res_wavefront_deep_tiled_1080p" if (th_, tw_) == (2, 4)
               else f"res_wavefront_tile{th_}x{tw_}_1080p")
        section("wavefront_deep", key,
                lambda t=(th_, tw_): run_wavefront(left(), tile=t), 420)
    # (1, 2): halves the AR rounds (and enc_scan) vs (1, 4) — the
    # latency-lever tile if the bake-off shows its border-rate cost stays
    # negligible (artifacts/bakeoff.json res_tiled_1x2)
    section("wavefront_pipelined", "res_pipelined_full_stack_1x2",
            lambda: run_wavefront_pipelined((1, 2)), 420)
    section("wavefront_pipelined", "res_pipelined_full_stack_2x4",
            lambda: run_wavefront_pipelined((2, 4)), 600)
    # charm is RD-dominated (+19% matched-distortion rate vs res,
    # artifacts/bakeoff.json) — opt-in only (VERDICT r4 #8); its last
    # validated numbers stay in BENCH_NOTES
    if os.environ.get("STEM_BENCH_CHARM"):
        section("charm", "charm_1080p", run_charm, 360)
    section("wavefront_tiled", "res_wavefront_tiled_1080p",
            lambda: run_wavefront(left(), tile=(17, 30)), 480)
    # untiled reference decode order last: most expensive, least load-bearing
    section("wavefront", "res_wavefront_1080p",
            lambda: run_wavefront(left()), 540)
    # (batch 8 was probed and RESOURCE_EXHAUSTs this chip at 1080p —
    # the encode expression's argsort/scatter buffers on top of the
    # transform activations; batch 4 is the sweet spot.)
    # 720p batch-scaling curve (VERDICT r3 #6 / r4 #7): 1080p b=8 OOMs this
    # chip, so amortization beyond b=4 is demonstrated at 720p. LAST on
    # purpose: the b≥12 points brush the HBM ceiling and an OOM can wedge
    # the remote runtime for every subsequent compile (round-5 validation
    # run), so nothing load-bearing may follow this sweep.
    if on("pipeline_720p") and left() > 420:
        for b in (4, 8, 12, 16):
            if left() < 240 or _oom_streak[0] >= 2:
                break
            try:
                r = run_pipeline(b, h=768, w=1280)
                extras.setdefault("per_batch_720p", {})[str(b)] = {
                    "fps": round(r["fps"], 3), "bpp": round(r["bpp"], 4),
                    "stage_ms": r["stage_ms"],
                }
                _emit(results, extras, to_stdout=False)
            except Exception as e:  # pragma: no cover
                extras[f"pipeline_720p_b{b}_error"] = repr(e)[:200]
                break

    _emit(results, extras, to_stdout=True)


def _emit(results, extras, to_stdout: bool):
    global _SNAPSHOT
    detail = {
        "pipeline": "sparse-grouped transport, streaming GOP: 1-dispatch "
                    "encode + 1-dispatch fetch-free decode (row counts ride "
                    "the container), zero per-frame device syncs; host rANS "
                    "overlapped with device work",
        "environment_note": (
            "device reached through a remote tunnel: ~30-40 ms RPC latency "
            "per dispatch/transfer, ~20-40 MB/s bandwidth "
            "(tools/profile_pipeline.py)"
        ),
    }
    try:
        detail["device"] = str(jax.devices()[0])
    except Exception:  # pragma: no cover
        pass
    if results:
        best = results[max(results, key=lambda b: results[b]["fps"])]
        fps = best["fps"]
        detail["bpp"] = round(best["bpp"], 4)
        detail["per_batch_fps"] = {
            **extras.get("_prev_per_batch", {}),
            **{str(b): round(r["fps"], 3) for b, r in results.items()},
        }
        detail["stage_ms_per_frame"] = best["stage_ms"]
        detail["bytes_per_frame"] = best["bytes_per_frame"]
    else:
        # guard against an empty results dict (round-3 _emit crashed here):
        # carry the previous headline, clearly flagged
        fps = float(_PREV_PAYLOAD.get("value", 0.0)) if _PREV_DETAIL else 0.0
        for k in ("bpp", "per_batch_fps", "stage_ms_per_frame",
                  "bytes_per_frame"):
            if k in _PREV_DETAIL:
                detail[k] = _PREV_DETAIL[k]
        detail["headline_stale"] = (
            "pipeline section did not complete this run; headline carried "
            "from the last validated snapshot"
        )
        best = ({"stage_ms": detail["stage_ms_per_frame"],
                 "bytes_per_frame": detail["bytes_per_frame"]}
                if "stage_ms_per_frame" in detail
                and "bytes_per_frame" in detail else None)
    # project with the faster serving dtype (bf16 since the fused
    # bf16-preserving GDN + set_compute_dtype landed; the f32 entropy
    # islands keep the codec bit-consistent either way). Either dtype's
    # measurement alone is enough — a transient tunnel error in one
    # section must not drop the headline projection. Candidates are
    # accepted only when their own dtype tag matches the slot (ADVICE r3).
    cands = []
    for dname, key in (("f32", "device_only_b4"),
                       ("bf16", "device_only_b4_bf16")):
        e = extras.get(key)
        if (isinstance(e, dict) and "ms_per_frame" in e
                and e.get("dtype", dname) == dname):
            cands.append((dname, e))
    if cands:
        by = dict(cands)
        pick = "f32" if "f32" in by else cands[0][0]
        detail["device_only"] = {**by[pick], "dtype": pick}
        if "host_coder_standalone" in extras and best is not None \
                and "dec_z" in best["stage_ms"]:
            dname, dev = min(cands, key=lambda c: c[1]["ms_per_frame"])
            proj = pcie_projection(
                best, dev, extras["host_coder_standalone"],
            )
            proj["device_dtype"] = dname
            detail["pcie_projection"] = proj
    for k in sorted(extras):
        if not k.startswith("_") and k != "device_only_b4":
            detail[k] = extras[k]
    # carry-forward (VERDICT r3 #8): sections present in an older snapshot
    # but absent from this run ride along with a stale marker instead of
    # silently vanishing — a killed bench still leaves a monotonically
    # complete snapshot
    carried = []
    for k, v in _PREV_DETAIL.items():
        if (k in _NON_CARRY or k in detail or k.endswith("_error")
                or not isinstance(v, dict)):
            continue
        detail[k] = {**v, "stale": "carried from a previous validated run"}
        carried.append(k)
    if carried:
        detail["carried_sections"] = sorted(carried)

    payload_dict = {
        "metric": "stem_1080p_p_frame_encode_decode",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "detail": detail,
    }
    payload = json.dumps(payload_dict)
    here = os.path.dirname(os.path.abspath(__file__))
    with _EMIT_LOCK:
        # stdout gets the capped summary; files get the full detail
        _SNAPSHOT = _compact_payload(payload_dict)
    try:
        _atomic_write(os.path.join(here, "BENCH_SELF.json"), payload)
        _atomic_write(
            os.path.join(here, "artifacts", "bench_last_validated.json"),
            payload,
        )
    except Exception:  # pragma: no cover - read-only fs must not kill a run
        pass
    if to_stdout:
        _print_final_once()


if __name__ == "__main__":
    main()
