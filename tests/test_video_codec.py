"""File-level GOP video codec (.stemv container) round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from spatiotemporalentropymodel_tpu.eval.video_codec import (
    decode_video,
    encode_video,
)
from spatiotemporalentropymodel_tpu.models import (
    MeanScaleHyperprior,
    SpatioTemporalPriorModel,
)

M = 12


def _models():
    x = jnp.zeros((1, 64, 64, 3))
    i_model = MeanScaleHyperprior(8, M)
    i_model.init(x)
    i_model.params = jax.tree_util.tree_map(lambda p: p * 0.05, i_model.params)
    i_model.update()
    stem = SpatioTemporalPriorModel(
        variant="without_spm", entropy_bottleneck_channels=16, in_channels=M
    )
    d = jnp.zeros((1, 4, 4, M))
    stem.init(d, d)
    stem.params = jax.tree_util.tree_map(lambda p: p * 0.01, stem.params)
    stem.update()
    return i_model, stem


def test_stemv_dense_fallback_records(tmp_path):
    """Unscaled (random-init) models overflow int8 → P-frames serialize as
    dense records (ftype 2) and must still decode with a drift-free carry."""
    x = jnp.zeros((1, 64, 64, 3))
    i_model = MeanScaleHyperprior(8, M)
    i_model.init(x)
    i_model.update()
    stem = SpatioTemporalPriorModel(
        variant="without_spm", entropy_bottleneck_channels=16, in_channels=M
    )
    d = jnp.zeros((1, 4, 4, M))
    stem.init(d, d)
    stem.update()

    rng = np.random.default_rng(3)
    frames = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(3)]
    out = tmp_path / "dense.stemv"
    encode_video(frames, i_model, stem, out, gop=3)

    from spatiotemporalentropymodel_tpu.eval.video_codec import (
        _read_frame,
        read_header,
    )

    with out.open("rb") as f:
        read_header(f)
        types = [_read_frame(f)[0] for _ in range(3)]
    assert types[0] == 0 and all(t == 2 for t in types[1:])

    decoded = decode_video(out, i_model, stem)
    assert len(decoded) == 3
    for fr in decoded:
        assert np.isfinite(fr).all()


def test_stemv_roundtrip(tmp_path):
    """encode → .stemv file → decode must reproduce the in-memory pipeline's
    reconstructions exactly (streams, counts and the GOP carry all survive
    serialization), across an I-frame refresh."""
    i_model, stem = _models()
    rng = np.random.default_rng(0)
    base = rng.random((60, 62, 3)).astype(np.float32)  # non-×64 size
    frames = [np.clip(base + 0.01 * t, 0, 1) for t in range(5)]

    out = tmp_path / "seq.stemv"
    stats = encode_video(frames, i_model, stem, out, gop=3)
    assert stats["frames"] == 5 and stats["bytes"] == out.stat().st_size

    decoded = decode_video(out, i_model, stem, output_dir=tmp_path / "rec")
    assert len(decoded) == 5
    for fr in decoded:
        assert fr.shape == (60, 62, 3)
        assert np.isfinite(fr).all()
    assert sorted(p.name for p in (tmp_path / "rec").iterdir()) == [
        f"frame_{i:04d}.png" for i in range(5)
    ]

    # file decode must equal the in-memory recurrence: re-encoding frame 1
    # from the file-decoded carry reproduces frame 1's stream
    from spatiotemporalentropymodel_tpu.eval.pipeline import StemVideoPipeline
    from spatiotemporalentropymodel_tpu.ops.padding import pad_centered

    pipe = StemVideoPipeline(i_model, stem)
    x0, _ = pad_centered(jnp.asarray(frames[0])[None], 64)
    enc0 = i_model.compress(x0)
    y_cond = i_model.decompress(enc0["strings"], tuple(enc0["shape"]))["y_hat"]
    x1, _ = pad_centered(jnp.asarray(frames[1])[None], 64)
    enc1, _ = pipe.encode_frame(x1, y_cond)

    from spatiotemporalentropymodel_tpu.eval.video_codec import (
        _read_frame,
        read_header,
    )

    with out.open("rb") as f:
        hdr = read_header(f)
        assert (hdr["n_frames"], hdr["h"], hdr["w"]) == (5, 60, 62)
        _read_frame(f)  # I-frame record
        ftype, shape, counts, strings = _read_frame(f)
    assert ftype == 1
    assert strings[0][0] == enc1["strings"][0][0]
    assert strings[1][0] == enc1["strings"][1][0]
    np.testing.assert_array_equal(counts, np.asarray(enc1["counts"])[0])


def test_stemv_params_hash_guard(tmp_path):
    """Decoding with weights that differ from the encoder's raises instead
    of silently emitting random-init garbage (ADVICE r2)."""
    import pytest

    i_model, stem = _models()
    rng = np.random.default_rng(1)
    frames = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(2)]
    out = tmp_path / "seq.stemv"
    encode_video(frames, i_model, stem, out, gop=2)

    wrong = SpatioTemporalPriorModel(
        variant="without_spm", entropy_bottleneck_channels=16, in_channels=M
    )
    d = jnp.zeros((1, 4, 4, M))
    wrong.init(d, d)
    wrong.params = jax.tree_util.tree_map(lambda p: p * 0.02, wrong.params)
    wrong.update()
    with pytest.raises(ValueError, match="--stem-checkpoint"):
        decode_video(out, i_model, wrong)
    # the override flag still allows it
    decode_video(out, i_model, wrong, verify_params=False)
    # and the correct weights pass
    decode_video(out, i_model, stem)


def test_stemv_wavefront_tiled_flagship(tmp_path):
    """The flagship res variant (tiled wavefront SPM) files and decodes:
    the tile shape rides the header, the decoded frames equal the direct
    model-API chain exactly (VERDICT r2 #5)."""
    from spatiotemporalentropymodel_tpu.eval.video_codec import read_header
    from spatiotemporalentropymodel_tpu.ops.padding import pad_centered

    x = jnp.zeros((1, 64, 64, 3))
    i_model = MeanScaleHyperprior(8, M)
    i_model.init(x)
    i_model.params = jax.tree_util.tree_map(lambda p: p * 0.05,
                                            i_model.params)
    i_model.update()
    stem = SpatioTemporalPriorModel(
        variant="res", entropy_bottleneck_channels=16, in_channels=M,
        wavefront_tile=(2, 4),
    )
    d = jnp.zeros((1, 4, 4, M))
    stem.init(d, d)
    stem.params = jax.tree_util.tree_map(lambda p: p * 0.01, stem.params)
    stem.update()

    rng = np.random.default_rng(5)
    base = rng.random((64, 64, 3)).astype(np.float32)
    frames = [np.clip(base + 0.01 * t, 0, 1) for t in range(3)]
    out = tmp_path / "res.stemv"
    encode_video(frames, i_model, stem, out, gop=3)

    with out.open("rb") as f:
        hdr = read_header(f)
    assert hdr["stem_family"] == 1
    assert (hdr["cfg0"], hdr["cfg1"]) == (2, 4)

    decoded = decode_video(out, i_model, stem)

    # byte-consistency: the file path must reproduce the direct model-API
    # chain (same streams → same reconstructions)
    enc0 = i_model.compress(pad_centered(jnp.asarray(frames[0])[None], 64)[0])
    dec0 = i_model.decompress(enc0["strings"], tuple(enc0["shape"]))
    y_cond = dec0["y_hat"]
    ref = [np.asarray(dec0["x_hat"])[0]]
    for t in (1, 2):
        xp, _ = pad_centered(jnp.asarray(frames[t])[None], 64)
        y_cur = i_model._apply(xp, method="analysis")[0]
        enc = stem.compress(y_cur, y_cond)
        dec = stem.decompress(enc["strings"], tuple(enc["shape"]), y_cond)
        y_cond = dec["y_hat"]
        ref.append(np.asarray(i_model._apply(y_cond, method="get_x"))[0])
    for got, want in zip(decoded, ref):
        np.testing.assert_array_equal(got, want[: got.shape[0], : got.shape[1]])


def test_stemv_charm(tmp_path):
    """Charm streams file and decode: groups/lrp ride the header and the
    reconstruction equals the direct model-API chain (VERDICT r2 #5)."""
    from spatiotemporalentropymodel_tpu.eval.video_codec import read_header
    from spatiotemporalentropymodel_tpu.models import (
        SpatioTemporalPriorModelChannelAR,
    )
    from spatiotemporalentropymodel_tpu.ops.padding import pad_centered

    x = jnp.zeros((1, 64, 64, 3))
    i_model = MeanScaleHyperprior(8, M)
    i_model.init(x)
    i_model.params = jax.tree_util.tree_map(lambda p: p * 0.05,
                                            i_model.params)
    i_model.update()
    stem = SpatioTemporalPriorModelChannelAR(
        groups=3, entropy_bottleneck_channels=16, in_channels=M
    )
    d = jnp.zeros((1, 4, 4, M))
    stem.init(d, d)
    stem.params = jax.tree_util.tree_map(lambda p: p * 0.02, stem.params)
    stem.update()

    rng = np.random.default_rng(6)
    base = rng.random((64, 64, 3)).astype(np.float32)
    frames = [np.clip(base + 0.01 * t, 0, 1) for t in range(3)]
    out = tmp_path / "charm.stemv"
    encode_video(frames, i_model, stem, out, gop=3)

    with out.open("rb") as f:
        hdr = read_header(f)
    assert hdr["stem_family"] == 2
    assert hdr["cfg0"] == 3  # groups
    assert hdr["cfg1"] & 1  # lrp flag

    decoded = decode_video(out, i_model, stem)
    assert len(decoded) == 3

    enc0 = i_model.compress(pad_centered(jnp.asarray(frames[0])[None], 64)[0])
    dec0 = i_model.decompress(enc0["strings"], tuple(enc0["shape"]))
    y_cond = dec0["y_hat"]
    ref = [np.asarray(dec0["x_hat"])[0]]
    for t in (1, 2):
        xp, _ = pad_centered(jnp.asarray(frames[t])[None], 64)
        y_cur = i_model._apply(xp, method="analysis")[0]
        enc = stem.compress(y_cur, y_cond)
        dec = stem.decompress(enc["strings"], tuple(enc["shape"]), y_cond,
                              transport_mode=enc["transport"],
                              counts=enc.get("counts"))
        y_cond = dec["y_hat"]
        ref.append(np.asarray(i_model._apply(y_cond, method="get_x"))[0])
    for got, want in zip(decoded, ref):
        np.testing.assert_array_equal(got, want[: got.shape[0], : got.shape[1]])
