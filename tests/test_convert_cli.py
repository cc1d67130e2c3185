"""Checkpoint-converter CLI: torch .pth.tar → native checkpoint round-trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_oracle import load_reference  # noqa: E402


def test_convert_cli_image_arch(tmp_path):
    compressai = load_reference()
    torch.manual_seed(5)
    ref = compressai.models.MeanScaleHyperprior(128, 192)  # q1 config
    ref.eval()
    ref.update(force=True)
    src = tmp_path / "msh.pth.tar"
    torch.save({"state_dict": ref.state_dict()}, src)

    from spatiotemporalentropymodel_tpu.zoo.convert import main

    out = tmp_path / "msh.ckpt"
    main([str(src), "-o", str(out), "--arch", "mbt2018-mean",
          "--quality", "1"])
    assert out.exists()

    from spatiotemporalentropymodel_tpu.models import MeanScaleHyperprior
    from spatiotemporalentropymodel_tpu.training.checkpoints import (
        load_checkpoint,
    )

    state = load_checkpoint(str(out))["model"]
    model = MeanScaleHyperprior(128, 192)
    model.load_state_dict(state)
    # shipped CDF tables were adopted (no update() needed to code)
    assert "gaussian_conditional" in model.tables
    x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    out_fwd = model.forward(x, train=False)
    assert np.isfinite(np.asarray(out_fwd["x_hat"])).all()

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.moveaxis(x, -1, 1)))
    np.testing.assert_allclose(
        np.moveaxis(ref_out["x_hat"].numpy(), 1, -1),
        np.asarray(out_fwd["x_hat"]),
        atol=1e-4,
    )


def test_convert_cli_rejects_charm(tmp_path):
    from spatiotemporalentropymodel_tpu.zoo.convert import main

    src = tmp_path / "x.pth.tar"
    src.write_bytes(b"")
    with pytest.raises(SystemExit):
        main([str(src), "-o", str(tmp_path / "o.ckpt"), "--video",
              "stpm_charm"])
