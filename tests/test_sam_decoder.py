"""SAM mask-decoder path parity tests vs the torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sam_road_tpu.models.convert import convert_state_dict, overlay_params
from sam_road_tpu.models.sam_decoder import SamMaskDecoderHead

from torch_oracle import OracleSamDecoderHead


@pytest.mark.slow  # ~18 s: full torch-oracle parity; the in-SAMRoad
# integration test below stays in the default tier
def test_sam_decoder_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleSamDecoderHead(image_size=64).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    sd = oracle.sam_state_dict()
    conv = convert_state_dict(sd, image_size=64)
    assert not conv["skipped"], conv["skipped"]

    head = SamMaskDecoderHead(image_size=64, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(2, 4, 4, 256)).astype(np.float32)
    init = jax.tree.map(
        np.asarray, head.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    )
    merged, matched, mismatched = overlay_params(init, conv["params"]["sam_decoder"])
    assert not mismatched, mismatched

    got = np.asarray(head.apply({"params": merged}, jnp.asarray(x)))
    with torch.no_grad():
        want = (
            oracle(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.slow  # ~16 s: full-module drive; the torch-oracle decoder
# parity case above stays default
def test_sam_decoder_in_sam_road():
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.sam_road import build_model

    cfg = load_config(
        overrides=dict(
            SAM_VERSION="vit_t", PATCH_SIZE=64, USE_SAM_DECODER=True,
            COMPUTE_DTYPE="float32",
        )
    )
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 64, (1, 8, 2)), jnp.float32)
    pairs = jnp.zeros((1, 2, 4, 2), jnp.int32)
    valid = jnp.ones((1, 2, 4), bool)
    v = model.init(jax.random.PRNGKey(0), rgb, pts, pairs, valid)
    assert "sam_decoder" in v["params"]
    out = model.apply(v, rgb, pts, pairs, valid)
    assert out[0].shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out[0])).all()
