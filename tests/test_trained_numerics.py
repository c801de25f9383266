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
    identical noisy inputs and identical trained weights."""
    assert results["parity_within_0.05dB"] is True
    assert results["psnr_gap_db"]["pallas_float32"] <= 0.05
    assert results["psnr_gap_db"]["xla_float32"] <= 0.05


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


def test_attention_logits_inside_shift_softmax_exact_band(results):
    """Pre-mask logit extrema on trained weights must sit inside the
    shifted-softmax exact band (-47, 80] — outside it the fused forward
    saturates while backward recompute stays exact
    (kernels/window_attention.py:564-589; ADVICE round-1 medium)."""
    lo = results["attn_logits"]["logit_min"]
    hi = results["attn_logits"]["logit_max"]
    assert -47.0 < lo and hi <= 80.0, f"logit band ({lo}, {hi})"
