"""Cross-round golden regression of the config-1 edit pipeline (VERDICT r3
item 8): recompute the full deterministic pullback+edit workload and assert
basis cosines / edited-image PSNR against the stored goldens.

The goldens were produced by scripts/make_goldens.py on CPU f32; an
intentional numerical change must regenerate them (the diff is the audit
trail). This is the acceptance harness real released weights drop into —
swap the random init for converted checkpoints and the same PSNR/cos gates
apply (replaces the reference's eyeball QC, edit.py:667-676).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _sigma_groups(s, rel_gap=0.05):
    """Indices grouped by near-degenerate singular values: directions inside
    a group may mix, so compare subspaces per group (SURVEY §7 acceptance)."""
    groups, cur = [], [0]
    for i in range(1, len(s)):
        if (s[i - 1] - s[i]) / max(s[0], 1e-12) < rel_gap:
            cur.append(i)
        else:
            groups.append(cur)
            cur = [i]
    groups.append(cur)
    return groups


def principal_cosines(A, B):
    qa, _ = np.linalg.qr(A.T)
    qb, _ = np.linalg.qr(B.T)
    return np.linalg.svd(qa.T @ qb, compute_uv=False)


def _assert_golden_match(art, basis_path, edit_path):
    """The shared acceptance gates (SURVEY §7): σ rtol 1e-3, per-σ-gap-group
    subspace cosines ≥ 0.99, edited-image PSNR ≥ 35 dB."""
    assert os.path.exists(basis_path) and os.path.exists(edit_path), (
        "goldens missing — run scripts/make_goldens.py")
    ref = np.load(basis_path)
    ref_edit = np.load(edit_path)

    # singular values: tight relative match
    np.testing.assert_allclose(art["s"], ref["s"], rtol=1e-3)
    np.testing.assert_allclose(art["u_norms"], ref["u_norms"], rtol=1e-3)

    # directions: per σ-gap group subspace cosines ≥ 0.99 (BASELINE gate)
    groups = _sigma_groups(ref["s"])
    for g in groups:
        cos = principal_cosines(art["vT"][g], ref["vT"][g])
        assert cos.min() > 0.99, (g, cos)

    # edited image: PSNR ≥ 35 dB vs golden ([0,1] range)
    mse = float(np.mean((art["edit"] - ref_edit) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 35.0, f"edited image drifted: PSNR {psnr:.1f} dB"


def test_config1_smoke_golden():
    """FAST-gate e2e smoke (VERDICT r4 item 5): the reduced config-1
    pipeline — invert → pullback → guidance walk → finish on a tiny U-Net —
    against stored goldens, same gates as the full regression. Runs in the
    default (-m 'not slow') loop."""
    from scripts.make_goldens import compute_config1_smoke_artifacts

    art = compute_config1_smoke_artifacts()
    _assert_golden_match(
        art,
        os.path.join(GOLDEN_DIR, "config1_smoke_basis.npz"),
        os.path.join(GOLDEN_DIR, "config1_smoke_edit.npy"),
    )


@pytest.mark.slow
def test_config1_golden_regression():
    from scripts.make_goldens import compute_config1_artifacts

    art = compute_config1_artifacts()
    _assert_golden_match(
        art,
        os.path.join(GOLDEN_DIR, "config1_basis.npz"),
        os.path.join(GOLDEN_DIR, "config1_edit.npy"),
    )
