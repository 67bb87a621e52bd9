"""Tests for NaN-aware PCA (mirroring reference tests/utils/test_pca.py)."""

import numpy as np
import pytest

from lightning_pose_tpu.utils.pca import (
    ComponentChooser,
    EmpiricalEpsilon,
    format_multiview_data_for_pca,
    nan_pca_fit,
    nan_pca_transform,
)


def _low_rank_data(rng, n=200, d=8, rank=3):
    basis = rng.normal(size=(rank, d))
    coefs = rng.normal(size=(n, rank))
    return coefs @ basis + 0.01 * rng.normal(size=(n, d))


def test_nan_pca_matches_sklearn_on_clean_data(rng):
    from sklearn.decomposition import PCA

    X = _low_rank_data(rng)
    ours = nan_pca_fit(X)
    ref = PCA(svd_solver="covariance_eigh").fit(X)
    np.testing.assert_allclose(ours["mean_"], ref.mean_, atol=1e-8)
    np.testing.assert_allclose(
        ours["explained_variance_ratio_"][:4], ref.explained_variance_ratio_[:4],
        atol=1e-6,
    )
    # components equal up to the deterministic sign convention
    np.testing.assert_allclose(
        np.abs(ours["components_"][:3]), np.abs(ref.components_[:3]), atol=1e-5
    )
    # sign convention matches sklearn's svd_flip exactly
    np.testing.assert_allclose(ours["components_"][:3], ref.components_[:3], atol=1e-5)


def test_nan_pca_handles_missing_data(rng):
    X = _low_rank_data(rng)
    X_nan = X.copy()
    mask = rng.uniform(size=X.shape) < 0.1
    X_nan[mask] = np.nan
    out = nan_pca_fit(X_nan)
    clean = nan_pca_fit(X)
    # subspace should be close despite 10% missing entries
    for i in range(3):
        cos = abs(out["components_"][i] @ clean["components_"][i])
        assert cos > 0.95, f"component {i} diverged: cos={cos}"


def test_nan_pca_transform_masked(rng):
    X = _low_rank_data(rng)
    fit = nan_pca_fit(X)
    comps = fit["components_"][:3]
    # clean transform matches direct projection
    z = nan_pca_transform(X.copy(), fit["mean_"], comps)
    z_direct = (X - fit["mean_"]) @ comps.T
    np.testing.assert_allclose(z, z_direct, atol=1e-6)
    # with one missing coord, posterior-mean estimate stays close
    X_nan = X.copy()
    X_nan[0, 0] = np.nan
    z_nan = nan_pca_transform(X_nan, fit["mean_"], comps)
    assert np.linalg.norm(z_nan[0] - z_direct[0]) < 0.5


def test_component_chooser():
    evr = np.array([0.5, 0.4, 0.05, 0.04, 0.01])
    assert ComponentChooser(evr, 2)() == 2
    assert ComponentChooser(evr, 0.9)() == 2
    assert ComponentChooser(evr, 0.95)() == 3
    assert ComponentChooser(evr, 1.0)() == 5
    with pytest.raises(ValueError):
        ComponentChooser(evr, 10)
    with pytest.raises(ValueError):
        ComponentChooser(evr, 1.5)


def test_empirical_epsilon():
    loss = np.array([1.0, 2.0, 3.0, np.nan, 100.0])
    eps = EmpiricalEpsilon(percentile=50.0)(loss)
    assert eps == pytest.approx(2.5)


def test_format_multiview_data(rng):
    data = rng.normal(size=(4, 6, 2))  # 4 frames, 6 keypoints
    matches = [[0, 1, 2], [3, 4, 5]]
    out = format_multiview_data_for_pca(data, matches)
    assert out.shape == (4 * 3, 4)  # frames*keypoints, 2*views
    # row 0: keypoint 0 of frame 0 across views: (x0_v0, ..., x0_v1, ...)
    np.testing.assert_allclose(out[0, 0], data[0, 0, 0])
    np.testing.assert_allclose(out[0, 2], data[0, 3, 0])
    np.testing.assert_allclose(out[0, 1], data[0, 0, 1])
    np.testing.assert_allclose(out[0, 3], data[0, 3, 1])


def test_keypoint_pca_end_to_end(cfg, toy_data_dir):
    """Fit PCA through the data-module path on mirror-mouse."""
    from lightning_pose_tpu.data.factory import get_data_module, get_dataset
    from lightning_pose_tpu.utils.pca import KeypointPCA

    dataset = get_dataset(cfg, toy_data_dir)
    dm = get_data_module(cfg, dataset)
    pca = KeypointPCA(
        loss_type="pca_singleview",
        data_module=dm,
        components_to_keep=0.99,
        columns_for_singleview_pca=list(range(14)),
    )
    pca()
    assert pca.parameters["kept_eigenvectors"].shape[1] == 28
    assert pca.parameters["epsilon"] > 0
    # reprojection of training data is close in kept subspace
    err = pca.compute_reprojection_error()
    assert np.nanmean(err) < 20  # pixels at 128 resolution

    # jax loss path agrees with numpy path on clean data
    import jax.numpy as jnp

    preds = np.nan_to_num(pca.data_arr[:4], nan=50.0).astype(np.float32)
    err_np = pca.compute_reprojection_error(preds)
    err_jax = np.asarray(pca.reprojection_error_jax(jnp.asarray(preds)))
    np.testing.assert_allclose(err_jax, err_np, rtol=1e-3, atol=1e-3)


def test_keypoint_pca_multiview(cfg, toy_data_dir):
    from lightning_pose_tpu.data.factory import get_data_module, get_dataset
    from lightning_pose_tpu.utils.pca import KeypointPCA

    dataset = get_dataset(cfg, toy_data_dir)
    dm = get_data_module(cfg, dataset)
    pca = KeypointPCA(
        loss_type="pca_multiview",
        data_module=dm,
        components_to_keep=3,
        mirrored_column_matches=cfg.data.mirrored_column_matches,
    )
    pca()
    assert pca._n_components_kept == 3
    assert pca.parameters["kept_eigenvectors"].shape == (3, 4)  # 2 views x 2 coords


def test_keypoint_pca_centering_methods(cfg, toy_data_dir):
    """mean/median centering subtracts the per-sample center before the fit
    (reference pca.py centering + tests/utils/test_pca.py:80-145)."""
    from lightning_pose_tpu.data.datamodules import BaseDataModule
    from lightning_pose_tpu.data.datasets import HeatmapDataset
    from lightning_pose_tpu.utils.pca import KeypointPCA

    ds = HeatmapDataset(
        root_directory=toy_data_dir, csv_path="CollectedData.csv",
        image_resize_height=128, image_resize_width=128,
        imgaug_pipeline="default",
    )
    dm = BaseDataModule(dataset=ds, train_probability=0.8, torch_seed=0)
    for method in ("mean", "median"):
        pca = KeypointPCA(
            loss_type="pca_singleview",
            data_module=dm,
            components_to_keep=3,
            columns_for_singleview_pca=[0, 1, 2, 3, 4, 5, 6],
            centering_method=method,
        )
        pca()  # fit
        assert pca.parameters["mean"].shape[-1] == 14  # 7 kps x 2
        # centered data has (near-)zero per-sample center (rows with any
        # NaN keypoint get a NaN center -- skip those)
        kp = pca.data_arr.reshape(pca.data_arr.shape[0], -1, 2)
        full_rows = ~np.isnan(kp).any(axis=(1, 2))
        center = (
            np.mean(kp[full_rows], axis=1) if method == "mean"
            else np.quantile(kp[full_rows], 0.5, axis=1)
        )
        np.testing.assert_allclose(center, 0.0, atol=1e-3)
        err = pca.compute_reprojection_error(pca.data_arr)
        assert np.isfinite(err[~np.isnan(err)]).all()

    with pytest.raises((ValueError, NotImplementedError)):
        KeypointPCA(
            loss_type="pca_singleview",
            data_module=dm,
            components_to_keep=3,
            columns_for_singleview_pca=[0, 1, 2],
            centering_method="mode",
        )()


def test_component_chooser_invalid_args():
    from lightning_pose_tpu.utils.pca import ComponentChooser

    evr = np.array([0.6, 0.3, 0.08, 0.02])
    # integer larger than observed dims
    with pytest.raises(ValueError, match="exceeding"):
        ComponentChooser(evr, 99)
    # proportion > 1
    with pytest.raises(ValueError, match="between 0.0 and 1.0"):
        ComponentChooser(evr, 1.5)
    # valid: fraction selects the smallest count reaching the threshold
    assert ComponentChooser(evr, 0.85)() == 2
    assert ComponentChooser(evr, 1.0)() == 4
    assert ComponentChooser(evr, 3)() == 3


def test_nan_pca_whole_row_nan(rng):
    """A sample with ALL coordinates missing transforms without crashing
    (reference tests/utils/test_pca.py:325-337)."""
    from lightning_pose_tpu.utils.pca import nan_pca_fit, nan_pca_transform

    data = rng.standard_normal((40, 6)).astype(np.float64)
    data[3, :] = np.nan
    fitted = nan_pca_fit(data)
    out = nan_pca_transform(data, fitted["mean_"], fitted["components_"][:2])
    assert out.shape == (40, 2)
    ok_rows = [i for i in range(40) if i != 3]
    assert np.isfinite(out[ok_rows]).all()


def test_nan_pca_single_nan_close_to_clean_fit(rng):
    """One NaN barely perturbs the fit: components (away from zero) and
    explained variance stay within a few percent; other samples'
    transforms stay close (reference test_pca.py:234-271)."""
    base = rng.normal(size=(400, 3)) @ rng.normal(size=(3, 8))
    data = base + 0.01 * rng.normal(size=(400, 8))
    clean = nan_pca_fit(data)

    data_nan = data.copy()
    data_nan[0, 0] = np.nan
    nan1 = nan_pca_fit(data_nan)

    mask = np.abs(clean["components_"][:3]) > 0.05
    np.testing.assert_allclose(
        clean["components_"][:3][mask], nan1["components_"][:3][mask], rtol=1e-1
    )
    np.testing.assert_allclose(
        clean["explained_variance_"][:3], nan1["explained_variance_"][:3], rtol=2e-2
    )
    # transforms of untouched rows barely move
    t_clean = nan_pca_transform(data.copy(), clean["mean_"], clean["components_"][:3])
    t_nan = nan_pca_transform(data_nan.copy(), nan1["mean_"], nan1["components_"][:3])
    np.testing.assert_allclose(t_clean[1:], t_nan[1:], atol=2e-2)


def test_nan_pca_many_nans_still_recovers_subspace(rng):
    """10% missing entries: reconstruction of observed values stays
    accurate (reference test_pca.py:272-324)."""
    base = rng.normal(size=(200, 3)) @ rng.normal(size=(3, 8))
    data = base + 0.01 * rng.normal(size=(200, 8))
    data_nan = data.copy()
    holes = rng.uniform(size=data.shape) < 0.1
    data_nan[holes] = np.nan
    fit = nan_pca_fit(data_nan)
    comps = fit["components_"][:3]
    scores = nan_pca_transform(data_nan.copy(), fit["mean_"], comps)
    recon = scores @ comps + fit["mean_"]
    obs = ~holes
    err = np.abs(recon[obs] - data[obs])
    assert np.nanmedian(err) < 0.05


def test_format_multiview_mismatched_lengths_raises(rng):
    from lightning_pose_tpu.utils.pca import format_multiview_data_for_pca

    data = rng.normal(size=(4, 7, 2))
    with pytest.raises((AssertionError, ValueError)):
        format_multiview_data_for_pca(data, [[0, 1, 2, 3], [4, 5, 6]])


def test_format_multiview_three_views(rng):
    from lightning_pose_tpu.utils.pca import format_multiview_data_for_pca

    data = rng.normal(size=(4, 12, 2))
    out = format_multiview_data_for_pca(
        data, [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    )
    assert out.shape == (4 * 4, 2 * 3)
