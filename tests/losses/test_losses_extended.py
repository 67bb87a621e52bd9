"""Extended loss tests mirroring reference coverage
(reference tests/losses/test_losses.py:228-954): PCA losses through the
real fit path, pairwise-3D-projection values + NaN masking, reprojection-
heatmap values + gradient flow, unimodal KL/JS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_pose_tpu.losses.losses import (
    PairwiseProjectionsLoss,
    PCALoss,
    ReprojectionHeatmapLoss,
    UnimodalLoss,
)


@pytest.fixture(scope="module")
def fitted_pca(cfg, toy_data_dir):
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
    return pca


class TestPCALoss:
    def test_in_subspace_below_epsilon(self, fitted_pca):
        """Training keypoints reproject within the empirical epsilon, so
        the rectified loss is ~0 (reference test_losses.py:228-246)."""
        loss_fn = PCALoss("pca_singleview", pca=fitted_pca)
        preds = jnp.asarray(
            np.nan_to_num(fitted_pca.data_arr[:8], nan=50.0), dtype=jnp.float32
        )
        scalar, logs = loss_fn(keypoints_pred=preds, stage="train")
        assert float(scalar) < 5.0  # most errors rectified away
        assert "train_pca_singleview_loss" in logs

    def test_off_subspace_positive(self, fitted_pca, rng):
        loss_fn = PCALoss("pca_singleview", pca=fitted_pca)
        preds = jnp.asarray(
            rng.uniform(0, 128, size=(8, 34)).astype(np.float32)
        )
        scalar, _ = loss_fn(keypoints_pred=preds)
        assert float(scalar) > 0.0

    def test_explicit_epsilon_rectifies_everything(self, fitted_pca, rng):
        loss_fn = PCALoss("pca_singleview", pca=fitted_pca, epsilon=1e6)
        preds = jnp.asarray(
            rng.uniform(0, 128, size=(4, 34)).astype(np.float32)
        )
        scalar, _ = loss_fn(keypoints_pred=preds)
        assert float(scalar) == 0.0

    def test_invalid_loss_name_raises(self, fitted_pca):
        with pytest.raises(ValueError, match="Invalid loss_name"):
            PCALoss("not_a_pca", pca=fitted_pca)


class TestPairwiseProjectionsLoss:
    def test_zero_when_equal(self):
        loss_fn = PairwiseProjectionsLoss(log_weight=0.0)
        targ = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)),
                           dtype=jnp.float32)
        pred = jnp.tile(targ[:, None], (1, 3, 1, 1))  # 3 camera pairs
        scalar, logs = loss_fn(
            keypoints_targ_3d=targ, keypoints_pred_3d=pred, stage="train"
        )
        assert float(scalar) < 1e-4
        assert "train_supervised_pairwise_projections_loss" in logs

    def test_actual_value(self):
        """Distance 5 on every keypoint/pair -> loss 5 (L2 over xyz)."""
        loss_fn = PairwiseProjectionsLoss()
        targ = jnp.zeros((1, 4, 3))
        pred = jnp.zeros((1, 2, 4, 3)).at[..., 0].set(3.0).at[..., 1].set(4.0)
        scalar, _ = loss_fn(keypoints_targ_3d=targ, keypoints_pred_3d=pred)
        np.testing.assert_allclose(float(scalar), 5.0, rtol=1e-5)

    def test_nan_targets_masked(self):
        loss_fn = PairwiseProjectionsLoss()
        targ = jnp.zeros((1, 4, 3)).at[0, 0].set(jnp.nan)
        pred = jnp.ones((1, 2, 4, 3))
        # keypoint 0 excluded; remaining distance = sqrt(3)
        scalar, _ = loss_fn(keypoints_targ_3d=targ, keypoints_pred_3d=pred)
        np.testing.assert_allclose(float(scalar), np.sqrt(3.0), rtol=1e-4)

    def test_all_nans_give_zero(self):
        loss_fn = PairwiseProjectionsLoss()
        targ = jnp.full((1, 4, 3), jnp.nan)
        pred = jnp.ones((1, 2, 4, 3))
        scalar, _ = loss_fn(keypoints_targ_3d=targ, keypoints_pred_3d=pred)
        assert float(scalar) == 0.0

    def test_missing_inputs_raise(self):
        loss_fn = PairwiseProjectionsLoss()
        with pytest.raises(ValueError, match="Camera params"):
            loss_fn(keypoints_targ_3d=None, keypoints_pred_3d=None,
                    stage="train")


class TestReprojectionHeatmapLoss:
    def _loss(self):
        return ReprojectionHeatmapLoss(
            original_image_height=128, original_image_width=128,
            downsampled_image_height=32, downsampled_image_width=32,
        )

    def _targets(self, kp):
        from lightning_pose_tpu.data.heatmaps import generate_heatmaps

        return generate_heatmaps(
            kp, height=128, width=128, output_shape=(32, 32)
        )

    def test_zero_when_reprojection_matches(self):
        kp = jnp.asarray([[[40.0, 60.0], [90.0, 30.0]]])  # (1, 2, 2)
        targ = self._targets(kp)
        scalar, logs = self._loss()(
            heatmaps_targ=targ, keypoints_pred_2d_reprojected=kp,
            stage="train",
        )
        assert float(scalar) < 1e-6
        assert "train_supervised_reprojection_heatmap_mse_loss" in logs

    def test_positive_when_shifted(self):
        kp = jnp.asarray([[[40.0, 60.0], [90.0, 30.0]]])
        targ = self._targets(kp)
        scalar, _ = self._loss()(
            heatmaps_targ=targ,
            keypoints_pred_2d_reprojected=kp + 12.0,
        )
        assert float(scalar) > 1e-3

    def test_zero_target_heatmaps_masked(self):
        """All-zero target maps (missing labels) contribute nothing."""
        kp = jnp.asarray([[[40.0, 60.0], [90.0, 30.0]]])
        targ = self._targets(kp).at[..., 1].set(0.0)  # kill keypoint 1 map
        shifted = kp.at[0, 1].add(50.0)  # error only on the masked keypoint
        scalar, _ = self._loss()(
            heatmaps_targ=targ, keypoints_pred_2d_reprojected=shifted
        )
        assert float(scalar) < 1e-6

    def test_gradient_flows_to_keypoints(self):
        """Gradients flow through the generated Gaussians into the
        reprojected keypoints (reference keep_gradients=True)."""
        kp = jnp.asarray([[[40.0, 60.0], [90.0, 30.0]]])
        targ = self._targets(kp)
        loss_fn = self._loss()

        def f(k):
            s, _ = loss_fn(
                heatmaps_targ=targ, keypoints_pred_2d_reprojected=k
            )
            return s

        g = jax.grad(f)(kp + 5.0)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0

    def test_missing_inputs_raise(self):
        with pytest.raises(ValueError, match="Camera params"):
            self._loss()(
                heatmaps_targ=jnp.zeros((1, 32, 32, 2)),
                keypoints_pred_2d_reprojected=None, stage="train",
            )


class TestUnimodalKLJS:
    def _heatmaps(self, b=2, k=3, h=16, w=16):
        kp = jnp.asarray(
            np.random.default_rng(3).uniform(8, 56, size=(b, k, 2)),
            dtype=jnp.float32,
        )
        return kp.reshape(b, -1)

    @pytest.mark.parametrize("kind", ["unimodal_kl", "unimodal_js"])
    def test_zero_for_ideal_unimodal(self, kind):
        """Heatmaps that equal the ideal Gaussian at the predicted keypoint
        give ~zero divergence."""
        from lightning_pose_tpu.data.heatmaps import generate_heatmaps

        kp_flat = self._heatmaps()
        b = kp_flat.shape[0]
        kp = kp_flat.reshape(b, -1, 2)
        hm = generate_heatmaps(kp, height=64, width=64, output_shape=(16, 16))
        loss_fn = UnimodalLoss(
            loss_name=kind,
            original_image_height=64, original_image_width=64,
            downsampled_image_height=16, downsampled_image_width=16,
        )
        scalar, _ = loss_fn(
            keypoints_pred_augmented=kp_flat, heatmaps_pred=hm,
            confidences=jnp.ones((b, kp.shape[1])),
        )
        assert float(scalar) < 1e-2

    @pytest.mark.parametrize("kind", ["unimodal_kl", "unimodal_js"])
    def test_positive_for_bimodal(self, kind):
        from lightning_pose_tpu.data.heatmaps import generate_heatmaps

        kp_flat = self._heatmaps()
        b = kp_flat.shape[0]
        kp = kp_flat.reshape(b, -1, 2)
        hm = generate_heatmaps(kp, height=64, width=64, output_shape=(16, 16))
        # add a second mode far from the keypoint
        hm_bimodal = hm + jnp.roll(hm, shift=8, axis=1)
        hm_bimodal = hm_bimodal / jnp.sum(hm_bimodal, axis=(1, 2), keepdims=True)
        loss_fn = UnimodalLoss(
            loss_name=kind,
            original_image_height=64, original_image_width=64,
            downsampled_image_height=16, downsampled_image_width=16,
        )
        s_uni, _ = loss_fn(
            keypoints_pred_augmented=kp_flat, heatmaps_pred=hm,
            confidences=jnp.ones((b, kp.shape[1])),
        )
        s_bi, _ = loss_fn(
            keypoints_pred_augmented=kp_flat, heatmaps_pred=hm_bimodal,
            confidences=jnp.ones((b, kp.shape[1])),
        )
        assert float(s_bi) > float(s_uni)


class TestTemporalHeatmapLoss:
    """reference tests/losses/test_losses.py:412-505."""

    def _gaussian_stack(self, centers):
        """(T, 16, 16, 1) normalized gaussians at the given (x, y) centers."""
        yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        maps = []
        for cx, cy in centers:
            m = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.25**2))
            maps.append(m / m.sum())
        return jnp.asarray(np.stack(maps)[..., None].astype(np.float32))

    def test_invalid_loss_name_raises(self):
        from lightning_pose_tpu.losses.losses import TemporalHeatmapLoss

        with pytest.raises(ValueError, match="Invalid loss_name"):
            TemporalHeatmapLoss(loss_name="temporal_heatmap_js")

    @pytest.mark.parametrize(
        "name", ["temporal_heatmap_mse", "temporal_heatmap_kl"]
    )
    def test_zero_for_constant_heatmaps(self, name):
        from lightning_pose_tpu.losses.losses import TemporalHeatmapLoss

        loss = TemporalHeatmapLoss(loss_name=name)
        hms = self._gaussian_stack([(8, 8)] * 4)
        confs = jnp.ones((4, 1))
        value, logs = loss(hms, confs)
        assert float(value) == pytest.approx(0.0, abs=1e-6)
        assert f"train_{name}_loss" in {
            k.replace("unsupervised_", "") for k in logs
        } or logs  # log dict present

    @pytest.mark.parametrize(
        "name", ["temporal_heatmap_mse", "temporal_heatmap_kl"]
    )
    def test_positive_for_moving_heatmaps(self, name):
        from lightning_pose_tpu.losses.losses import TemporalHeatmapLoss

        loss = TemporalHeatmapLoss(loss_name=name)
        hms = self._gaussian_stack([(4, 4), (8, 8), (12, 12), (4, 12)])
        confs = jnp.ones((4, 1))
        value, _ = loss(hms, confs)
        assert float(value) > 0.0

    def test_low_confidence_pairs_masked(self):
        from lightning_pose_tpu.losses.losses import TemporalHeatmapLoss

        loss = TemporalHeatmapLoss(
            loss_name="temporal_heatmap_mse", prob_threshold=0.5
        )
        hms = self._gaussian_stack([(4, 4), (12, 12)])
        # one frame below threshold -> the only pair masked -> zero loss
        confs = jnp.asarray([[0.9], [0.1]])
        value, _ = loss(hms, confs)
        assert float(value) == 0.0
        # both above threshold -> positive
        value2, _ = loss(hms, jnp.asarray([[0.9], [0.9]]))
        assert float(value2) > 0.0

    def test_epsilon_rectifies_small_diffs(self):
        from lightning_pose_tpu.losses.losses import TemporalHeatmapLoss

        hms = self._gaussian_stack([(8, 8), (9, 8)])  # small motion
        confs = jnp.ones((2, 1))
        base, _ = TemporalHeatmapLoss(loss_name="temporal_heatmap_mse")(
            hms, confs
        )
        assert float(base) > 0.0
        rectified, _ = TemporalHeatmapLoss(
            loss_name="temporal_heatmap_mse", epsilon=1.0
        )(hms, confs)
        assert float(rectified) == 0.0
