"""Eval pipeline tests: metrics, Procrustes, uncertainty, sharded runner."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poco_tpu.eval.metrics import (
    mpjpe,
    pa_mpjpe,
    procrustes_align,
    uncert_error_correlation,
    vertex_error,
)
from poco_tpu.eval.uncertainty import (
    global_uncert,
    kinematic_uncert,
    prepare_uncert,
)
from poco_tpu.ops.rotation import axis_angle_to_rotmat


class TestMetrics:
    def test_mpjpe_zero_for_identical(self):
        x = jnp.asarray(np.random.RandomState(0).randn(4, 14, 3))
        assert np.allclose(np.asarray(mpjpe(x, x)), 0.0)

    def test_mpjpe_known_offset(self):
        x = jnp.zeros((2, 14, 3))
        y = x + jnp.asarray([3.0, 4.0, 0.0])
        np.testing.assert_allclose(np.asarray(mpjpe(x, y)), 5.0, rtol=1e-6)

    def test_procrustes_removes_similarity_transform(self):
        rng = np.random.RandomState(1)
        gt = rng.randn(5, 14, 3).astype(np.float32)
        rot = np.asarray(
            axis_angle_to_rotmat(jnp.asarray(rng.randn(5, 3), jnp.float32))
        )
        scale = rng.uniform(0.5, 2.0, (5, 1, 1)).astype(np.float32)
        trans = rng.randn(5, 1, 3).astype(np.float32)
        pred = scale * np.einsum("bij,bnj->bni", rot, gt) + trans

        err = np.asarray(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        np.testing.assert_allclose(err, 0.0, atol=1e-4)

    def test_procrustes_matches_reference_scalar_loop(self):
        """Parity vs the numpy per-sample Procrustes (eval_utils.py:11-82)."""

        def ref_similarity_transform(S1, S2):
            # S1, S2: (3, N)
            mu1 = S1.mean(axis=1, keepdims=True)
            mu2 = S2.mean(axis=1, keepdims=True)
            X1, X2 = S1 - mu1, S2 - mu2
            var1 = np.sum(X1**2)
            K = X1.dot(X2.T)
            U, s, Vh = np.linalg.svd(K)
            V = Vh.T
            Z = np.eye(U.shape[0])
            Z[-1, -1] *= np.sign(np.linalg.det(U.dot(V.T)))
            R = V.dot(Z.dot(U.T))
            scale = np.trace(R.dot(K)) / var1
            t = mu2 - scale * (R.dot(mu1))
            return scale * R.dot(S1) + t

        rng = np.random.RandomState(2)
        pred = rng.randn(4, 14, 3).astype(np.float32)
        gt = pred + 0.1 * rng.randn(4, 14, 3).astype(np.float32)
        ours = np.asarray(procrustes_align(jnp.asarray(pred), jnp.asarray(gt)))
        for i in range(4):
            ref = ref_similarity_transform(pred[i].T, gt[i].T).T
            np.testing.assert_allclose(ours[i], ref, atol=1e-4)

    def test_vertex_error(self):
        v = jnp.zeros((1, 10, 3))
        w = v + jnp.asarray([1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(vertex_error(v, w)), 1.0)

    def test_correlation_positive_for_correlated(self):
        rng = np.random.RandomState(3)
        u = rng.rand(100)
        e = 2 * u + 0.1 * rng.randn(100)
        c = float(uncert_error_correlation(jnp.asarray(u), jnp.asarray(e)))
        assert c > 0.9


class TestUncertainty:
    def test_prepare_collapses_rotation_dims(self):
        var = np.full((2, 24, 3, 3), 0.5, np.float32)
        out = prepare_uncert(var)
        assert out.shape == (2, 24)
        np.testing.assert_allclose(out, 0.5)

    def test_gauss_logsigma_exponentiates(self):
        var = np.zeros((1, 24), np.float32)
        np.testing.assert_allclose(
            prepare_uncert(var, "gauss_logsigma"), 1.0
        )

    def test_delta_formula(self):
        var = np.concatenate(
            [np.full((1, 24), 2.0), np.full((1, 24), 4.0)], axis=1
        )
        out = prepare_uncert(var, "delta")
        np.testing.assert_allclose(out, 2.0 / 16.0)

    def test_geng_gamma_ratio(self):
        # beta = 2 (Gaussian case): E[x^2] factor = Gamma(1.5)/Gamma(0.5) = 0.5
        var = np.concatenate(
            [np.full((1, 24), 1.0), np.full((1, 24), 2.0)], axis=1
        )
        out = prepare_uncert(var, "genG")
        np.testing.assert_allclose(out, 0.5, rtol=1e-3)

    def test_kinematic_accumulates_down_chain(self):
        var = np.ones((1, 24), np.float32)
        out = kinematic_uncert(var)
        assert out[0, 0] == 1.0       # root
        assert out[0, 1] == 2.0       # hip = self + root
        assert out[0, 4] == 3.0       # knee = self + hip(2)
        assert out[0, 7] == 4.0       # ankle

    def test_global_uncert_cliff_uses_root(self):
        var = np.zeros((2, 24), np.float32)
        var[0, 0] = 0.2
        var[1, 0] = 0.9  # above 2*0.4 -> clamped to 1
        g = global_uncert(var, "hrnet_w48_cls-cliff")
        np.testing.assert_allclose(g[0], 0.2, atol=1e-6)
        np.testing.assert_allclose(g[1], 1.0)

    def test_global_uncert_pare_uses_mean(self):
        var = np.full((1, 24), 0.2, np.float32)
        g = global_uncert(var, "hrnet_w32-pare")
        np.testing.assert_allclose(g[0], 0.2, atol=1e-6)


class TestPerJointStats:
    def _result(self, uncert, pose_dist):
        from poco_tpu.eval.runner import EvalResult

        n = 6
        return EvalResult(
            imgnames=[f"s/{i}.jpg" for i in range(n)],
            mpjpe_mm=np.full(n, 50.0),
            pa_mpjpe_mm=np.full(n, 30.0),
            v2v_mm=np.full(n, 60.0),
            uncert=uncert,
            pose_dist=pose_dist,
        )

    def test_cov_and_names(self):
        rng = np.random.RandomState(0)
        uncert = rng.uniform(0.4, 0.9, (6, 24)).astype(np.float32)
        pose_dist = rng.uniform(0.0, 0.1, (6, 24)).astype(np.float32)
        pj = self._result(uncert, pose_dist).per_joint_stats()
        assert pj is not None
        assert pj["joint_names"][0] == "pelvis"
        assert len(pj["sigma_mean"]) == 24
        sig = uncert.mean(axis=0)
        np.testing.assert_allclose(
            pj["sigma_cov"], sig.std() / sig.mean(), atol=1e-3
        )
        # homogeneous residuals -> CoV ~ 0 (the decay-adjudication signal)
        pj0 = self._result(
            uncert, np.full((6, 24), 0.05, np.float32)
        ).per_joint_stats()
        assert pj0["pose_dist_cov"] < 1e-6

    def test_none_when_unavailable_or_mismatched(self):
        uncert = np.ones((6, 21), np.float32)  # excluded joints
        pose_dist = np.ones((6, 24), np.float32)
        assert self._result(uncert, pose_dist).per_joint_stats() is None
        assert self._result(None, None).per_joint_stats() is None


class TestEvalRunner:
    @pytest.fixture(scope="class")
    def tiny_eval_dataset(self, tmp_path_factory):
        from poco_tpu.data.dataset import PocoDataset

        root = tmp_path_factory.mktemp("eval_ds")
        rng = np.random.RandomState(0)
        n = 8
        names = []
        for i in range(n):
            img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
            seq = "downtown_bar_00" if i < 4 else "courtyard_golf_00"
            name = f"{seq}/img_{i}.jpg"
            (root / seq).mkdir(exist_ok=True)
            cv2.imwrite(str(root / name), img)
            names.append(name)
        np.savez(
            root / "ann.npz",
            imgname=np.array(names),
            center=np.tile([64.0, 48.0], (n, 1)),
            scale=np.full(n, 0.4),
            pose=rng.uniform(-0.2, 0.2, (n, 72)),
            shape=rng.uniform(-0.5, 0.5, (n, 10)),
            gender=np.array(["m", "f"] * 4),
            has_smpl=np.ones(n),
        )
        return PocoDataset(
            str(root / "ann.npz"), img_dir=str(root), is_train=False
        )

    def test_flip_tta_recovers_equivariant_prediction(self):
        """For a perfectly flip-equivariant model, flip-TTA must be a
        no-op that equals ground truth exactly: the mirrored image
        depicts flip(R), the step un-flips it back to R, and
        average(R, R) = R. Proves the un-flip conjugation + SO(3)
        average against the axis-angle flip rule end to end."""
        from poco_tpu.constants import SMPL_JOINTS_FLIP_PERM
        from poco_tpu.eval.runner import make_gendered_eval_step
        from poco_tpu.smpl.assets import synthetic_smpl_model
        from poco_tpu.smpl.lbs import smpl_forward

        smpl = synthetic_smpl_model(num_verts=96)
        B, H, W = 4, 32, 48
        rng = np.random.RandomState(7)
        aa = rng.uniform(-0.4, 0.4, (B, 24, 3)).astype(np.float32)

        img = np.zeros((B, H, W, 3), np.float32)
        img[:, 0, :24, :] = aa          # pose encoded in the image
        img[:, 1, 0, 0] = 1.0           # original-orientation sentinel
        perm = np.asarray(SMPL_JOINTS_FLIP_PERM)

        class EquivariantStub:
            """Reads the pose DEPICTED in the (possibly mirrored)
            image: the flipped image depicts the mirrored person, so an
            ideal model reports flip(R) for it."""

            def apply(self, variables, batch, smpl_params, train=False):
                im = batch["img"]
                flag = im[:, 1, 0, 0][:, None, None]  # 1=orig, 0=flip
                dec_orig = im[:, 0, :24, :]
                dec_mirror = im[:, 0, W - 24:, :][:, ::-1, :]
                aa_flip = dec_mirror[:, perm, :] * jnp.asarray(
                    [1.0, -1.0, -1.0]
                )
                dec = flag * dec_orig + (1.0 - flag) * aa_flip
                rot = axis_angle_to_rotmat(dec.reshape(-1, 3)).reshape(
                    -1, 24, 3, 3
                )
                shape = jnp.zeros((dec.shape[0], 10))
                verts = smpl_forward(smpl_params, shape, rot).vertices
                return {
                    "smpl_vertices": verts,
                    "pred_pose": rot,
                    "pred_shape": shape,
                }

        step = make_gendered_eval_step(EquivariantStub(), flip_test=True)
        batch = {
            "img": jnp.asarray(img),
            "pose": jnp.asarray(aa.reshape(B, 72)),
            "betas": jnp.zeros((B, 10)),
            "gender": -jnp.ones((B,), jnp.int32),
        }
        m = step({}, batch, smpl, smpl, smpl)
        np.testing.assert_allclose(np.asarray(m["mpjpe"]), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m["v2v"]), 0.0, atol=1e-4)

    def test_run_eval_flip_test_smoke(self, tiny_eval_dataset):
        """--flip_test through the sharded runner: finite metrics,
        aligned counts, real model."""
        from poco_tpu.eval.runner import run_eval
        from poco_tpu.models.poco import build_poco_cliff, init_poco
        from poco_tpu.parallel.mesh import make_mesh
        from poco_tpu.smpl.assets import synthetic_smpl_model

        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        result = run_eval(
            model, variables, tiny_eval_dataset,
            smpl_neutral=smpl, batch_size=4, mesh=make_mesh(),
            flip_test=True,
        )
        assert len(result.mpjpe_mm) == 8
        assert np.all(np.isfinite(result.mpjpe_mm))
        assert np.all(np.isfinite(result.v2v_mm))

    def test_sharded_eval_and_report(self, tiny_eval_dataset):
        from poco_tpu.eval.runner import pw3d_split_report, run_eval
        from poco_tpu.models.poco import build_poco_cliff, init_poco
        from poco_tpu.parallel.mesh import make_mesh
        from poco_tpu.smpl.assets import synthetic_smpl_model

        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        mesh = make_mesh()  # all 8 virtual devices

        result = run_eval(
            model, variables, tiny_eval_dataset,
            smpl_neutral=smpl, batch_size=4, mesh=mesh,
        )
        assert len(result.mpjpe_mm) == 8
        assert np.all(np.isfinite(result.mpjpe_mm))
        assert np.all(result.pa_mpjpe_mm <= result.mpjpe_mm + 1e-3)
        s = result.summary()
        assert "best_model_metric" in s
        # reference calibration Pearson (per-joint sigma vs per-joint
        # rotation distance) rides along whenever sigma is predicted
        assert result.pose_dist is not None and result.pose_dist.shape == (8, 24)
        assert "uncert_pose_corr" in s and np.isfinite(s["uncert_pose_corr"])

        report = pw3d_split_report(
            result.imgnames, result.mpjpe_mm, result.pa_mpjpe_mm,
            result.v2v_mm,
        )
        assert "all" in report and "test_seq" in report and "occluded_seq" in report
        # test split only contains the first 4 samples
        np.testing.assert_allclose(
            report["test_seq"]["mpjpe"], result.mpjpe_mm[:4].mean(), rtol=1e-6
        )


class TestDistributedConsistency:
    def test_eval_identical_on_1_vs_8_devices(self, tiny_eval_dataset=None):
        """SURVEY §4 test pyramid item 4: the same eval on 1 chip and
        sharded across 8 chips must produce identical metrics."""
        import jax

        from poco_tpu.eval.runner import run_eval
        from poco_tpu.models.poco import build_poco_cliff, init_poco
        from poco_tpu.parallel.mesh import make_mesh
        from poco_tpu.smpl.assets import synthetic_smpl_model

        # reuse the class-scoped fixture machinery manually
        import cv2
        import tempfile, os

        tmp = tempfile.mkdtemp()
        rng = np.random.RandomState(0)
        n = 8
        names = []
        for i in range(n):
            img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
            name = f"img_{i}.jpg"
            cv2.imwrite(os.path.join(tmp, name), img)
            names.append(name)
        np.savez(
            os.path.join(tmp, "ann.npz"),
            imgname=np.array(names),
            center=np.tile([64.0, 48.0], (n, 1)),
            scale=np.full(n, 0.4),
            pose=rng.uniform(-0.2, 0.2, (n, 72)),
            shape=rng.uniform(-0.5, 0.5, (n, 10)),
            gender=np.array(["m", "f"] * 4),
            has_smpl=np.ones(n),
        )
        from poco_tpu.data.dataset import PocoDataset

        ds = PocoDataset(
            os.path.join(tmp, "ann.npz"), img_dir=tmp, is_train=False
        )

        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)

        res1 = run_eval(
            model, variables, ds, smpl_neutral=smpl, batch_size=8,
            mesh=make_mesh(n_devices=1),
        )
        res8 = run_eval(
            model, variables, ds, smpl_neutral=smpl, batch_size=8,
            mesh=make_mesh(n_devices=8),
        )
        np.testing.assert_allclose(
            res1.mpjpe_mm, res8.mpjpe_mm, rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            res1.pa_mpjpe_mm, res8.pa_mpjpe_mm, rtol=1e-4, atol=1e-3
        )


class TestModelAxisSharding:
    def test_vertex_sharded_smpl_matches_replicated(self):
        """2-D mesh: SMPL vertex dim on "model" gives identical outputs."""
        import jax
        import jax.numpy as jnp

        from poco_tpu.parallel.mesh import make_mesh, shard_smpl_params
        from poco_tpu.smpl.assets import synthetic_smpl_model
        from poco_tpu.smpl.model import smpl_49

        smpl = synthetic_smpl_model(num_verts=128)
        mesh = make_mesh(n_devices=8, model_parallel=2)
        rng = np.random.RandomState(0)
        betas = jnp.asarray(rng.randn(4, 10), jnp.float32)
        rot = jnp.broadcast_to(jnp.eye(3), (4, 24, 3, 3))

        f = jax.jit(lambda s, b, r: smpl_49(s, b, r))
        ref_v, ref_j = f(smpl, betas, rot)
        with mesh:
            smpl_sharded = shard_smpl_params(smpl, mesh)
            v, j = f(smpl_sharded, betas, rot)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), atol=1e-5)
        np.testing.assert_allclose(np.asarray(j), np.asarray(ref_j), atol=1e-5)
