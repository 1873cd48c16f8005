"""AOT export + serving tests (runtime/export.py, runtime/server.py).

Exports a tiny-backbone POCO to a tmpdir artifact, deserializes it, and
asserts the exported program reproduces model.apply exactly; covers
bucket padding/chunking and the HTTP serving roundtrip.
"""

import io
import json
import urllib.request

import jax
import numpy as np
import pytest

from poco_tpu.models.poco import (
    POCO,
    PocoConfig,
    init_poco,
    make_dummy_batch,
)
from poco_tpu.runtime.export import export_poco, load_exported
from poco_tpu.smpl.assets import synthetic_smpl_model


@pytest.fixture(scope="module")
def tiny_setup():
    model = POCO(cfg=PocoConfig(
        backbone="tiny-cliff", num_neurons=(64,), context_dim=64,
    ))
    smpl = synthetic_smpl_model(num_verts=96)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl)
    return model, smpl, variables


@pytest.fixture(scope="module")
def artifact(tiny_setup, tmp_path_factory):
    model, smpl, variables = tiny_setup
    out = str(tmp_path_factory.mktemp("exported") / "tiny_cliff")
    export_poco(
        model, variables, smpl, out,
        batch_sizes=(2, 4), platforms=("cpu",),
    )
    return out


class TestExportRoundtrip:
    def test_meta_and_files(self, artifact):
        with open(f"{artifact}/meta.json") as f:
            meta = json.load(f)
        assert meta["batch_sizes"] == [2, 4]
        assert meta["model_cfg"]["backbone"] == "tiny-cliff"
        assert "img" in meta["batch_keys"]
        for b in (2, 4):
            assert np.fromfile(
                f"{artifact}/forward_b{b}.jexp", np.uint8
            ).size > 0

    def test_matches_model_apply(self, tiny_setup, artifact):
        model, smpl, variables = tiny_setup
        loaded = load_exported(artifact)
        batch = make_dummy_batch(model.cfg, batch_size=2, include_gt=False)
        batch_np = {k: np.asarray(v) for k, v in batch.items()}
        rng = np.random.RandomState(0)
        batch_np["img"] = rng.randn(2, 224, 224, 3).astype(np.float32)

        got = loaded.predict(batch_np)
        want = model.apply(
            variables, {k: jax.numpy.asarray(v) for k, v in batch_np.items()},
            smpl, train=False,
        )
        # Fusion decisions differ between the AOT-lowered program and the
        # eager apply; agreement is ULP-level, not bitwise.
        for k in ("smpl_vertices", "pred_pose", "pred_shape", "pred_cam",
                  "var_pose"):
            assert k in got, k
            np.testing.assert_allclose(
                got[k], np.asarray(want[k]), rtol=2e-6, atol=1e-6,
                err_msg=k,
            )

    def test_padding_and_chunking(self, tiny_setup, artifact):
        """n=3 pads into the 4-bucket; n=7 chunks 4+3; outputs must be
        identical to per-sample prediction (padding rows never leak)."""
        model, _, _ = tiny_setup
        loaded = load_exported(artifact)
        rng = np.random.RandomState(1)
        n = 7
        batch = {
            k: np.asarray(v)
            for k, v in make_dummy_batch(
                model.cfg, batch_size=n, include_gt=False
            ).items()
        }
        batch["img"] = rng.randn(n, 224, 224, 3).astype(np.float32)
        out = loaded.predict(batch)
        assert out["pred_pose"].shape[0] == n
        two = loaded.predict({k: v[:2] for k, v in batch.items()})
        np.testing.assert_allclose(
            out["pred_pose"][:2], two["pred_pose"], atol=1e-5
        )

    def test_uint8_input_matches_host_normalize(
        self, tiny_setup, tmp_path
    ):
        """A uint8_input artifact (on-device normalize) must reproduce
        the float artifact fed host-normalized crops; float input to a
        uint8 artifact is rejected (cannot be recovered into uint8)."""
        model, smpl, variables = tiny_setup
        out = str(tmp_path / "tiny_u8")
        export_poco(
            model, variables, smpl, out,
            batch_sizes=(2,), platforms=("cpu",), uint8_input=True,
        )
        loaded = load_exported(out)
        assert loaded.uint8_input

        rng = np.random.RandomState(2)
        crops_u8 = rng.randint(0, 256, (2, 224, 224, 3), dtype=np.uint8)
        batch = {
            k: np.asarray(v)
            for k, v in make_dummy_batch(
                model.cfg, batch_size=2, include_gt=False
            ).items()
        }
        batch["img"] = crops_u8
        got = loaded.predict(batch)

        from poco_tpu.ops.preprocess import normalize_image

        batch_f = dict(batch)
        batch_f["img"] = np.asarray(
            normalize_image(jax.numpy.asarray(crops_u8, jax.numpy.float32))
        )
        want = model.apply(
            variables,
            {k: jax.numpy.asarray(v) for k, v in batch_f.items()},
            smpl, train=False,
        )
        np.testing.assert_allclose(
            got["pred_pose"], np.asarray(want["pred_pose"]),
            rtol=2e-6, atol=1e-6,
        )

        with pytest.raises(ValueError, match="uint8"):
            loaded.predict(batch_f)

    def test_data_parallel_export_matches_single_device(
        self, tiny_setup, artifact, tmp_path
    ):
        """An artifact exported with 8-way batch sharding (SPMD over the
        virtual CPU mesh) reproduces the single-device artifact."""
        model, smpl, variables = tiny_setup
        assert len(jax.devices()) >= 8, "conftest forces an 8-device mesh"
        dp_dir = str(tmp_path / "tiny_dp8")
        export_poco(
            model, variables, smpl, dp_dir,
            batch_sizes=(8,), data_parallel=8,
        )
        dp = load_exported(dp_dir)
        assert dp.meta["data_parallel"] == 8

        single = load_exported(artifact)
        rng = np.random.RandomState(3)
        batch = {
            k: np.asarray(v)
            for k, v in make_dummy_batch(
                model.cfg, batch_size=8, include_gt=False
            ).items()
        }
        batch["img"] = rng.randn(8, 224, 224, 3).astype(np.float32)
        got = dp.predict(batch)
        want = single.predict(batch)
        np.testing.assert_allclose(
            got["pred_pose"], want["pred_pose"], rtol=2e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            got["smpl_vertices"], want["smpl_vertices"], atol=1e-5
        )

    def test_data_parallel_rejects_indivisible_bucket(self, tiny_setup, tmp_path):
        model, smpl, variables = tiny_setup
        with pytest.raises(ValueError, match="not divisible"):
            export_poco(
                model, variables, smpl, str(tmp_path / "bad"),
                batch_sizes=(6,), data_parallel=8,
            )

    def test_buckets_for_and_warm_tracking(self, artifact):
        """is_warm drives the serving loop's flush-before-cold-dispatch
        rule: a cold bucket's synchronous compile must not delay a
        completed wave's responses."""
        loaded = load_exported(artifact)  # buckets (2, 4)
        assert loaded.buckets_for(1) == [2]
        assert loaded.buckets_for(3) == [4]
        assert loaded.buckets_for(4) == [4]
        assert loaded.buckets_for(5) == [4, 2]
        assert loaded.buckets_for(9) == [4, 4, 2]
        assert not loaded.is_warm(1)
        batch = {
            k: np.zeros((1,) + loaded._key_shape(k), loaded._key_dtype(k))
            for k in loaded.batch_keys
        }
        loaded.predict(batch)       # runs bucket 2
        assert loaded.is_warm(1) and loaded.is_warm(2)
        assert not loaded.is_warm(3)  # bucket 4 still cold
        loaded.warmup()
        assert loaded.is_warm(9)

    def test_missing_key_raises(self, artifact):
        loaded = load_exported(artifact)
        with pytest.raises(KeyError):
            loaded.predict({"img": np.zeros((1, 224, 224, 3), np.float32)})


class TestServer:
    def test_http_roundtrip(self, artifact):
        from poco_tpu.runtime.server import PocoServer

        server = PocoServer(artifact, port=0).start(warmup=False)
        try:
            base = f"http://127.0.0.1:{server.port}"
            health = json.loads(urllib.request.urlopen(
                f"{base}/healthz", timeout=30).read())
            assert health["status"] == "ok"
            assert health["buckets"] == [2, 4]

            crops = np.zeros((3, 224, 224, 3), np.uint8)
            buf = io.BytesIO()
            np.savez(buf, img=crops)
            req = urllib.request.Request(
                f"{base}/predict", data=buf.getvalue(), method="POST"
            )
            out = np.load(io.BytesIO(
                urllib.request.urlopen(req, timeout=120).read()))
            assert out["pred_pose"].shape == (3, 24, 3, 3)
            assert out["smpl_vertices"].shape[0] == 3

            # /healthz observability: rolling wave latency is live
            health = json.loads(urllib.request.urlopen(
                f"{base}/healthz", timeout=30).read())
            assert health["waves_measured"] >= 1
            assert health["wave_p50_ms"] > 0
            assert health["rows_per_s"] > 0

            # Every malformed-body class is the CLIENT's error: 400,
            # never 500 (empty -> EOFError, truncated zip -> BadZipFile,
            # pickled-looking bytes -> ValueError — all from np.load)
            for payload in (b"not-npz", b"", b"PK\x03\x04truncated"):
                bad = urllib.request.Request(
                    f"{base}/predict", data=payload, method="POST"
                )
                with pytest.raises(urllib.error.HTTPError) as e:
                    urllib.request.urlopen(bad, timeout=30)
                assert e.value.code == 400, payload
        finally:
            server.stop()

    def test_export_cli_smoke(self, tmp_path):
        """tools/export_model.py wiring: tiny config, random weights.

        Runs in a subprocess: the CLI mutates jax_platforms at import
        time, which must not leak into this pytest process (it would
        silently move every later test onto CPU on a TPU host)."""
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = str(tmp_path / "artifact")
        proc = subprocess.run(
            [sys.executable, "tools/export_model.py",
             "--cfg", "configs/tiny_smoke.yaml",
             "--out", out,
             "--batch-sizes", "2",
             "--dtype", "fp32",
             "--platforms", "cpu",
             "--smpl_dir", str(tmp_path / "no_smpl")],
            cwd=repo, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        loaded = load_exported(out)
        out_arr = loaded.predict(
            {"img": np.zeros((2, 224, 224, 3), np.float32),
             "bbox_info": np.zeros((2, 3), np.float32),
             "focal_length": np.full((2,), 1000.0, np.float32),
             "scale": np.ones((2,), np.float32),
             "center": np.full((2, 2), 500.0, np.float32),
             "orig_shape": np.full((2, 2), 1000.0, np.float32)}
        )
        # synthetic fallback SMPL (no assets in CI): small vertex count
        assert out_arr["smpl_vertices"].shape[0] == 2
        assert out_arr["smpl_vertices"].shape[-1] == 3
        assert out_arr["pred_pose"].shape == (2, 24, 3, 3)

    @pytest.mark.slow
    def test_export_cli_data_parallel(self, tmp_path):
        """--data_parallel N from the CLI: the subprocess must split its
        CPU host into N virtual devices itself and produce a loadable
        SPMD artifact."""
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = str(tmp_path / "artifact_dp4")
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, "tools/export_model.py",
             "--cfg", "configs/tiny_smoke.yaml",
             "--out", out,
             "--batch-sizes", "4",
             "--dtype", "fp32",
             "--data_parallel", "4",
             "--smpl_dir", str(tmp_path / "no_smpl")],
            cwd=repo, capture_output=True, text=True, timeout=600, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        loaded = load_exported(out)
        assert loaded.meta["data_parallel"] == 4
        got = loaded.predict(
            {"img": np.zeros((4, 224, 224, 3), np.float32),
             "bbox_info": np.zeros((4, 3), np.float32),
             "focal_length": np.full((4,), 1000.0, np.float32),
             "scale": np.ones((4,), np.float32),
             "center": np.full((4, 2), 500.0, np.float32),
             "orig_shape": np.full((4, 2), 1000.0, np.float32)}
        )
        assert got["pred_pose"].shape == (4, 24, 3, 3)

    def test_export_cli_defaults_resolve(self):
        """The CLI's default arguments must point at files that exist
        and parse — round 3 shipped a default --cfg naming the
        *reference's* config file, so `--out X` alone crashed."""
        import os
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, os.path.join(repo, "tools"))
        try:
            from export_model import build_parser
        finally:
            sys.path.pop(0)
        args = build_parser().parse_args(["--out", "/tmp/unused"])
        cfg_path = os.path.join(repo, args.cfg)
        assert os.path.exists(cfg_path), f"default --cfg missing: {args.cfg}"

        from poco_tpu.config import model_config_from_hparams, update_hparams

        model_cfg = model_config_from_hparams(update_hparams(cfg_path))
        assert model_cfg.backbone  # parsed into a real model config

    def test_micro_batcher_coalesces_and_scatters(self):
        """Concurrent submits merge into few dispatches; each caller
        gets exactly its own rows back."""
        import threading

        from poco_tpu.runtime.server import MicroBatcher

        class FakeModel:
            batch_sizes = [8]

            def __init__(self):
                self.calls = []

            def predict(self, batch):
                self.calls.append(int(batch["x"].shape[0]))
                return {"y": np.asarray(batch["x"]) * 2.0}

        fake = FakeModel()
        mb = MicroBatcher(fake, window_ms=1000.0)
        try:
            results = {}

            def worker(i):
                x = np.full((1, 3), float(i), np.float32)
                results[i] = mb.submit({"x": x})

            threads = [
                threading.Thread(target=worker, args=(i,)) for i in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            for i in range(4):
                np.testing.assert_allclose(
                    results[i]["y"], np.full((1, 3), 2.0 * i)
                )
            assert mb.request_count == 4
            # 4 near-simultaneous 1-row submits inside a 1 s window must
            # not take 4 dispatches.
            assert mb.dispatch_count < 4, fake.calls
        finally:
            mb.stop()

    def test_micro_batcher_propagates_errors(self):
        from poco_tpu.runtime.server import MicroBatcher

        class Boom:
            batch_sizes = [4]

            def predict(self, batch):
                raise RuntimeError("device on fire")

        mb = MicroBatcher(Boom(), window_ms=1.0)
        try:
            with pytest.raises(RuntimeError, match="device on fire"):
                mb.submit({"x": np.zeros((1, 2), np.float32)})
        finally:
            mb.stop()

    def test_concurrent_http_requests_are_isolated(self, artifact):
        """Distinct concurrent requests return their own predictions
        (batching must be invisible to clients)."""
        import threading

        from poco_tpu.runtime.server import PocoServer

        server = PocoServer(artifact, port=0, batch_window_ms=50.0)
        server.start(warmup=False)
        try:
            base = f"http://127.0.0.1:{server.port}"
            loaded = server.model
            rng = np.random.RandomState(7)
            imgs = rng.randn(4, 1, 224, 224, 3).astype(np.float32)

            def fetch(i, out):
                buf = io.BytesIO()
                np.savez(buf, img=imgs[i])
                req = urllib.request.Request(
                    f"{base}/predict", data=buf.getvalue(), method="POST"
                )
                out[i] = np.load(io.BytesIO(
                    urllib.request.urlopen(req, timeout=120).read()))

            got = {}
            threads = [
                threading.Thread(target=fetch, args=(i, got))
                for i in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)

            from poco_tpu.runtime.server import prepare_request_batch

            for i in range(4):
                want = loaded.predict(
                    prepare_request_batch(loaded, {"img": imgs[i]})
                )
                np.testing.assert_allclose(
                    got[i]["pred_pose"], want["pred_pose"], atol=1e-5
                )
        finally:
            server.stop()

    def test_http_roundtrip_data_parallel(self, tiny_setup, artifact, tmp_path):
        """Serving over an 8-way SPMD artifact on the virtual mesh:
        the HTTP layer must be sharding-agnostic and the dp artifact
        must reproduce the single-device one through the full stack."""
        from poco_tpu.runtime.server import PocoServer

        model, smpl, variables = tiny_setup
        dp_dir = str(tmp_path / "tiny_dp8_http")
        export_poco(
            model, variables, smpl, dp_dir,
            batch_sizes=(8,), data_parallel=8,
        )
        server = PocoServer(dp_dir, port=0).start(warmup=False)
        try:
            base = f"http://127.0.0.1:{server.port}"
            rng = np.random.RandomState(11)
            crops = rng.randn(3, 224, 224, 3).astype(np.float32)
            buf = io.BytesIO()
            np.savez(buf, img=crops)
            req = urllib.request.Request(
                f"{base}/predict", data=buf.getvalue(), method="POST"
            )
            out = np.load(io.BytesIO(
                urllib.request.urlopen(req, timeout=300).read()))
            assert out["pred_pose"].shape == (3, 24, 3, 3)

            from poco_tpu.runtime.server import prepare_request_batch

            single = load_exported(artifact)
            want = single.predict(
                prepare_request_batch(single, {"img": crops})
            )
            np.testing.assert_allclose(
                out["pred_pose"], want["pred_pose"], rtol=2e-5, atol=1e-5
            )
        finally:
            server.stop()

    def test_request_validation_rejects_bad_shapes(self, artifact):
        """Malformed requests must fail in prepare_request_batch (-> 400
        to the offender) rather than poisoning a shared micro-batch."""
        from poco_tpu.runtime.server import prepare_request_batch

        loaded = load_exported(artifact)
        with pytest.raises(ValueError, match="224x224"):
            prepare_request_batch(
                loaded, {"img": np.zeros((1, 128, 128, 3), np.float32)}
            )
        with pytest.raises(ValueError, match="bbox_info"):
            prepare_request_batch(loaded, {
                "img": np.zeros((2, 224, 224, 3), np.float32),
                "bbox_info": np.zeros((1, 3), np.float32),  # wrong leading dim
            })

    def test_prepare_request_normalizes_uint8(self, artifact):
        from poco_tpu.constants import IMG_NORM_MEAN, IMG_NORM_STD
        from poco_tpu.runtime.server import prepare_request_batch

        loaded = load_exported(artifact)
        img = np.full((1, 224, 224, 3), 255, np.uint8)
        batch = prepare_request_batch(loaded, {"img": img})
        want = (1.0 - np.asarray(IMG_NORM_MEAN)) / np.asarray(IMG_NORM_STD)
        np.testing.assert_allclose(batch["img"][0, 0, 0], want, atol=1e-6)
        assert batch["focal_length"].shape == (1,)

    def test_prepare_request_uint8_passthrough(self, artifact):
        """For a uint8_input artifact the server must NOT normalize on
        host — raw bytes pass through; float bodies are rejected."""
        from poco_tpu.runtime.server import prepare_request_batch

        loaded = load_exported(artifact)
        loaded.uint8_input = True  # view the same artifact as raw-ingest
        try:
            img = np.full((1, 224, 224, 3), 7, np.uint8)
            batch = prepare_request_batch(loaded, {"img": img})
            assert batch["img"].dtype == np.uint8
            assert batch["img"][0, 0, 0, 0] == 7
            with pytest.raises(ValueError, match="uint8"):
                prepare_request_batch(
                    loaded, {"img": np.zeros((1, 224, 224, 3), np.float32)}
                )
        finally:
            loaded.uint8_input = False


class TestBackpressure:
    """Overload behavior (runtime/server.py): shed early with 429/503
    instead of queueing every client toward the 600 s submit timeout.
    The surface this hardens replaces the reference's per-process demo
    runtime (/root/reference/pocolib/core/tester.py:55-111), which has
    no concurrent-request story at all."""

    def test_micro_batcher_sheds_over_budget_and_recovers(self):
        import threading
        import time

        from poco_tpu.runtime.server import MicroBatcher, OverloadedError

        release = threading.Event()

        class SlowModel:
            batch_sizes = [4]

            def predict(self, batch):
                release.wait(timeout=30)
                return {"y": np.asarray(batch["x"])}

        mb = MicroBatcher(SlowModel(), window_ms=1.0, max_pending_rows=2)
        try:
            done = []

            def worker():
                done.append(mb.submit({"x": np.zeros((2, 1), np.float32)}))

            t = threading.Thread(target=worker)
            t.start()
            deadline = time.time() + 10
            while mb.pending_rows < 2 and time.time() < deadline:
                time.sleep(0.005)
            assert mb.pending_rows == 2

            t0 = time.perf_counter()
            with pytest.raises(OverloadedError) as ei:
                mb.submit({"x": np.zeros((1, 1), np.float32)})
            # shed in milliseconds, not after a queue timeout
            assert time.perf_counter() - t0 < 1.0
            assert ei.value.retry_after_s >= 1.0
            assert mb.rejected_count == 1

            release.set()
            t.join(timeout=30)
            assert len(done) == 1
            # budget returned: admitted again
            out = mb.submit({"x": np.ones((1, 1), np.float32)})
            np.testing.assert_allclose(out["y"], np.ones((1, 1)))
            assert mb.pending_rows == 0
        finally:
            release.set()
            mb.stop()

    def test_http_429_when_overloaded(self, artifact):
        import urllib.error

        from poco_tpu.runtime.server import PocoServer

        server = PocoServer(artifact, port=0, max_pending_rows=0)
        server.start(warmup=False)
        try:
            base = f"http://127.0.0.1:{server.port}"
            buf = io.BytesIO()
            np.savez(buf, img=np.zeros((1, 224, 224, 3), np.float32))
            req = urllib.request.Request(
                f"{base}/predict", data=buf.getvalue(), method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 429
            assert int(ei.value.headers["Retry-After"]) >= 1
            health = json.loads(
                urllib.request.urlopen(f"{base}/healthz", timeout=30).read()
            )
            assert health["rejected"] == 1
            assert health["max_pending_rows"] == 0

            # observability window reset: counters zero, admission state
            # (the 0-row budget) untouched — the next request still 429s
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/stats/reset", data=b"", method="POST"
                ),
                timeout=30,
            ).read()
            health = json.loads(
                urllib.request.urlopen(f"{base}/healthz", timeout=30).read()
            )
            assert health["rejected"] == 0
            assert health["pending_rows_hwm"] == 0
            with pytest.raises(urllib.error.HTTPError) as ei2:
                urllib.request.urlopen(req, timeout=30)
            assert ei2.value.code == 429
        finally:
            server.stop()

    def test_expect_100_shed_before_upload(self, artifact):
        """`Expect: 100-continue` (RFC 9110): an overloaded server must
        answer 429 at the header handshake — the client never uploads
        the body — and a non-overloaded one must send 100 Continue and
        then process the body normally."""
        import socket

        from poco_tpu.runtime.server import PocoServer

        def _probe(port: int, body: bytes | None, body_len: int):
            """Send headers with Expect; return (interim_or_final_head,
            final_head_or_None, payload_bytes)."""
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
            try:
                s.sendall(
                    b"POST /predict HTTP/1.1\r\nHost: t\r\n"
                    b"Content-Length: " + str(body_len).encode() + b"\r\n"
                    b"Expect: 100-continue\r\nConnection: close\r\n\r\n"
                )
                data = b""
                while b"\r\n\r\n" not in data:
                    chunk = s.recv(65536)
                    if not chunk:
                        break
                    data += chunk
                head, rest = data.split(b"\r\n\r\n", 1)
                if body is None:
                    return head.decode("latin1"), None, rest
                s.sendall(body)
                while True:
                    chunk = s.recv(1 << 20)
                    if not chunk:
                        break
                    rest += chunk
                final_head, payload = rest.split(b"\r\n\r\n", 1)
                return head.decode("latin1"), final_head.decode(
                    "latin1"
                ), payload
            finally:
                s.close()

        buf = io.BytesIO()
        np.savez(buf, img=np.zeros((1, 224, 224, 3), np.float32))
        body = buf.getvalue()

        # Overloaded: 429 at the handshake, no body ever sent.
        server = PocoServer(artifact, port=0, max_pending_rows=0)
        server.start(warmup=False)
        try:
            head, _, _ = _probe(server.port, None, len(body))
            assert " 429 " in head.split("\r\n")[0] + " "
            assert any(
                ln.lower().startswith("retry-after:")
                for ln in head.split("\r\n")
            )
            assert server.batcher.rejected_count == 1
        finally:
            server.stop()

        # Healthy: 100 Continue handshake, then a normal 200 npz.
        server = PocoServer(artifact, port=0)
        server.start(warmup=False)
        try:
            interim, final, payload = _probe(server.port, body, len(body))
            assert "100" in interim.split("\r\n")[0]
            assert " 200 " in final.split("\r\n")[0] + " "
            out = np.load(io.BytesIO(payload))
            assert "pred_pose" in out.files
        finally:
            server.stop()

    def test_http_503_at_handler_cap(self, artifact):
        import urllib.error

        from poco_tpu.runtime.server import PocoServer

        server = PocoServer(artifact, port=0, max_handler_threads=1)
        server.start(warmup=False)
        try:
            base = f"http://127.0.0.1:{server.port}"
            # Deterministic stand-in for a slow in-flight connection:
            # hold the single handler slot while a request arrives.
            assert server.httpd._handler_slots.acquire(blocking=False)
            try:
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(f"{base}/healthz", timeout=30)
                assert ei.value.code == 503
                assert ei.value.headers["Retry-After"] == "1"
            finally:
                server.httpd._handler_slots.release()
            # slot freed: served normally again, refusal counted
            health = json.loads(
                urllib.request.urlopen(f"{base}/healthz", timeout=30).read()
            )
            assert health["status"] == "ok"
            assert server.httpd.refused_count == 1
        finally:
            server.stop()
