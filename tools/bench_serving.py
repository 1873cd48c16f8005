"""Load benchmark for the HTTP serving path (runtime/server.py).

Drives a live PocoServer with N concurrent clients over real HTTP on
localhost and reports, per (clients x crops-per-request) combo:

    p50 / p99 request latency, aggregate crops/s, and the micro-batch
    coalescence ratio (requests per device dispatch).

Also supports a `--sweep-window` mode that re-runs one combo across
micro-batch window settings to tune `batch_window_ms` by measurement
(the tuning record lives in BENCHMARKS.md "Serving under load").

    python tools/bench_serving.py                  # full combo table
    python tools/bench_serving.py --sweep-window 0,2,5,10,20

Prints one JSON line per measurement. Uses the real chip when run
outside the test env (the artifact is exported fresh for the local
platform unless --artifact is given).

The reference has no serving surface to compare against — its demo
rebuilds the model per process (/root/reference/pocolib/core/tester.py:55-111);
the baseline anchor is our own jit-path throughput (bench.py).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_payload(n_crops: int, rng: np.random.RandomState) -> bytes:
    # uint8 crops: the realistic client format (server normalizes) and
    # 4x fewer host bytes than float32 — the 1-core host must not become
    # the bottleneck it wouldn't be in production.
    crops = rng.randint(0, 256, (n_crops, 224, 224, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, img=crops)
    return buf.getvalue()


def run_combo(
    base: str,
    batcher,
    n_clients: int,
    crops_per_req: int,
    requests_per_client: int,
) -> dict:
    payloads = [
        _make_payload(crops_per_req, np.random.RandomState(100 + i))
        for i in range(n_clients)
    ]
    # settle: one request primes connections + the bucket's program
    try:
        urllib.request.urlopen(
            urllib.request.Request(f"{base}/predict", data=payloads[0],
                                   method="POST"),
            timeout=600,
        ).read()
    except urllib.error.HTTPError as e:
        raise RuntimeError(
            f"settle request failed: {e.code} {e.read().decode()[:500]}"
        ) from e

    req0, disp0 = batcher.request_count, batcher.dispatch_count
    latencies: list[list[float]] = [[] for _ in range(n_clients)]
    errors: list[str] = []

    def client(i: int) -> None:
        req = urllib.request.Request(
            f"{base}/predict", data=payloads[i], method="POST"
        )
        for _ in range(requests_per_client):
            t0 = time.perf_counter()
            try:
                urllib.request.urlopen(req, timeout=600).read()
            except Exception as e:  # noqa: BLE001 — record, don't crash the bench
                errors.append(f"{type(e).__name__}: {e}")
                return
            latencies[i].append(time.perf_counter() - t0)

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError(f"{len(errors)} client errors, first: {errors[0]}")

    lat = np.sort(np.concatenate([np.asarray(c) for c in latencies]))
    # measured, not intended: a client that errored out mid-run sent
    # fewer requests, and the coalescence ratio must use what the
    # batcher actually received
    total_reqs = batcher.request_count - req0
    dispatches = batcher.dispatch_count - disp0
    return {
        "clients": n_clients,
        "crops_per_request": crops_per_req,
        "requests": total_reqs,
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
        "crops_per_s": round(total_reqs * crops_per_req / wall, 1),
        "dispatches": int(dispatches),
        "coalescence": round(total_reqs / max(dispatches, 1), 2),
        "wall_s": round(wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", default="",
                    help="reuse an artifact (else export poco_cliff bf16)")
    ap.add_argument("--which", default="cliff", choices=["cliff", "pare"])
    ap.add_argument("--buckets", default="1,8,32,128")
    ap.add_argument("--uint8", action="store_true",
                    help="export the artifact with uint8_input=True "
                         "(raw-crop ingest, on-device normalize)")
    ap.add_argument("--compact", action="store_true",
                    help="export with fp16 vertex/joint outputs "
                         "(halves the response fetch bytes)")
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--combos", default="1x1,8x1,64x1,1x16,8x16,64x16",
                    help="comma list of <clients>x<crops_per_request>")
    ap.add_argument("--requests-per-client", type=int, default=8)
    ap.add_argument("--sweep-window", default="",
                    help="comma list of window_ms; sweeps at --sweep-combo")
    ap.add_argument("--sweep-combo", default="64x1")
    args = ap.parse_args()

    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from poco_tpu.runtime.export import export_poco, load_exported
    from poco_tpu.runtime.server import PocoServer

    buckets = tuple(int(b) for b in args.buckets.split(","))
    artifact = args.artifact
    if not artifact:
        from poco_tpu.config import model_config_from_hparams, update_hparams
        from poco_tpu.models.poco import POCO, init_poco
        from poco_tpu.smpl.assets import synthetic_smpl_model

        model = POCO(
            cfg=model_config_from_hparams(
                update_hparams(f"configs/poco_{args.which}.yaml")
            ),
            dtype=jnp.bfloat16,
        )
        smpl = synthetic_smpl_model(num_verts=6890)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl, batch_size=1)
        artifact = os.path.join(
            tempfile.gettempdir(),
            f"poco_{args.which}_serve_{'_'.join(map(str, buckets))}"
            + ("_u8" if args.uint8 else "")
            + ("_c" if args.compact else ""),
        )
        if not os.path.exists(os.path.join(artifact, "meta.json")):
            t0 = time.perf_counter()
            export_poco(
                model, variables, smpl, artifact,
                batch_sizes=buckets,
                platforms=(jax.default_backend(),),
                uint8_input=args.uint8,
                compact=args.compact,
            )
            print(f"exported -> {artifact} "
                  f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    loaded = load_exported(artifact)

    def serve(window_ms: float) -> PocoServer:
        s = PocoServer(loaded, port=0, batch_window_ms=window_ms)
        return s.start(warmup=True)

    if args.sweep_window:
        n_clients, crops = (int(v) for v in args.sweep_combo.split("x"))
        for w in (float(v) for v in args.sweep_window.split(",")):
            server = serve(w)
            try:
                row = run_combo(
                    f"http://127.0.0.1:{server.port}", server.batcher,
                    n_clients, crops, args.requests_per_client,
                )
            finally:
                server.stop()
            row = {"window_ms": w, **row}
            print(json.dumps(row), flush=True)
        return

    server = serve(args.window_ms)
    try:
        base = f"http://127.0.0.1:{server.port}"
        for combo in args.combos.split(","):
            n_clients, crops = (int(v) for v in combo.split("x"))
            row = run_combo(
                base, server.batcher, n_clients, crops,
                args.requests_per_client,
            )
            row = {"window_ms": args.window_ms, **row}
            print(json.dumps(row), flush=True)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
