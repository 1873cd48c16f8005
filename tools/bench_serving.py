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


def run_overload(
    base: str,
    server,
    n_clients: int,
    crops_per_req: int,
    duration_s: float,
) -> dict:
    """Flood the server past its admission budget and measure the SHAPE
    of the failure: rejected requests must fail in milliseconds (429/503
    + Retry-After), accepted ones must still complete, host memory must
    stay flat (bounded queue + bounded handler threads), and the
    pending-row gauge must respect the configured budget."""
    import resource

    payloads = [
        _make_payload(crops_per_req, np.random.RandomState(500 + i))
        for i in range(n_clients)
    ]
    # settle (primes the bucket program so accepted-latency is warm).
    # A 429 here is a legitimate configuration (e.g. --max-pending-rows
    # smaller than one settle payload): proceed unwarmed rather than die.
    try:
        urllib.request.urlopen(
            urllib.request.Request(f"{base}/predict", data=payloads[0],
                                   method="POST"),
            timeout=600,
        ).read()
    except urllib.error.HTTPError as e:
        if e.code not in (429, 503):
            raise RuntimeError(
                f"settle request failed: {e.code} {e.read().decode()[:500]}"
            ) from e
        e.read()
        print(f"settle request shed ({e.code}); measuring cold",
              file=sys.stderr)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    tally_lock = threading.Lock()
    ok_lat: list[float] = []
    shed_lat: list[float] = []
    shed_codes: dict[int, int] = {}
    retry_afters: list[int] = []
    conn_resets = [0]
    errors: list[str] = []
    max_pending = [0]
    stop_at = time.monotonic() + duration_s

    def client(i: int) -> None:
        req = urllib.request.Request(
            f"{base}/predict", data=payloads[i], method="POST"
        )
        while time.monotonic() < stop_at:
            t0 = time.perf_counter()
            try:
                urllib.request.urlopen(req, timeout=600).read()
                with tally_lock:
                    ok_lat.append(time.perf_counter() - t0)
            except urllib.error.HTTPError as e:
                dt = time.perf_counter() - t0
                if e.code in (429, 503):
                    ra = e.headers.get("Retry-After")
                    with tally_lock:
                        shed_lat.append(dt)
                        shed_codes[e.code] = shed_codes.get(e.code, 0) + 1
                        if ra:
                            retry_afters.append(int(ra))
                    e.read()
                else:
                    with tally_lock:
                        errors.append(f"HTTP {e.code}: {e.read()[:200]}")
                    return
            except (urllib.error.URLError, ConnectionError, OSError) as e:
                # Expected under deliberate overload: the accept-time 503
                # path (and a shed whose body exceeded the drain cap)
                # close connections that can reset mid-exchange. Count,
                # don't die — the run's purpose is measuring this regime.
                with tally_lock:
                    conn_resets[0] += 1
            except Exception as e:  # noqa: BLE001 — record, don't crash
                with tally_lock:
                    errors.append(f"{type(e).__name__}: {e}")
                return
            with tally_lock:
                max_pending[0] = max(
                    max_pending[0], server.batcher.pending_rows
                )

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    if errors:
        raise RuntimeError(f"{len(errors)} client errors, first: {errors[0]}")

    ok = np.sort(np.asarray(ok_lat)) if ok_lat else np.asarray([np.nan])
    shed = np.sort(np.asarray(shed_lat)) if shed_lat else np.asarray([np.nan])
    return {
        "scenario": "overload",
        "clients": n_clients,
        "crops_per_request": crops_per_req,
        "duration_s": round(wall, 1),
        "accepted": len(ok_lat),
        "rejected": len(shed_lat),
        "rejected_by_code": shed_codes,
        "accepted_crops_per_s": round(len(ok_lat) * crops_per_req / wall, 1),
        "accepted_p50_ms": round(float(np.percentile(ok, 50)) * 1e3, 1),
        "accepted_p99_ms": round(float(np.percentile(ok, 99)) * 1e3, 1),
        "shed_p50_ms": round(float(np.percentile(shed, 50)) * 1e3, 2),
        "shed_p99_ms": round(float(np.percentile(shed, 99)) * 1e3, 2),
        "retry_after_s_median": (
            int(np.median(retry_afters)) if retry_afters else None
        ),
        "conn_resets": conn_resets[0],
        "max_pending_rows_seen": max_pending[0],
        "budget_rows": server.batcher.max_pending_rows,
        "rss_delta_mb": round((rss1 - rss0) / 1024.0, 1),
        "refused_at_accept": server.httpd.refused_count,
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
    ap.add_argument("--overload", action="store_true",
                    help="overload scenario: flood past the admission "
                         "budget for --overload-duration seconds and "
                         "report shed latency / memory / budget adherence")
    ap.add_argument("--overload-clients", type=int, default=256)
    ap.add_argument("--overload-crops", type=int, default=16)
    ap.add_argument("--overload-duration", type=float, default=30.0)
    ap.add_argument("--max-pending-rows", type=int, default=None)
    ap.add_argument("--loopback", action="store_true",
                    help="weather-proof serving-PATH number: tiny "
                         "backbone on CPU, in-process localhost — no "
                         "axon tunnel, no full-width model; isolates "
                         "validation->coalesce->dispatch-ahead->scatter")
    ap.add_argument("--repeats", type=int, default=1,
                    help="re-run each combo N times; report per-run rows "
                         "plus a median+spread summary (bench.py "
                         "discipline; use >=5 for --loopback)")
    args = ap.parse_args()

    if args.loopback:
        # Force CPU BEFORE jax initializes: the point of loopback is a
        # number with no tunnel weather in it (BENCHMARKS.md records
        # 20x session-to-session RTT swings on the axon path).
        os.environ["POCO_TPU_PLATFORM"] = "cpu"

    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from poco_tpu.runtime.export import export_poco, load_exported
    from poco_tpu.runtime.server import PocoServer

    buckets = tuple(int(b) for b in args.buckets.split(","))
    artifact = args.artifact
    if not artifact:
        from poco_tpu.models.poco import POCO, init_poco
        from poco_tpu.smpl.assets import synthetic_smpl_model

        if args.loopback:
            # Tiny backbone, full-size SMPL outputs: the model compute
            # is negligible, the serving path (validate, coalesce,
            # dispatch, scatter, npz-encode 6890-vert meshes) is not —
            # exactly the regression surface this mode trends.
            from poco_tpu.models.poco import PocoConfig

            cfg = PocoConfig(
                backbone="tiny-cliff", num_neurons=(64,), context_dim=64,
            )
            model = POCO(cfg=cfg)
        else:
            from poco_tpu.config import (
                model_config_from_hparams,
                update_hparams,
            )

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
            + ("_c" if args.compact else "")
            + ("_loopback" if args.loopback else ""),
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
        s = PocoServer(loaded, port=0, batch_window_ms=window_ms,
                       max_pending_rows=args.max_pending_rows)
        return s.start(warmup=True)

    if args.overload:
        server = serve(args.window_ms)
        try:
            row = run_overload(
                f"http://127.0.0.1:{server.port}", server,
                args.overload_clients, args.overload_crops,
                args.overload_duration,
            )
        finally:
            server.stop()
        print(json.dumps(row), flush=True)
        return

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
            runs = []
            for r in range(args.repeats):
                row = run_combo(
                    base, server.batcher, n_clients, crops,
                    args.requests_per_client,
                )
                row = {"window_ms": args.window_ms, **row}
                if args.repeats > 1:
                    row["run"] = r
                print(json.dumps(row), flush=True)
                runs.append(row["crops_per_s"])
            if args.repeats > 1:
                med = float(np.median(runs))
                spread = (max(runs) - min(runs)) / med * 100 if med else 0.0
                print(json.dumps({
                    "combo": combo,
                    "loopback": bool(args.loopback),
                    "median_crops_per_s": round(med, 1),
                    "spread_pct": round(spread, 2),
                    "runs": runs,
                }), flush=True)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
