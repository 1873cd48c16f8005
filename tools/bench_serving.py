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
    gc_off: bool = False,
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
    if gc_off:
        # Loopback is a ≤5%-spread regression trend: a GC pause over the
        # multi-MB npz buffers mid-window is protocol noise, not a path
        # regression. Collect before the timed window and keep the
        # collector off only WHILE timing; the finally guarantees the
        # enable even on KeyboardInterrupt mid-join.
        import gc

        gc.collect()
        gc.disable()
    try:
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
    finally:
        if gc_off:
            gc.enable()
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
    stats_fn,
    rss_mb_fn,
    n_clients: int,
    crops_per_req: int,
    duration_s: float,
) -> dict:
    """Flood the server past its admission budget and measure the SHAPE
    of the failure: rejected requests must fail in milliseconds (429/503
    + Retry-After), accepted ones must still complete, host memory must
    stay flat (bounded queue + bounded handler threads), and the
    pending-row high-water mark must respect the configured budget.

    `stats_fn()` returns the /healthz-shaped counter dict (read after
    the flood); `rss_mb_fn()` returns the SERVER's peak RSS in MB —
    with --server-subproc that is the server process alone, so the
    memory verdict is not polluted by the flood clients' own payload
    buffers living in the same process.
    """

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

    rss0 = rss_mb_fn()
    tally_lock = threading.Lock()
    ok_lat: list[float] = []
    shed_lat: list[float] = []
    shed_codes: dict[int, int] = {}
    retry_afters: list[int] = []
    conn_resets = [0]
    errors: list[str] = []
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

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    # Expect-probe phase: while the flood saturates the budget, measure
    # the decision latency of Expect: 100-continue sheds — rejection
    # WITHOUT the multi-MB upload (see expect_shed_probe).
    time.sleep(min(2.0, duration_s / 4))
    host, port = base.split("//", 1)[1].split(":")
    probe_lat: list[float] = []
    probe_shed = 0
    body_len = len(payloads[0])
    for _ in range(50):
        if time.monotonic() >= stop_at:
            break
        try:
            status, dt, _ra = expect_shed_probe(host, int(port), body_len)
        except OSError:
            continue  # accept-time 503 reset under the herd: not a probe
        if status in (429, 503):
            probe_shed += 1
            probe_lat.append(dt)
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    rss1 = rss_mb_fn()
    stats = stats_fn()
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
        "expect_probes_shed": probe_shed,
        "expect_shed_p50_ms": (
            round(float(np.percentile(probe_lat, 50)) * 1e3, 2)
            if probe_lat else None
        ),
        "expect_shed_p99_ms": (
            round(float(np.percentile(probe_lat, 99)) * 1e3, 2)
            if probe_lat else None
        ),
        "pending_rows_hwm": stats["pending_rows_hwm"],
        "budget_rows": stats["max_pending_rows"],
        "rss_peak_delta_mb": round(rss1 - rss0, 1),
        "refused_at_accept": stats["refused_at_accept"],
    }


def expect_shed_probe(
    host: str, port: int, body_len: int, timeout: float = 30.0
) -> tuple[int, float, int | None]:
    """Raw HTTP/1.1 POST with `Expect: 100-continue` (RFC 9110).

    Returns (status, seconds_to_decision, retry_after). On a shed (429)
    the body was NEVER sent — the decision latency is connect+headers,
    the true cost of rejection, with no upload/drain pacing in it.
    (urllib cannot send Expect, hence the raw socket.)"""
    import socket

    s = socket.create_connection((host, port), timeout=timeout)
    try:
        req = (
            f"POST /predict HTTP/1.1\r\nHost: {host}\r\n"
            f"Content-Length: {body_len}\r\n"
            f"Expect: 100-continue\r\nConnection: close\r\n\r\n"
        )
        t0 = time.perf_counter()
        s.sendall(req.encode())
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
        dt = time.perf_counter() - t0
        head = data.split(b"\r\n\r\n", 1)[0].decode("latin1", "replace")
        parts = head.split()
        if len(parts) < 2 or not parts[1].isdigit():
            # Empty/garbled response (e.g. the accept-refusal path's raw
            # sendall failed and the socket closed clean): surface as the
            # connection-level failure it is, so callers' OSError
            # handling skips the probe instead of crashing the flood.
            raise OSError(f"no HTTP status in response: {head[:80]!r}")
        status = int(parts[1])
        retry_after = None
        for ln in head.split("\r\n"):
            if ln.lower().startswith("retry-after:"):
                retry_after = int(ln.split(":", 1)[1])
        return status, dt, retry_after
    finally:
        s.close()


def _vm_hwm_mb(pid: int) -> float:
    """Peak RSS (VmHWM) of a process, in MB, from /proc."""
    with open(f"/proc/{pid}/status") as f:
        for ln in f:
            if ln.startswith("VmHWM:"):
                return int(ln.split()[1]) / 1024.0
    raise RuntimeError(f"no VmHWM in /proc/{pid}/status")


def _spawn_server_subproc(artifact: str, args):
    """Launch tools/serve_model.py on the artifact and wait for warmup.

    Returns (proc, base_url). The separate process is what makes the
    overload memory verdict meaningful: in-process, ru_maxrss counts the
    flood clients' own payload buffers (256 clients x multi-MB bodies)
    on top of the server's."""
    import re
    import subprocess

    env = dict(os.environ)
    if args.loopback:
        env["POCO_TPU_PLATFORM"] = "cpu"
    cmd = [
        sys.executable, "tools/serve_model.py", "--artifact", artifact,
        "--host", "127.0.0.1", "--port", "0",
        "--batch-window-ms", str(args.window_ms),
    ]
    if args.max_pending_rows is not None:
        cmd += ["--max-pending-rows", str(args.max_pending_rows)]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = proc.stdout.readline()
    m = re.search(r"on 127\.0\.0\.1:(\d+)", line)
    if not m:
        proc.terminate()
        raise RuntimeError(f"server did not announce a port: {line!r}")
    base = f"http://127.0.0.1:{m.group(1)}"
    # healthz answers only once the accept loop runs, i.e. after warmup
    deadline = time.monotonic() + 600
    while True:
        try:
            urllib.request.urlopen(f"{base}/healthz", timeout=5).read()
            return proc, base
        except Exception:  # noqa: BLE001 — retry until warm or dead
            if proc.poll() is not None:
                raise RuntimeError(
                    f"server subprocess died during warmup (rc={proc.returncode})"
                ) from None
            if time.monotonic() > deadline:
                proc.terminate()
                raise RuntimeError("server warmup timed out") from None
            time.sleep(0.5)


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
    ap.add_argument("--overload-floods", type=int, default=2,
                    help="repeat the flood N times against the same "
                         "server; a ~zero peak-RSS delta on flood 2+ is "
                         "the memory-stays-flat proof (peak is monotonic)")
    ap.add_argument("--server-subproc", action="store_true",
                    help="run the server as its own process "
                         "(tools/serve_model.py) so the overload memory "
                         "verdict measures the SERVER's peak RSS, not "
                         "the flood clients' buffers")
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

    _loaded_box: list = []

    def serve(window_ms: float) -> PocoServer:
        # Lazy (--overload --server-subproc never serves in-process)
        # but cached: the window sweep re-serves per setting and must
        # not reload + re-upload the artifact each time.
        if not _loaded_box:
            _loaded_box.append(load_exported(artifact))
        s = PocoServer(_loaded_box[0], port=0, batch_window_ms=window_ms,
                       max_pending_rows=args.max_pending_rows)
        return s.start(warmup=True)

    if args.overload:
        def _flood(base: str, stats_fn, rss_fn) -> None:
            for i in range(args.overload_floods):
                if i:
                    # Each flood must report its OWN counters (HWM,
                    # rejections), not flood 0's all-time peak echoed.
                    urllib.request.urlopen(
                        urllib.request.Request(
                            f"{base}/stats/reset", data=b"", method="POST"
                        ),
                        timeout=60,
                    ).read()
                row = run_overload(
                    base, stats_fn, rss_fn,
                    args.overload_clients, args.overload_crops,
                    args.overload_duration,
                )
                row["flood"] = i
                print(json.dumps(row), flush=True)

        if args.server_subproc:
            proc, base = _spawn_server_subproc(artifact, args)
            try:
                def stats_fn() -> dict:
                    with urllib.request.urlopen(
                        f"{base}/healthz", timeout=60
                    ) as r:
                        return json.loads(r.read())

                _flood(base, stats_fn, lambda: _vm_hwm_mb(proc.pid))
            finally:
                import subprocess as _sp

                proc.terminate()
                try:
                    proc.wait(timeout=30)
                except _sp.TimeoutExpired:
                    # mid-compile servers can be slow to honor SIGTERM;
                    # don't orphan them or fail completed measurements
                    proc.kill()
                    proc.wait(timeout=10)
        else:
            import resource

            server = serve(args.window_ms)
            try:
                def stats_fn() -> dict:
                    b = server.batcher
                    return {
                        "pending_rows_hwm": b.pending_rows_hwm,
                        "max_pending_rows": b.max_pending_rows,
                        "refused_at_accept": server.httpd.refused_count,
                    }

                _flood(
                    f"http://127.0.0.1:{server.port}", stats_fn,
                    lambda: resource.getrusage(
                        resource.RUSAGE_SELF
                    ).ru_maxrss / 1024.0,
                )
            finally:
                server.stop()
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
                    args.requests_per_client, gc_off=args.loopback,
                )
                row = {"window_ms": args.window_ms, **row}
                if args.repeats > 1:
                    row["run"] = r
                print(json.dumps(row), flush=True)
                runs.append(row["crops_per_s"])
            if args.repeats > 1:
                # bench.py's self-adjudicating spread discipline: re-run
                # runs deviating >5% from the median (the host shows
                # ~4.5% raw compute jitter + nonzero VM steal time, so a
                # single polluted window must not set the round's trend).
                from bench import _adjudicate_chains

                runs, adjudication = _adjudicate_chains(
                    runs,
                    lambda: run_combo(
                        base, server.batcher, n_clients, crops,
                        args.requests_per_client, gc_off=args.loopback,
                    )["crops_per_s"],
                )
                med = float(np.median(runs))
                spread = (max(runs) - min(runs)) / med * 100 if med else 0.0
                print(json.dumps({
                    "combo": combo,
                    "loopback": bool(args.loopback),
                    "median_crops_per_s": round(med, 1),
                    "spread_pct": round(spread, 2),
                    "runs": runs,
                    **adjudication,
                }), flush=True)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
