"""Serve an exported POCO artifact over HTTP.

    python tools/export_model.py --cfg ... --ckpt ... --out exported/cliff
    python tools/serve_model.py --artifact exported/cliff --port 8000

    # client:
    curl -s localhost:8000/healthz
    python - <<'EOF'
    import io, urllib.request, numpy as np
    crops = np.zeros((3, 224, 224, 3), np.uint8)   # HWC uint8 crops
    buf = io.BytesIO(); np.savez(buf, img=crops)
    req = urllib.request.Request("http://localhost:8000/predict",
                                 data=buf.getvalue(), method="POST")
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
    print({k: out[k].shape for k in out.files})
    EOF
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--batch-window-ms", type=float, default=5.0,
                    help="micro-batch coalescing window (see BENCHMARKS.md "
                         "serving table for the measured tuning)")
    ap.add_argument("--max-pending-rows", type=int, default=None,
                    help="crop-denominated admission budget; beyond it "
                         "requests are shed with 429 + Retry-After "
                         "(default: 12 waves of the largest bucket)")
    ap.add_argument("--max-handler-threads", type=int, default=None,
                    help="in-flight connection cap; excess connections "
                         "get an instant 503 at accept (default 128)")
    ap.add_argument("--cpu", action="store_true",
                    help="serve on CPU (data-parallel artifacts get a "
                         "virtual device mesh of the artifact's size)")
    args = ap.parse_args()

    if args.cpu:
        # Must happen before jax initializes; dp artifacts need as many
        # devices as they were exported for.
        import json

        with open(os.path.join(args.artifact, "meta.json")) as f:
            dp = json.load(f).get("data_parallel")
        if dp:
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={dp}"
                ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    # Honor POCO_TPU_PLATFORM (the repo-wide TPU opt-out — the bundled
    # TPU plugin ignores JAX_PLATFORMS) and the persistent compile
    # cache, like every other CLI entry point.
    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    from poco_tpu.runtime.server import PocoServer

    server = PocoServer(args.artifact, host=args.host, port=args.port,
                        batch_window_ms=args.batch_window_ms,
                        max_pending_rows=args.max_pending_rows,
                        max_handler_threads=args.max_handler_threads)
    # flush: launchers (bench_serving --server-subproc) read this line
    # from a pipe to learn the bound port; without it the announce sits
    # in the block buffer forever on hosts without PYTHONUNBUFFERED
    print(f"serving {args.artifact} on {args.host}:{server.port} "
          f"(buckets {server.model.batch_sizes})", flush=True)
    try:
        server.serve_forever(warmup=not args.no_warmup)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
