"""Sampling server: an AOT-compiled DDIM sampler behind a tiny HTTP API.

The deployment-side counterpart of the training recipes: load a
checkpoint (or a fresh model for smoke runs), compile the full DDIM
reverse chain ONCE as a single XLA program specialised to the serving
batch, and serve it over HTTP with no Python model code on the hot path.
With `--export-path` the compiled sampler is serialised via `jax.export`
(utils/export.py) so a later process can serve without constructing the
network at all — the framework analogue of the reference's
TorchScript-export deployment story (reference tests/utils.py:720-744;
the zoo inference bundles' scripts/sampler.py are the serving surface
this replaces).

API:
    GET  /healthz            -> {"status": "ok", "batch": B, "shape": [...]}
    POST /sample             -> body {"n": 2, "seed": 123}; returns JSON
                                {"shape", "dtype", "data_b64"} where
                                data_b64 is a base64 .npy of (n, C, *spatial)

Usage:
    python -m generativemodels_tpu.recipes.serve --port 8765 --ddim-steps 50
    python -m generativemodels_tpu.recipes.serve --oneshot --out sample.npy
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp

from ..inferers import DiffusionInferer
from ..networks.nets import DiffusionModelUNet
from ..networks.schedulers import DDIMScheduler, DPMSolverMultistepScheduler
from ..utils import CheckpointManager, enable_persistent_compilation_cache
from ..utils.export import load_exported, save_exported


def build_sampler(
    *,
    spatial_dims: int = 2,
    size: int = 64,
    channels: tuple[int, ...] = (128, 256, 256),
    norm_groups: int = 32,
    batch: int = 1,
    ddim_steps: int = 50,
    checkpoint_dir: str | None = None,
    solver: str = "ddim",
):
    """Build `sample_fn(seed_scalar) -> (B, 1, *spatial) images` + metadata.

    The function is pure (params closed over) and takes a plain int32
    seed so it can be exported/reloaded without PRNG-key plumbing.
    """
    model = DiffusionModelUNet(
        spatial_dims=spatial_dims, in_channels=1, out_channels=1,
        num_res_blocks=1, num_channels=tuple(channels),
        attention_levels=(False,) + (True,) * (len(channels) - 1),
        num_head_channels=channels[-1], norm_num_groups=norm_groups,
    )
    shape = (batch, 1) + (size,) * spatial_dims
    x0 = jnp.zeros(shape)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((batch,), jnp.int32)
    )
    params = variables["params"]
    if checkpoint_dir:
        mgr = CheckpointManager(checkpoint_dir)
        restored = mgr.restore(template={"params": params, "step": 0})
        params = restored["params"]
        mgr.close()

    if solver in ("dpmsolver", "sde-dpmsolver"):
        # DPM-Solver++ (2M): DDIM-50-equivalent quality at 10-20 steps —
        # the serving-latency knob (see docs/PERFORMANCE.md "Fast solvers");
        # sde- prefix selects the stochastic variant (sample diversity)
        scheduler = DPMSolverMultistepScheduler(
            num_train_timesteps=1000,
            algorithm_type="sde-dpmsolver++" if solver == "sde-dpmsolver" else "dpmsolver++",
        )
    else:
        scheduler = DDIMScheduler(num_train_timesteps=1000)
    scheduler.set_timesteps(ddim_steps)
    inferer = DiffusionInferer(scheduler)

    def sample_fn(seed):
        key = jax.random.PRNGKey(seed)
        k_noise, k_loop = jax.random.split(key)
        noise = jax.random.normal(k_noise, shape)
        return inferer.sample(
            noise,
            lambda x, t, context=None: model.apply({"params": params}, x, t),
            key=k_loop,
        )

    return sample_fn, shape


class _SamplerState:
    """Compiled sampler + a lock serialising device compute."""

    def __init__(self, fn, shape):
        self.fn = fn
        self.shape = shape
        self.lock = threading.Lock()
        self.served = 0

    def sample(self, n: int, seed: int) -> np.ndarray:
        batch = self.shape[0]
        outs = []
        with self.lock:
            for i in range((n + batch - 1) // batch):
                outs.append(np.asarray(self.fn(jnp.int32(seed + i))))
            self.served += n
        return np.concatenate(outs, axis=0)[:n]


def _make_handler(state: _SamplerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "batch": state.shape[0],
                    "shape": list(state.shape),
                    "served": state.served,
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("n", 1))
                seed = int(req.get("seed", 0))
                if n < 1 or n > 64 * state.shape[0]:
                    raise ValueError(f"n out of range: {n}")
            except (ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
                return
            try:
                imgs = state.sample(n, seed)
            except Exception as e:  # device OOM, platform mismatch, ...
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            buf = io.BytesIO()
            np.save(buf, imgs)
            self._json(200, {
                "shape": list(imgs.shape),
                "dtype": str(imgs.dtype),
                "data_b64": base64.b64encode(buf.getvalue()).decode(),
            })

    return Handler


def start_server(state: _SamplerState, port: int = 0) -> ThreadingHTTPServer:
    """Start the HTTP server on a daemon thread; returns it (``.server_port``)."""
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(state))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--spatial-dims", type=int, default=2, choices=[2, 3])
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--channels", type=int, nargs="+", default=[128, 256, 256])
    parser.add_argument("--norm-groups", type=int, default=32)
    parser.add_argument("--batch", type=int, default=1,
                        help="compiled serving batch (requests round up)")
    parser.add_argument("--ddim-steps", type=int, default=50,
                        help="sampling step count (any --solver)")
    parser.add_argument("--solver", type=str, default="ddim",
                        choices=["ddim", "dpmsolver", "sde-dpmsolver"],
                        help="dpmsolver = DPM-Solver++ (2M): DDIM-50 quality "
                        "at 10-20 steps")
    parser.add_argument("--checkpoint-dir", type=str, default=None)
    parser.add_argument("--export-path", type=str, default=None,
                        help="serialise the compiled sampler here (jax.export); "
                        "if the file exists, serve it WITHOUT building the model")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--oneshot", action="store_true",
                        help="sample one batch and exit (no HTTP)")
    parser.add_argument("--out", type=str, default="sample.npy")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import os

    shape = (args.batch, 1) + (args.size,) * args.spatial_dims
    if args.export_path and os.path.exists(args.export_path):
        print(f"serving exported sampler from {args.export_path} (no model build)")
        fn = load_exported(args.export_path)
    else:
        sample_fn, shape = build_sampler(
            spatial_dims=args.spatial_dims, size=args.size,
            channels=tuple(args.channels), norm_groups=args.norm_groups,
            batch=args.batch, ddim_steps=args.ddim_steps,
            checkpoint_dir=args.checkpoint_dir, solver=args.solver,
        )
        fn = jax.jit(sample_fn)
        if args.export_path:
            save_exported(args.export_path, sample_fn, jnp.int32(0))
            print(f"exported sampler -> {args.export_path}")

    t0 = time.time()
    first = fn(jnp.int32(args.seed))
    jax.block_until_ready(first)
    dt = time.time() - t0
    # the exported blob's compiled batch wins over the CLI flags: an
    # exported-with---batch-1 sampler restarted with --batch 4 must not
    # silently return 1 image per request
    shape = tuple(first.shape)
    print(f"warmup sample ({shape}, DDIM-{args.ddim_steps}): {dt:.1f}s "
          f"(compile included; steady-state is cached)")

    if args.oneshot:
        np.save(args.out, np.asarray(first))
        print(f"wrote {args.out}")
        return

    state = _SamplerState(fn, shape)
    httpd = start_server(state, args.port)
    print(f"serving on http://127.0.0.1:{httpd.server_port} "
          f"(POST /sample {{\"n\": 1, \"seed\": 0}})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
