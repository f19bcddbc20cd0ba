"""Device-side serving latency bench: full π₀.₅ ``sample_actions`` per action chunk.

Measures the device hot loop (prefix pass + 10-step Euler denoise with KV cache)
with N chunks fused into one program via ``lax.fori_loop`` — per-dispatch RPC over
a remote TPU tunnel (~1 s) would otherwise dominate (see PERF.md). Compare bf16 vs
int8 weights (``--int8``, kai0_tpu/ops/quant.py): serving at batch 1 is
HBM-bandwidth-bound, so halving weight bytes is the main lever.

Usage: python scripts/bench_serve.py [--int8] [--batch 1] [--chunks 20]
       python scripts/bench_serve.py --model pi0_fast [--int8]   # AR token decode
       python scripts/bench_serve.py --e2e [--int8] [--requests 30]

``--e2e`` measures the FULL action-chunk path the ≤100 ms p50 target is about:
a real WebsocketPolicyServer on localhost serving the full transform chain
(resize → tokenize → normalize → device step → unnormalize), driven through
kai0_client.WebsocketClientPolicy. Reports client-observed p50/p95 per chunk
plus the server's own infer_ms (transforms + device) — over a remote TPU tunnel
subtract its ~250 ms/dispatch RPC from the client numbers (PERF.md).
"""

import argparse
import os
import sys
import time

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
if importlib.util.find_spec("kai0_client") is None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "packages", "kai0-client", "src"))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--num_steps", type=int, default=10)
    ap.add_argument(
        "--model",
        choices=["pi05", "pi0_fast", "pi0_rtc"],
        default="pi05",
        help="pi05: 10-step Euler denoise; pi0_fast: autoregressive token decode; "
        "pi0_rtc: real-time-chunking guided denoise (vjp guidance against the "
        "previous action chunk, reference pi0_rtc.py:233-360)",
    )
    ap.add_argument(
        "--rtc_delay",
        type=int,
        default=4,
        help="pi0_rtc inference_delay in action steps (reference client: "
        "ceil(inference_time × publish_rate), ~4 at 25-30 Hz publish)",
    )
    ap.add_argument(
        "--rtc_execute_horizon",
        type=int,
        default=25,
        help="pi0_rtc execute_horizon (steps of the previous chunk executed per cycle)",
    )
    ap.add_argument(
        "--max_decoding_steps",
        type=int,
        default=256,
        help="pi0_fast only. With random bench params greedy decode hits EOS almost "
        "immediately (measures prefill); use --temperature 1 for full-length decode.",
    )
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument(
        "--fsdp_devices",
        type=int,
        default=1,
        help="FSDP-shard the params over the first N devices (multi-chip serving)",
    )
    ap.add_argument(
        "--max_token_len",
        type=int,
        default=None,
        help="override the config's padded prompt length — measures the latency-vs-"
        "prompt-length curve that prompt bucketing (serve_policy.py --prompt-buckets) exploits",
    )
    ap.add_argument("--e2e", action="store_true",
                    help="serve through a localhost WebsocketPolicyServer and report "
                         "client-observed per-chunk latency percentiles")
    ap.add_argument("--requests", type=int, default=30, help="--e2e request count (per client)")
    ap.add_argument("--clients", type=int, default=1,
                    help="--e2e concurrent client threads (latency under multi-robot load)")
    ap.add_argument("--max_batch", type=int, default=1,
                    help="--e2e server-side request coalescing (serving/batching.py)")
    ap.add_argument("--port", type=int, default=18731)
    ap.add_argument("--dummy", action="store_true",
                    help="--e2e with the debug-size model (runs anywhere, incl. CPU)")
    args = ap.parse_args()

    if args.e2e:
        if args.model != "pi05":
            ap.error(
                "--e2e serves the pi05 Euler-denoise policy only; for pi0_rtc / "
                "pi0_fast use the device-side mode (drop --e2e) — otherwise the "
                "--model/--rtc_* flags would be silently ignored"
            )
        return run_e2e(args)

    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.models import pi0_fast as _pi0_fast
    from kai0_tpu.ops import quant

    if args.model == "pi0_fast":
        config = _pi0_fast.Pi0FASTConfig()
    elif args.model == "pi0_rtc":
        from kai0_tpu.models import pi0_rtc as _pi0_rtc

        config = _pi0_rtc.Pi0RTCConfig(pi05=True)
    else:
        config = _pi0.Pi0Config(pi05=True)
    if args.max_token_len is not None:
        import dataclasses

        config = dataclasses.replace(config, max_token_len=args.max_token_len)

    @jax.jit
    def make_params(rng):
        # Init + cast (+ quantize) inside ONE jit: eager init would keep the full
        # ~13 GB f32 tree resident; in-program, each f32 leaf dies at its cast.
        p = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            config.init_params(rng),
        )
        return quant.quantize_inference_tree(p) if args.int8 else p

    params = make_params(jax.random.key(0))
    jax.block_until_ready(params)
    if args.fsdp_devices > 1:
        from kai0_tpu.parallel import sharding as _sharding

        mesh = _sharding.make_mesh(args.fsdp_devices, devices=jax.devices()[: args.fsdp_devices])
        params = jax.device_put(params, _sharding.fsdp_sharding(params, mesh))
    obs = config.fake_obs(args.batch)

    if args.model == "pi0_fast":
        sample_kwargs = {"max_decoding_steps": args.max_decoding_steps, "temperature": args.temperature}
    elif args.model == "pi0_rtc":
        # The marquee deployment mode: guided denoise against the previously
        # returned chunk. prev_action_chunk/delay are traced values in the same
        # jitted program a serving process would run each cycle.
        prev = jax.random.uniform(
            jax.random.key(7), (args.batch, config.action_horizon, config.action_dim),
            minval=-1.0, maxval=1.0, dtype=jnp.float32,
        )
        sample_kwargs = {
            "num_steps": args.num_steps,
            "prev_action_chunk": prev,
            "inference_delay": args.rtc_delay,
            "execute_horizon": args.rtc_execute_horizon,
        }
    else:
        sample_kwargs = {"num_steps": args.num_steps}

    def one(params, obs, rng):
        actions = config.sample_actions(params, rng, obs, **sample_kwargs)
        return jax.random.fold_in(rng, 0), actions

    @jax.jit
    def many(params, obs, rng):
        # params/obs are jit ARGS: closing over them would embed multi-GB arrays
        # as MLIR constants (device->host fetch + compile blow-up). The init carry
        # counts as chunk 1 of args.chunks (the loop runs chunks-1 more).
        def body(i, carry):
            rng, _ = carry
            return one(params, obs, rng)

        _, actions = jax.lax.fori_loop(0, args.chunks - 1, body, one(params, obs, rng))
        return actions

    t0 = time.time()
    a = many(params, obs, jax.random.key(1))
    _ = float(jnp.sum(a.astype(jnp.float32)))
    print(f"compile+run {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    a = many(params, obs, jax.random.key(2))
    _ = float(jnp.sum(a.astype(jnp.float32)))
    dt = (time.time() - t0) / args.chunks
    mode = "int8" if args.int8 else "bf16"
    print(f"{args.model} sample_actions[{mode}] batch={args.batch}: {dt * 1000:.1f} ms/chunk")


def run_e2e(args):
    """Client-observed action-chunk latency through the real websocket stack."""
    import tempfile
    import threading

    import numpy as np

    from kai0_client.websocket_client_policy import WebsocketClientPolicy
    from kai0_tpu.ops import quant
    from kai0_tpu.policies import policy_config as _policy_config
    from kai0_tpu.policies.agilex_policy import make_agilex_example
    from kai0_tpu.serving.websocket_policy_server import WebsocketPolicyServer
    from kai0_tpu.training import config as _config

    config = _config.get_config("debug_serve" if args.dummy else "pi05_flatten_fold_normal")

    @jax.jit
    def make_params(rng):
        p = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            config.model.init_params(rng),
        )
        return quant.quantize_inference_tree(p) if args.int8 else p

    params = make_params(jax.random.key(0))
    jax.block_until_ready(params)

    with tempfile.TemporaryDirectory(prefix="bench_serve_") as tmp:
        policy = _policy_config.create_trained_policy(
            config, tmp, params=params, warmup=True,
            sample_kwargs={"num_steps": args.num_steps} if not args.dummy else {"num_steps": 2},
            default_prompt="fold the cloth",
            max_batch=args.max_batch,
        )

    server = WebsocketPolicyServer(policy, host="127.0.0.1", port=args.port)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    example = make_agilex_example()

    def drive(results: list):
        client = WebsocketClientPolicy(host="127.0.0.1", port=args.port)
        client_ms, infer_ms, prev_total_ms, transform_ms, stage_ms = [], [], [], [], []
        for i in range(args.requests + 2):
            t0 = time.monotonic()
            out = client.infer(dict(example))
            dt = (time.monotonic() - t0) * 1000
            if i < 2:  # warm the socket + any residual jits
                continue
            client_ms.append(dt)
            infer_ms.append(out["server_timing"]["infer_ms"])
            if "transform_ms" in out["server_timing"]:
                transform_ms.append(out["server_timing"]["transform_ms"])
                stage_ms.append(out["server_timing"].get("stage_ms", 0.0))
            if "prev_total_ms" in out["server_timing"]:
                prev_total_ms.append(out["server_timing"]["prev_total_ms"])
        results.append((client_ms, infer_ms, prev_total_ms, transform_ms, stage_ms))

    results: list = []
    t_all = time.monotonic()
    if args.clients == 1:
        drive(results)
    else:
        threads = [threading.Thread(target=drive, args=(results,)) for _ in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    wall = time.monotonic() - t_all

    client_ms = [x for r in results for x in r[0]]
    infer_ms = [x for r in results for x in r[1]]
    prev_total_ms = [x for r in results for x in r[2]]
    transform_ms = [x for r in results for x in r[3]]
    stage_ms = [x for r in results for x in r[4]]

    def pct(xs, q):
        return float(np.percentile(np.asarray(xs), q)) if xs else float("nan")

    mode = "int8" if args.int8 else "bf16"
    print(
        f"e2e[{mode}] clients={args.clients} max_batch={args.max_batch} "
        f"{len(client_ms)} chunks ({len(client_ms) / wall:.1f} chunks/s aggregate): "
        f"client p50={pct(client_ms, 50):.1f} p95={pct(client_ms, 95):.1f} ms | "
        f"server infer p50={pct(infer_ms, 50):.1f} p95={pct(infer_ms, 95):.1f} ms | "
        f"transforms p50={pct(transform_ms, 50):.1f} ms (staging {pct(stage_ms, 50):.1f}) | "
        f"server total p50={pct(prev_total_ms, 50):.1f} ms"
    )


if __name__ == "__main__":
    main()
