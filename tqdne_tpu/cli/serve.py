"""`tqdne-serve` — long-lived HTTP generation service (beyond reference).

Builds the same InferenceBundle as `tqdne-generate-waveforms` (any model
family / solver, /root/reference/tqdne/generate_waveforms.py semantics),
pins weights on device, warms the jitted sampler, then serves coalesced
micro-batches over HTTP (tqdne_tpu/serving.py).

    tqdne-serve --config latent_edm --workdir runs/flagship --port 8000
    curl -s localhost:8000/generate -d '{"conditions": [{"hypocentral_distance": 50,
      "magnitude": 5.5, "vs30": 400, "hypocentre_depth": 20, "azimuthal_gap": 100}]}'
"""

from __future__ import annotations

import argparse

import numpy as np

import jax

from tqdne_tpu import serving
from tqdne_tpu.cli import common


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-serve", description=__doc__)
    parser.add_argument("--workdir", type=str, default=".")
    parser.add_argument("--config", type=str, default="latent_edm")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--ae-name", type=str, default=None)
    parser.add_argument("--solver", type=str, default="heun",
                        choices=["heun", "dpmpp_2m", "consistency", "distill"])
    parser.add_argument("--num_steps", "--num-steps", type=int, default=None)
    parser.add_argument("--batch_size", "--batch-size", type=int, default=32,
                        help="device batch size: the ONE compiled shape; requests "
                             "are padded/coalesced to it")
    parser.add_argument("--max-delay-ms", type=float, default=15.0,
                        help="micro-batching window: how long a partial batch "
                             "waits for more requests before launching")
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--spatial", type=int, default=0,
                        help="split each sample's spatial extent K ways over a "
                             "(data, model) device mesh (low-latency small batches)")
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--stats-from-dataset", action="store_true",
                        help="normalize conditioning with the workdir dataset stats "
                             "instead of the published summary table")
    parser.add_argument("--gl-iters", type=int, default=32,
                        help="Griffin-Lim iterations for waveform inversion. "
                             "Serving default 32 = the measured knee "
                             "(docs/quality/gl_iter_sweep.json: spectral "
                             "convergence within 5%% of the 128-iteration "
                             "floor at 3.2x less device time, ASD-vs-real no "
                             "worse); pass 128 for exact reference parity "
                             "(the generate/evaluate CLIs keep 128)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args(argv)

    common.setup_logging()
    from tqdne_tpu.cli.generate_waveforms import SUMMARY_STATISTICS

    if args.solver == "consistency" and args.config == "latent_edm":
        args.config = "latent_consistency"
    if args.solver == "distill" and args.config == "latent_edm":
        args.config = "latent_distill"
    if args.num_steps is None:
        args.num_steps = 2 if args.config in (
            "consistency", "latent_consistency", "latent_distill") else 25

    bundle = common.build_inference(
        args.config, args.workdir, common.parse_dtype(args.dtype),
        num_steps=args.num_steps, tiny=args.tiny, run_name=args.name,
        ae_name=args.ae_name, solver=args.solver, int8=args.int8,
        spatial=args.spatial, gl_iters=args.gl_iters,
    )

    stats = (common.dataset_feature_stats(bundle.config) if args.stats_from_dataset
             else SUMMARY_STATISTICS)

    def normalize(cond_raw: np.ndarray) -> np.ndarray:
        return (cond_raw - stats[:, 0]) / stats[:, 1]

    batcher = serving.Microbatcher.from_bundle(
        bundle, args.batch_size, max_delay_ms=args.max_delay_ms)

    # warm up BEFORE binding the port so /healthz readiness is truthful
    # (first compile through the remote tunnel can take minutes cold)
    print(f"warming up {args.config} sampler (batch {args.batch_size}, "
          f"{args.num_steps} steps, {args.solver})...", flush=True)
    batcher.generate(np.zeros((1, len(serving.FEATURES)), np.float32), seed=0)

    info = {
        "config": args.config, "solver": args.solver, "num_steps": args.num_steps,
        "batch_size": args.batch_size, "dtype": args.dtype,
        "t": bundle.t, "channels": bundle.sig_shape[-1],
        "features": list(serving.FEATURES),
        "devices": [str(d) for d in jax.devices()],
        "spatial": args.spatial, "int8": bool(args.int8),
    }
    server = serving.make_server(batcher, normalize, info,
                                 host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        batcher.shutdown()


if __name__ == "__main__":
    main()
