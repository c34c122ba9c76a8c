"""Benchmark: sampled waveforms/sec/chip, flagship latent-spectrogram EDM.

Measures the reference's headline hot path (SURVEY §3.2 / BASELINE.json
metric): 25-step deterministic Heun EDM sampling = 49 UNet forwards on
8x32x32 latents + one VAE decode to 3x128x128 log-spectrograms, with the
full-size flagship architecture (2D UNet model_channels=128, mult
(1,2,4,4), attn@ds8; /root/reference/tqdne/architectures.py:61-79 and
experiments/train_latent_edm.py).  bfloat16 compute / f32 params &
sampler accumulator, one chip, one jit-compiled scan.

The reference publishes no throughput numbers (BASELINE.json.published
= {}), so vs_baseline is reported against an internally recorded
first-measurement anchor if present (BENCH_ANCHOR.json), else 1.0.

Output contract (round-2 lesson: the driver's budget expired before the
round-2 bench printed anything, BENCH_r02.json rc=124; round-4 lesson:
a wall-clock budget charged compile time to the secondaries, so a cold
compilation cache reduced the tail from five metrics to one):
  - the HEADLINE Heun JSON is measured first and printed IMMEDIATELY
    (flushed), before any secondary program compiles;
  - the budget gates MEASUREMENT time only — compile/warmup time is
    explicitly excluded, because the persistent compilation cache
    (.jax_cache) is gitignored/NOT committed and a driver run starts
    cold (~20-60 s per program).  Secondaries therefore always run
    unless measurement itself has consumed the budget;
  - secondaries are ordered by evidence value: training throughput
    (BASELINE.json's companion headline) first, then the deployment
    point (dpmpp_2m@10), the trained-student consistency points, and
    the remaining solver/e2e numbers;
  - each emitted line carries a "weights" field stating truthfully
    which parameters were measured (trained checkpoint vs random init
    — throughput is weight-independent, quality claims are not);
  - the headline JSON is re-printed after EVERY secondary and as the
    LAST line — the line the driver parses — so a driver timeout at any
    point still leaves the headline as the last complete JSON line;
  - a final RECAP block re-prints every secondary once just before the
    last headline line, so a driver that records only a capped tail of
    stdout still captures every metric (the interleaved reprints would
    otherwise push the earliest secondaries off the tail).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp

from tqdne_tpu.cli.common import enable_compilation_cache

enable_compilation_cache()

# secondaries run only while accumulated MEASUREMENT time stays under this
# (seconds).  Compile/warmup is excluded: it is cache-state dependent
# (cold driver checkout vs warm builder tree) and charging it to the
# budget is what reduced BENCH_r04's tail to a single metric.  Total
# measurement across all seven metrics is ~60-90 s; the default leaves
# headroom without letting a pathological measurement run unbounded.
BUDGET = float(os.environ.get("TQDNE_BENCH_BUDGET", "240"))
_MEASURED = 0.0


def _charge(dt: float) -> None:
    global _MEASURED
    _MEASURED += dt


def within_budget() -> bool:
    return _MEASURED < BUDGET


HEADLINE_METRIC = "sampled_waveforms_per_sec_per_chip_edm_heun_latent2d"
ANCHOR_PATH = Path(__file__).parent / "BENCH_ANCHOR.json"


def _load_anchors() -> dict:
    if ANCHOR_PATH.exists():
        return json.loads(ANCHOR_PATH.read_text())
    return {}


def _anchor_for(metric: str) -> float | None:
    """Per-metric first-measurement anchor (VERDICT r3 #4: every emitted
    metric gets round-over-round regression detection, not just the
    headline).  Legacy top-level "value" is the headline's anchor; all
    others live under "metrics".  Read-only at bench time: BENCH_ANCHOR.json
    is a committed artifact, and mutating it at runtime would dirty the tree
    on every machine and let per-machine anchors silently diverge.  A new
    metric reports vs_baseline 1.0 until its first measurement is committed
    (TQDNE_BENCH_RECORD_ANCHORS=1 opts into recording, for the builder)."""
    anchors = _load_anchors()
    if metric == HEADLINE_METRIC:
        if anchors.get("value"):
            return float(anchors["value"])
    else:
        m = anchors.get("metrics", {})
        if metric in m:
            return float(m[metric])
    return None


def _maybe_record_anchor(metric: str, value: float) -> None:
    if not os.environ.get("TQDNE_BENCH_RECORD_ANCHORS"):
        return
    anchors = _load_anchors()
    if metric == HEADLINE_METRIC:
        if anchors.get("value"):
            return
        anchors["value"] = value
        anchors.setdefault("note", "first recorded measurement (anchor)")
    else:
        m = anchors.setdefault("metrics", {})
        if metric in m:
            return
        m[metric] = value
    ANCHOR_PATH.write_text(json.dumps(anchors, indent=1, sort_keys=True))


_EMITTED: list[str] = []


def emit(metric: str, value: float, unit: str = "waveforms/sec/chip",
         weights: str | None = None, _recap: bool = False):
    anchor = _anchor_for(metric)
    _maybe_record_anchor(metric, value)
    vs_baseline = value / anchor if anchor else 1.0
    line = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 4),
    }
    if weights is not None:
        # truthful provenance of the measured parameters (VERDICT r4 #3):
        # throughput is weight-independent, but quality claims attached to a
        # metric name are not — so the line itself states what it measured
        line["weights"] = weights
    text = json.dumps(line)
    if not _recap and metric != HEADLINE_METRIC:
        _EMITTED.append(text)
    print(text, flush=True)


def recap():
    """Re-print every secondary once, in order, just before the final
    headline line.  The driver records only a TAIL of bench stdout; with
    headline reprints interleaved after every secondary (crash insurance),
    the earliest — highest-value — secondaries would be the first to fall
    off a capped tail.  The recap guarantees the last ~8 lines contain
    every measured metric exactly once, followed by the headline."""
    for text in _EMITTED:
        print(text, flush=True)


def build_sampler(batch: int):
    from tqdne_tpu import configs
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.train.steps import make_edm_steps

    cfg = configs.LatentSpectrogramConfig(workdir=".")
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 128, 128, 3))
    # jit the inits: eager init dispatches hundreds of tiny compiles through
    # the axon tunnel (~minutes); one jitted+cached program takes seconds
    ae_vars = jax.jit(ae.init)({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)

    ucfg = configs.get_2d_unet_config(cfg, in_channels=8, out_channels=8)
    unet = UNet(**ucfg, dtype=jnp.bfloat16)
    latent_shape = (batch, 32, 32, 8)
    params = jax.jit(unet.init)(
        jax.random.key(2), jnp.zeros((1, 32, 32, 8)), jnp.zeros((1,)), jnp.zeros((1, 5))
    )

    _, _, sample_fn = make_edm_steps(unet, tx=None, autoencoder=ae, num_sampling_steps=25)

    cond = jnp.zeros((batch, 5))

    @jax.jit
    def run(params, ae_vars, key):
        return sample_fn(params, key, latent_shape, cond=cond, ae_vars=ae_vars,
                         cast_params=jnp.bfloat16)

    @jax.jit
    def run_dpmpp(params, ae_vars, key):
        return sample_fn(params, key, latent_shape, cond=cond, ae_vars=ae_vars,
                         cast_params=jnp.bfloat16, solver="dpmpp_2m")

    @jax.jit
    def run_dpmpp10(params, ae_vars, key):
        # the recommended deployment point: best measured FID of any
        # solver/step configuration (12.0 vs Heun-25's 22.0, NFE sweep in
        # docs/quality/README.md) at 10 network evals
        return sample_fn(params, key, latent_shape, cond=cond, ae_vars=ae_vars,
                         cast_params=jnp.bfloat16, solver="dpmpp_2m", num_steps=10)

    return (lambda key: run(params, ae_vars, key),
            lambda key: run_dpmpp(params, ae_vars, key),
            lambda key: run_dpmpp10(params, ae_vars, key))


def build_consistency_sampler(batch: int, num_steps: int = 2):
    """num_steps-eval consistency-model sampling at the flagship latent
    shape + VAE decode — the algorithmic lever beyond solver order (49 Heun
    evals -> 1-2; /root/reference/tqdne/consistency_model.py:81-106).

    Weights: when a trained distilled student exists in qrun/ (the quality
    loop's workdir — the same model docs/quality's CD reports describe),
    its checkpoint is loaded so the throughput number and the quality
    evidence name the SAME run (VERDICT r3 weak #2); otherwise random
    init, which measures the same program (throughput depends on
    architecture, not weights)."""
    distill_dir = Path(__file__).parent / "qrun" / "outputs" / \
        "Latent-Distill-32x32x8-LogSpectrogram"
    if distill_dir.exists():
        try:
            from tqdne_tpu.cli import common

            bundle = common.build_inference(
                "latent_distill", str(distill_dir.parent.parent),
                jnp.bfloat16, num_steps=num_steps)
            run = bundle.jit_sample(batch)
            cond = jnp.zeros((batch, 5))
            print("# consistency secondary: trained CD student (qrun)", flush=True)
            return (lambda key: run(key, cond)), "trained-cd-student(qrun)"
        except (Exception, SystemExit) as e:  # pragma: no cover - qrun varies
            # SystemExit too: build_inference raises it for a run dir with
            # no checkpoint yet (e.g. mid-training), and it would otherwise
            # sail through every Exception fence and kill the whole bench
            print(f"# consistency secondary: qrun restore failed ({e}); "
                  "falling back to random init", flush=True)
    if num_steps != 2:
        # the 1-eval point is only meaningful with the trained student
        # (its quality rows live in docs/quality); skip on random init
        return None, "absent"
    from tqdne_tpu import configs
    from tqdne_tpu.diffusion.consistency import ConsistencyConfig, make_consistency_steps
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet

    cfg = configs.LatentSpectrogramConfig(workdir=".")
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg, dtype=jnp.bfloat16)
    ae_vars = jax.jit(ae.init)(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3)),
    )
    ucfg = configs.get_2d_unet_config(cfg, in_channels=8, out_channels=8)
    unet = UNet(**ucfg, dtype=jnp.bfloat16)
    params = jax.jit(unet.init)(
        jax.random.key(2), jnp.zeros((1, 32, 32, 8)), jnp.zeros((1,)), jnp.zeros((1, 5))
    )
    _, _, sample_fn = make_consistency_steps(unet, None, ConsistencyConfig(), max_steps=1)
    latent_shape = (batch, 32, 32, 8)
    cond = jnp.zeros((batch, 5))

    @jax.jit
    def run(params, ae_vars, key):
        lat = sample_fn(params, key, latent_shape, sigmas=(1.0,), cond=cond)
        return ae.apply(ae_vars, lat.astype(jnp.bfloat16), method="decode")

    return (lambda key: run(params, ae_vars, key)), "random-init"


def build_invert(batch: int):
    """On-device Griffin-Lim phase recovery: signal -> 3x4064 waveforms.
    Combined with the sampler this is the full user-facing generation path
    (the headline metric matches the reference's semantics where inversion
    is caller-side, SURVEY §3.2; the e2e secondary includes it)."""
    from tqdne_tpu import configs
    from tqdne_tpu.ops import spectral as jspectral

    cfg = configs.LatentSpectrogramConfig(workdir=".")
    rep = cfg.make_representation()
    log_clip, log_max, ceiling = rep.log_clip, rep.log_max, rep.log_spec_ceiling
    t = cfg.t or 4064

    @jax.jit
    def invert(signal, key):
        x = jnp.moveaxis(signal.astype(jnp.float32), -1, 1)  # (B, 3, F, T)
        log_spec = (x + 1) / 2 * (log_max - log_clip) + log_clip
        mag = jnp.exp(jnp.minimum(log_spec, ceiling))
        mag = jnp.concatenate([mag, jnp.zeros_like(mag[..., :1, :])], axis=-2)
        return jspectral.griffin_lim(mag, key, rep.n_fft, rep.hop, t, n_iter=rep.n_iter)

    return invert


def measure_throughput(fn, batch: int, iters: int, key0: int) -> float:
    """Compile+warmup (uncharged), then time `iters` dispatches ended by a
    scalar fetch.  The fetch, not block_until_ready, ends the timing: the
    relay's ready-notifications proved unreliable for some programs
    (returned in 0.2 ms for a 400 ms Griffin-Lim chain,
    scripts/profile_griffin_lim.py), while a scalar fetch cannot complete
    before the computation does.  Only the timed loop is charged to the
    measurement budget."""
    out = fn(jax.random.key(key0))
    float(out.sum())
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.key(key0 + 1 + i))
    float(out.sum())
    dt = time.perf_counter() - t0
    _charge(dt)
    return batch * iters / dt


def main():
    # batch 64 is ~12% faster than 32 on v5e (BENCH_NOTES.md).  NOTE: the
    # persistent compilation cache (.jax_cache) is local-only (gitignored,
    # NOT committed) — a driver run compiles cold, which is exactly why the
    # budget below charges measurement time only.
    batch = 64
    run, run_dpmpp, run_dpmpp10 = build_sampler(batch)

    wps = measure_throughput(run, batch, iters=5, key0=0)
    headline = (HEADLINE_METRIC, wps)
    emit(*headline)  # early print: never lose the headline to an overrun

    # secondary 1: flagship training step throughput (BASELINE.json names
    # "training samples/sec" as the companion headline; VERDICT r3 #3 / r4 #1
    # — the highest-value secondary, so it runs FIRST)
    if within_budget():
        try:
            import bench_train

            v = bench_train.measure(batch=128, iters=20)
            _charge(128 * 20 / v)  # the exact timed-loop duration
            emit("train_samples_per_sec_per_chip_latent_edm", v,
                 unit="samples/sec/chip", weights="random-init")
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# train secondary failed: {e}", flush=True)
        emit(*headline)  # keep the headline the last complete line

    # secondary 2: dpmpp_2m at 10 steps — the recommended deployment point
    # (best measured FID of any configuration, docs/quality NFE sweep)
    if within_budget():
        try:
            emit("sampled_waveforms_per_sec_per_chip_dpmpp2m_10step_latent2d",
                 measure_throughput(run_dpmpp10, batch, iters=5, key0=60),
                 weights="random-init")
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# dpmpp10 secondary failed: {e}", flush=True)
        emit(*headline)  # keep the headline the last complete line

    # secondary 3: 1-eval distilled-student sampling (trained weights only —
    # the quality evidence for this operating point is the CD table in
    # docs/quality/README.md; skipped when no trained student is on disk)
    if within_budget():
        try:
            run_cd1, w_cd1 = build_consistency_sampler(batch, num_steps=1)
            if run_cd1 is not None:
                emit("sampled_waveforms_per_sec_per_chip_cd1_latent2d",
                     measure_throughput(run_cd1, batch, iters=3, key0=300),
                     weights=w_cd1)
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# cd1 secondary failed: {e}", flush=True)
        emit(*headline)  # keep the headline the last complete line

    # secondary 4: 2-eval consistency sampling at the flagship shape (the
    # fewer-network-evals lever; quality evidence lives in the trained
    # consistency run, docs/quality)
    if within_budget():
        try:
            run_cm, w_cm = build_consistency_sampler(batch)
            emit("sampled_waveforms_per_sec_per_chip_consistency2_latent2d",
                 measure_throughput(run_cm, batch, iters=3, key0=200),
                 weights=w_cm)
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# consistency secondary failed: {e}", flush=True)
        emit(*headline)  # keep the headline the last complete line

    # secondary 5: DPM-Solver++(2M) at 25 steps (N evals vs Heun's 2N-1;
    # beyond reference — the headline stays Heun for reference-semantics
    # comparability)
    if within_budget():
        try:
            emit("sampled_waveforms_per_sec_per_chip_dpmpp2m_latent2d",
                 measure_throughput(run_dpmpp, batch, iters=3, key0=50),
                 weights="random-init")
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# dpmpp secondary failed: {e}", flush=True)
        emit(*headline)  # keep the headline the last complete line

    # secondary 6: end-to-end to waveforms (sampling + decode + on-device
    # Griffin-Lim x128)
    if within_budget():
        try:
            invert = build_invert(batch)

            def run_e2e(key):
                return invert(run(key), key)

            emit("e2e_waveforms_per_sec_per_chip_incl_griffin_lim",
                 measure_throughput(run_e2e, batch, iters=3, key0=100),
                 weights="random-init")
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# e2e secondary failed: {e}", flush=True)

    # recap every secondary, then the headline LAST — the driver parses the
    # last JSON line, and its recorded tail now contains every metric even
    # if the interleaved early prints scrolled off a capped tail
    recap()
    emit(*headline)


if __name__ == "__main__":
    main()
