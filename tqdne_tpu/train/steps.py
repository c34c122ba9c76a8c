"""Jit-able train / eval / sample step factories for every model family.

Each factory returns pure functions over (TrainState, batch, rng key) so
the training loop can `jax.jit` them once with sharding annotations:
batch sharded on the mesh's data axis, params replicated — XLA then
inserts the gradient all-reduce over ICI, replacing Lightning DDP
(reference call stack: SURVEY §3.1).

Batches are dicts of channels-last arrays: {"signal": (B, *S, C),
"cond": (B, F)?, "cond_signal": ...?, "label": (B,)?} mirroring the
reference batch contract (/root/reference/tqdne/dataset.py:74-83).

Reference loss semantics reimplemented here:
- EDM:        edm.py:115-134  (lognormal sigma, weighted MSE; optional
              frozen-VAE encode of the signal before diffusion)
- VAE:        autoencoder.py:59-84  (recon MSE + kl_weight * KL)
- classifier: classifier.py:61-66  (weighted CE)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from tqdne_tpu.diffusion import edm as edm_lib
from tqdne_tpu.diffusion import sampler as sampler_lib
from tqdne_tpu.train.state import TrainState, apply_updates


def infer_latent_shape(autoencoder, ae_vars, signal_shape: tuple[int, ...]) -> tuple[int, ...]:
    """Latent shape (without batch) for a given signal shape — the
    reference infers it with a dummy encode (edm.py:154-157); here a
    zero-cost abstract evaluation."""
    out = jax.eval_shape(
        lambda x: autoencoder.apply(
            ae_vars, x, method="encode", rngs={"sample": jax.random.key(0)}
        ),
        jax.ShapeDtypeStruct((1, *signal_shape), jnp.float32),
    )
    return tuple(out.shape[1:])


# --------------------------------------------------------------------------
# EDM diffusion (optionally latent)
# --------------------------------------------------------------------------


def make_edm_steps(
    unet,
    tx: optax.GradientTransformation,
    edm_cfg: edm_lib.EDMConfig = edm_lib.EDMConfig(),
    *,
    autoencoder=None,
    ema_decay: float = 0.999,
    num_sampling_steps: int = 25,
    deterministic_sampling: bool = True,
    device_representation=None,
    latent_moments: bool = False,
):
    """Returns (train_step, eval_step, sample_fn).

    ``latent_moments=True`` (latent mode only): batches carry precomputed
    frozen-AE moments ("latent_mean"/"latent_log_std", written by
    tqdne-precompute-latents) and the step samples the latent directly —
    the encoder forward (deterministic per sample, recomputed every step
    by the reference) disappears from the hot loop: 60.2 -> 46.0 ms/step
    on the flagship (BENCH_NOTES round 2).

    ``device_representation`` (optional): a jax transform (channels-last
    waveform -> signal, ops/representation.py) applied INSIDE the jitted
    step — the loader then ships raw waveforms and the host never computes
    the representation (the reference does this in DataLoader workers,
    which bottlenecks TPU-rate training).

    If ``autoencoder`` is given, diffusion runs in its latent space: the
    train step encodes the signal with the *frozen* AE params (passed per
    call so they can be replicated/donated independently), and the
    sampler decodes at the end (edm.py:97-101,121-124,167-168 parity).
    """

    latent = autoencoder is not None
    if latent_moments and not latent:
        raise ValueError("latent_moments requires an autoencoder (for decode)")

    def _encode(ae_vars, x, key):
        return autoencoder.apply(ae_vars, x, method="encode", rngs={"sample": key})

    def _signal(batch):
        if device_representation is not None:
            return device_representation(batch["waveform"])
        return batch["signal"]

    def _latent_from_moments(batch, key):
        mean, log_std = batch["latent_mean"], batch["latent_log_std"]
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return mean + eps * jnp.exp(log_std)

    def _loss(params, batch, key, ae_vars):
        key_ae, key_ae2, key_edm, key_drop = jax.random.split(key, 4)
        cond = batch.get("cond")
        cond_signal = batch.get("cond_signal")
        if latent_moments:
            if cond_signal is not None:
                raise ValueError("cached latents do not support cond_signal pairs")
            sample = _latent_from_moments(batch, key_ae)
        else:
            sample = _signal(batch)
            if latent:
                sample = _encode(ae_vars, sample, key_ae)
                if cond_signal is not None:
                    cond_signal = _encode(ae_vars, cond_signal, key_ae2)

        def net_apply(x, noise_cond, c):
            return unet.apply(params, x, noise_cond, c, train=True, rngs={"dropout": key_drop})

        return edm_lib.edm_loss(
            edm_cfg, net_apply, key_edm, sample, cond_signal=cond_signal, cond=cond
        )

    def train_step(state: TrainState, batch, key, ae_vars=None):
        loss, grads = jax.value_and_grad(_loss)(state.params, batch, key, ae_vars)
        new_state = apply_updates(state, grads, tx, ema_decay)
        return new_state, {"loss": loss}

    def eval_step(state: TrainState, batch, key, ae_vars=None):
        """Validation loss with EMA params (the reference swaps EMA in for
        every val/test/predict; ema.py:30-48)."""
        key_ae, key_ae2, key_edm, _ = jax.random.split(key, 4)
        cond = batch.get("cond")
        cond_signal = batch.get("cond_signal")
        if latent_moments:
            if cond_signal is not None:
                raise ValueError("cached latents do not support cond_signal pairs")
            sample = _latent_from_moments(batch, key_ae)
        else:
            sample = _signal(batch)
            if latent:
                sample = _encode(ae_vars, sample, key_ae)
                if cond_signal is not None:
                    cond_signal = _encode(ae_vars, cond_signal, key_ae2)

        def net_apply(x, noise_cond, c):
            return unet.apply(state.ema_params, x, noise_cond, c)

        loss = edm_lib.edm_loss(
            edm_cfg, net_apply, key_edm, sample, cond_signal=cond_signal, cond=cond
        )
        return {"loss": loss}

    def sample_fn(
        params,
        key,
        shape: tuple[int, ...],
        cond=None,
        cond_signal=None,
        ae_vars=None,
        num_steps: int | None = None,
        acc_dtype=jnp.float32,
        cast_params=None,
        solver: str = "heun",
        eps_sharding=None,
    ):
        """EDM Heun sampling; with an AE the given ``shape`` is the *latent*
        shape and the output is decoded to signal space (edm.py:146-169).

        ``eps_sharding``: optional sharding constraint on the initial noise
        (see diffusion.sampler.sample) — the hook for
        parallel.spatial's small-batch serving layout.

        Use ``latent_shape(ae_cfg, signal_shape)`` or an encode dry-run to
        get the latent shape.

        ``cast_params`` (dtype or None): pre-cast the weights ONCE before
        the sampling scan — with bf16 compute this removes 2N-1 in-loop
        f32->bf16 casts of the full parameter set (pure HBM traffic).
        """
        if cast_params is not None:
            params = jax.tree_util.tree_map(lambda p: p.astype(cast_params), params)
        key_enc, key_sample = jax.random.split(key)
        if latent and cond_signal is not None:
            cond_signal = _encode(ae_vars, cond_signal, key_enc)

        def denoise_fn(x, sigma):
            def net_apply(xx, noise_cond, c):
                return unet.apply(params, xx, noise_cond, c)

            return edm_lib.precondition(
                edm_cfg, net_apply, x, sigma, cond_signal=cond_signal, cond=cond
            )

        out = sampler_lib.sample(
            denoise_fn,
            key_sample,
            shape,
            edm_cfg,
            num_steps=num_steps or num_sampling_steps,
            deterministic=deterministic_sampling,
            acc_dtype=acc_dtype,
            solver=solver,
            eps_sharding=eps_sharding,
        )
        if latent:
            out = autoencoder.apply(ae_vars, out.astype(jnp.float32), method="decode")
        return out

    return train_step, eval_step, sample_fn


# --------------------------------------------------------------------------
# VAE autoencoder
# --------------------------------------------------------------------------


def make_autoencoder_steps(ae, tx, *, kl_weight: float = 1e-6, ema_decay: float = 0.999,
                           device_representation=None):
    """Returns (train_step, eval_step) for the KL-VAE.

    ``device_representation``: optional jax transform (channels-last
    waveform -> signal) applied inside the jitted step, so the loader
    ships raw waveforms and the host never computes the spectrogram /
    envelope (same contract as make_edm_steps)."""
    from tqdne_tpu.models.autoencoder import kl_divergence

    ae_train = ae.clone(train=True)
    ae_eval = ae.clone(train=False)

    def _signal(batch):
        if device_representation is not None:
            return device_representation(batch["waveform"])
        return batch["signal"]

    def _losses(params, batch, key, train):
        key_s, key_s2, key_drop = jax.random.split(key, 3)
        mod = ae_train if train else ae_eval

        def run(x, k):
            rngs = {"sample": k}
            if train:
                rngs["dropout"] = key_drop
            mean, log_std = mod.apply(params, x, method="moments", rngs=rngs)
            eps = jax.random.normal(k, mean.shape, mean.dtype)
            z = mean + eps * jnp.exp(log_std)
            recon = mod.apply(params, z, method="decode", rngs=rngs)
            recon_loss = jnp.mean((x - recon) ** 2)
            kl = jnp.mean(kl_divergence(mean, log_std))
            return recon_loss, kl

        recon_loss, kl = run(_signal(batch), key_s)
        loss = recon_loss + kl_weight * kl
        metrics = {"reconstruction_loss": recon_loss, "kl_divergence": kl, "loss": loss}
        if "cond_signal" in batch and batch["cond_signal"] is not None:
            c_recon, c_kl = run(batch["cond_signal"], key_s2)
            cond_loss = c_recon + kl_weight * c_kl
            metrics |= {"cond_reconstruction_loss": c_recon, "cond_kl_divergence": c_kl}
            loss = loss + cond_loss
        return loss, metrics

    def train_step(state: TrainState, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: _losses(p, batch, key, True), has_aux=True
        )(state.params)
        new_state = apply_updates(state, grads, tx, ema_decay)
        return new_state, metrics

    def eval_step(state: TrainState, batch, key):
        _, metrics = _losses(state.ema_params, batch, key, False)
        return metrics

    return train_step, eval_step


# --------------------------------------------------------------------------
# Classifier
# --------------------------------------------------------------------------


def make_classifier_steps(clf, tx, class_weights, *, ema_decay: float = 0.999,
                          device_representation=None):
    """Returns (train_step, eval_step, metric_postprocess).

    Validation emits per-class confusion COUNTS (tp / predicted / true);
    the postprocess turns the epoch-aggregated counts into the reference's
    torchmetrics set — MulticlassAccuracy/Recall/Precision/F1, macro
    averaged (/root/reference/tqdne/classifier.py:61-76) — which is only
    correct after aggregation, not per batch.
    """
    from tqdne_tpu.models.classifier import weighted_cross_entropy

    cw = jnp.asarray(class_weights)
    num_classes = len(class_weights)
    clf_train = clf.clone(train=True)
    clf_eval = clf.clone(train=False)

    def _loss(params, batch, key, train):
        rngs = {"dropout": key} if train else None
        signal = (device_representation(batch["waveform"])
                  if device_representation is not None else batch["signal"])
        logits = (clf_train if train else clf_eval).apply(params, signal, rngs=rngs)
        loss = weighted_cross_entropy(logits, batch["label"], cw)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return loss, {"loss": loss, "accuracy": acc, "logits": logits}

    def train_step(state: TrainState, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: _loss(p, batch, key, True), has_aux=True
        )(state.params)
        metrics.pop("logits")
        new_state = apply_updates(state, grads, tx, ema_decay)
        return new_state, metrics

    def eval_step(state: TrainState, batch, key):
        _, metrics = _loss(state.ema_params, batch, key, False)
        logits = metrics.pop("logits")
        pred = jnp.argmax(logits, -1)
        label = batch["label"]
        pred_1h = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
        true_1h = jax.nn.one_hot(label, num_classes, dtype=jnp.float32)
        metrics["tp_counts"] = jnp.sum(pred_1h * true_1h, axis=0)  # (C,)
        metrics["pred_counts"] = jnp.sum(pred_1h, axis=0)
        metrics["true_counts"] = jnp.sum(true_1h, axis=0)
        return metrics

    def metric_postprocess(means: dict) -> dict:
        import numpy as np

        tp = np.asarray(means.pop("tp_counts"))
        pred = np.asarray(means.pop("pred_counts"))
        true = np.asarray(means.pop("true_counts"))
        with np.errstate(invalid="ignore", divide="ignore"):
            precision = np.where(pred > 0, tp / pred, 0.0)
            recall = np.where(true > 0, tp / true, 0.0)
            f1 = np.where(precision + recall > 0,
                          2 * precision * recall / (precision + recall), 0.0)
        # macro averages over classes that appear (torchmetrics ignores
        # absent classes in macro averaging)
        seen = true > 0
        denom = max(int(seen.sum()), 1)
        return dict(
            means,
            macro_accuracy=float(recall[seen].sum() / denom),  # = macro recall
            macro_precision=float(precision[seen].sum() / denom),
            macro_recall=float(recall[seen].sum() / denom),
            macro_f1=float(f1[seen].sum() / denom),
        )

    return train_step, eval_step, metric_postprocess
