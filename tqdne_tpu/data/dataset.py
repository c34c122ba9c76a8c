"""HDF5-backed datasets with the reference's deterministic split.

Storage contract (SURVEY L-1; /root/reference/experiments/build_dataset.py):
``preprocessed_waveforms.h5`` with keys
- waveforms:                (N, 3, T) float32
- normalized_features:      (N, 5) float32 (z-scored conditioning)
- indices_valid_waveforms:  (N,) int    (last valid sample per trace)
- per-feature raw arrays:   hypocentral_distance, magnitude, vs30,
                            hypocentre_depth, azimuthal_gap

Split parity with /root/reference/tqdne/dataset.py:34-51: a seed-42
numpy permutation, 85/5/10 train/validation/test, plus "train_validation"
and "full".

Unlike the torch map-style dataset (per-item reads in worker processes),
batches are read as *sorted slabs* from HDF5 and representations are
applied vectorized over the whole batch — see tqdne_tpu.data.pipeline.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tqdne_tpu.data.representation import Representation


def split_indices(n: int, split: str, seed: int = 42) -> np.ndarray:
    indices = np.arange(n)
    rng = np.random.default_rng(seed=seed)
    shuffled = rng.permutation(indices)
    n_train = int(n * 0.85)
    n_val = int(n * 0.9)
    if split == "full":
        return indices
    if split == "train":
        return shuffled[:n_train]
    if split == "validation":
        return shuffled[n_train:n_val]
    if split == "train_validation":
        return shuffled[:n_val]
    if split == "test":
        return shuffled[n_val:]
    raise ValueError(f"Unknown split {split}")


def _row_gather(file_idx: np.ndarray):
    """h5py slab-read plan for arbitrary row indices: returns
    (uniq, restore) where ``dset[uniq][restore]`` yields rows in the
    requested order (h5py requires strictly increasing unique indices)."""
    order = np.argsort(file_idx)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    uniq, uinv = np.unique(file_idx[order], return_inverse=True)
    return uniq, uinv[inv]


class Dataset:
    """Seismic waveform dataset (dataset.py:7-83 parity)."""

    def __init__(
        self,
        datapath: str | Path,
        representation: Representation,
        cut: int | None = None,
        cond: bool = False,
        split: str = "train",
    ):
        import h5py

        self.representation = representation
        self.cut = cut
        self.use_conditioning = cond
        self.file = h5py.File(datapath, "r", locking=False)
        self.waveforms = self.file["waveforms"]
        self.cond = self.file["normalized_features"] if cond else None
        self.indices = split_indices(len(self.waveforms), split)

    def sorted_indices(self) -> np.ndarray:
        return np.sort(self.indices)

    def get_feature(self, key: str) -> np.ndarray:
        return self.file[key][:][self.indices]

    def close(self):
        self.file.close()

    def __len__(self) -> int:
        return len(self.indices)

    def load_batch(self, batch_indices: np.ndarray,
                   keys: tuple[str, ...] | None = None) -> dict:
        """Read a batch (dataset-relative indices) as a dict of numpy arrays.

        Reads HDF5 rows in sorted order (libhdf5 requirement + locality),
        then restores the requested order.  Representation is applied
        vectorized over the whole batch.

        ``keys``: optional subset to MATERIALIZE, not just filter — when
        neither "waveform" nor "signal" is requested the waveform slab
        read and the host representation are skipped entirely (cached-
        latent training needs only moments + cond; reading and then
        discarding the waveforms cost ~8 s per 27-step epoch, round 5).
        """
        want = keys.__contains__ if keys is not None else (lambda k: True)
        uniq, restore = _row_gather(self.indices[batch_indices])
        out: dict = {}
        if want("waveform") or want("signal"):
            waveforms = self.waveforms[uniq][restore]
            if self.cut:
                waveforms = waveforms[:, :, : self.cut]
            if want("waveform"):
                out["waveform"] = waveforms.astype(np.float32)
            if want("signal"):
                signal = self.representation.get_representation(waveforms)
                out["signal"] = np.asarray(signal, dtype=np.float32)
        if want("valid_index"):
            valid = self.file["indices_valid_waveforms"][uniq][restore]
            out["valid_index"] = np.asarray(valid, dtype=np.int32)
        if self.use_conditioning and want("cond"):
            out["cond"] = self.cond[uniq][restore].astype(np.float32)
        return out

    def __getitem__(self, index: int) -> dict:
        batch = self.load_batch(np.array([index]))
        return {k: v[0] for k, v in batch.items()}


class CachedLatentsDataset(Dataset):
    """Dataset whose batches carry precomputed frozen-AE latent moments
    (latents-<ae_name>.h5 written by tqdne-precompute-latents) instead of
    host-computed signals — the train step samples the latent directly
    (train/steps.py latent_moments mode).  Rows of the sidecar align with
    the dataset's storage order, so the same split indices apply."""

    def __init__(self, datapath, latents_path, representation, *, cut=None,
                 cond: bool = True, split: str = "train"):
        import h5py

        super().__init__(datapath, representation, cut=cut, cond=cond, split=split)
        self.latents_file = h5py.File(latents_path, "r", locking=False)
        n_lat = self.latents_file["latent_mean"].shape[0]
        n_wf = self.file["waveforms"].shape[0]
        if n_lat != n_wf:
            raise ValueError(
                f"latents file has {n_lat} rows but the dataset has {n_wf} — "
                "re-run tqdne-precompute-latents after rebuilding the dataset"
            )

    def close(self):
        super().close()
        self.latents_file.close()

    def load_batch(self, batch_indices: np.ndarray,
                   keys: tuple[str, ...] | None = None) -> dict:
        out = super().load_batch(batch_indices, keys)
        want = keys.__contains__ if keys is not None else (lambda k: True)
        if want("latent_mean") or want("latent_log_std"):
            uniq, restore = _row_gather(self.indices[batch_indices])
            if want("latent_mean"):
                out["latent_mean"] = self.latents_file["latent_mean"][uniq][restore]
            if want("latent_log_std"):
                out["latent_log_std"] = self.latents_file["latent_log_std"][uniq][restore]
        return out


class ClassificationDataset(Dataset):
    """Magnitude x distance bin labels (dataset.py:86-112 parity):
    label = dist_bin * (n_mag_bins - 1) + mag_bin."""

    def __init__(self, datapath, representation, mag_bins, dist_bins, cut=None, split="train"):
        super().__init__(datapath, representation, cut=cut, cond=False, split=split)
        dist = self.file["hypocentral_distance"][:]
        mag = self.file["magnitude"][:]
        self.labels = (
            (np.digitize(dist, dist_bins) - 1) * (len(mag_bins) - 1)
            + np.digitize(mag, mag_bins)
            - 1
        )
        self.num_classes = (len(mag_bins) - 1) * (len(dist_bins) - 1)

    def get_class_weights(self) -> np.ndarray:
        """Inverse-frequency class weights (dataset.py:103-107)."""
        return np.array(
            [1.0 / max((self.labels == c).sum(), 1) for c in range(self.num_classes)],
            dtype=np.float32,
        )

    def load_batch(self, batch_indices: np.ndarray,
                   keys: tuple[str, ...] | None = None) -> dict:
        out = super().load_batch(batch_indices, keys)
        if keys is None or "label" in keys:
            out["label"] = self.labels[self.indices[batch_indices]].astype(np.int32)
        return out


class PairedDataset:
    """Paired observed/synthetic waveforms for signal-to-signal tasks
    (upsampling / simulation enhancement).

    Capability parity with SeisbenchDataset
    (/root/reference/tqdne/dataset.py:115-178): two aligned datasets,
    quality filters (SNR > 1.5 on every channel, data_ratio < 10),
    deterministic seed-42 90/10 split, and batches carrying both
    ``signal`` and ``cond_signal``.  Storage here is a plain HDF5 pair
    with "waveforms" (N, C, T) plus optional per-trace "snr" (N, C) and
    "data_ratio" (N,) arrays (the seisbench-metadata equivalents).
    """

    def __init__(self, obs_path, syn_path, representation, cut: int | None = None,
                 training: bool = True, snr_min: float = 1.5, ratio_max: float = 10.0):
        import h5py

        self.representation = representation
        self.cut = cut
        self.obs = h5py.File(obs_path, "r", locking=False)
        self.syn = h5py.File(syn_path, "r", locking=False)
        n = min(len(self.obs["waveforms"]), len(self.syn["waveforms"]))

        mask = np.ones(n, bool)
        for f in (self.obs, self.syn):
            if "snr" in f:
                mask &= (f["snr"][:n] > snr_min).all(axis=-1)
            if "data_ratio" in f:
                mask &= f["data_ratio"][:n] < ratio_max
        indices = np.nonzero(mask)[0]

        rng = np.random.default_rng(seed=42)
        shuffled = rng.permutation(indices)
        n_train = int(len(indices) * 0.9)
        self.indices = shuffled[:n_train] if training else shuffled[n_train:]

    def __len__(self):
        return len(self.indices)

    def close(self):
        self.obs.close()
        self.syn.close()

    def load_batch(self, batch_indices: np.ndarray,
                   keys: tuple[str, ...] | None = None) -> dict:
        # keys accepted for BatchLoader uniformity; both waveform pairs are
        # always needed downstream, so nothing is skippable here
        idx = np.sort(self.indices[batch_indices])
        obs = self.obs["waveforms"][idx]
        syn = self.syn["waveforms"][idx]
        if self.cut:
            def fit(x):
                x = x[..., : self.cut]
                if x.shape[-1] < self.cut:
                    pad = self.cut - x.shape[-1]
                    x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
                return x

            obs, syn = fit(obs), fit(syn)
        obs = np.nan_to_num(obs)
        syn = np.nan_to_num(syn)
        return {
            "waveform": obs.astype(np.float32),
            "cond_waveform": syn.astype(np.float32),
            "signal": np.asarray(self.representation.get_representation(obs), np.float32),
            "cond_signal": np.asarray(self.representation.get_representation(syn), np.float32),
        }

    def __getitem__(self, i: int) -> dict:
        return {k: v[0] for k, v in self.load_batch(np.array([i])).items()}


def make_synthetic_dataset(
    path: str | Path,
    n: int = 64,
    channels: int = 3,
    t: int = 4096,
    seed: int = 0,
) -> Path:
    """Write a small synthetic preprocessed_waveforms.h5 honoring the
    storage contract — used by tests, benchmarks, smoke training AND the
    committed quality-loop demonstration (docs/quality).

    Unlike a pure-noise fixture, the waveforms carry a real conditioning
    structure (physically-inspired, not a simulation), so conditional
    generation is actually testable: a model must learn feature->waveform
    relationships for per-bin FID / classifier-accuracy / distance-residual
    evaluation to come out non-trivial.  Encoded dependencies:
      - P onset fixed at 5 s (reference traces are aligned on P within a
        2-7 s window, scripts/preprocessing/04_filter_waveforms.py), S
        arrives dist*(1/3.5-1/6) s later (S-P time ~ distance);
      - log-amplitude ~ 0.8*mag - 1.2*log10(dist) + 0.4*log10(760/vs30)
        (GMM-like magnitude scaling / geometric spreading / site term);
      - corner frequency decreases with magnitude and with distance (Q
        attenuation), so spectra shift with the conditioning;
      - duration grows with magnitude and distance;
      - channel roles: P is polarized to the vertical (ch 2), S to the
        horizontals (ch 0, 1).
    """
    import h5py

    rng = np.random.default_rng(seed)
    fs = 100.0
    tt = np.arange(t, dtype=np.float32) / fs

    dist = rng.uniform(10, 200, n).astype(np.float32)
    mag = rng.uniform(4.5, 7.5, n).astype(np.float32)
    vs30 = rng.uniform(200, 800, n).astype(np.float32)
    depth = rng.uniform(2, 100, n).astype(np.float32)
    azgap = rng.uniform(30, 330, n).astype(np.float32)

    p_onset = 5.0 + rng.uniform(-1.0, 1.0, n).astype(np.float32)  # P-aligned traces
    s_onset = p_onset + dist * np.float32(1 / 3.5 - 1 / 6.0)  # S-P time ~ dist
    log_amp = 0.8 * (mag - 6.0) - 1.2 * np.log10(dist / 100.0) + 0.4 * np.log10(760.0 / vs30)
    amp = (10.0 ** log_amp).astype(np.float32)
    # corner frequency: bigger events and longer paths are richer in lows
    fc = (10.0 ** (1.1 - 0.3 * (mag - 4.5) - 0.2 * np.log10(dist / 30.0))).astype(np.float32)
    tau_p = (0.5 + 0.4 * (mag - 4.5)).astype(np.float32)  # burst durations (s)
    tau_s = (1.5 + 1.2 * (mag - 4.5) + 0.015 * dist).astype(np.float32)

    def burst_envelope(onset, tau):
        # Brune-like u*exp(1-u) rise/decay, zero before onset; (n, 1, t)
        u = np.maximum(tt[None, :] - onset[:, None], 0.0) / tau[:, None]
        return (u * np.exp(1.0 - u)).astype(np.float32)[:, None, :]

    freqs_r = np.fft.rfftfreq(t, d=1 / fs).astype(np.float32)

    from scipy import fft as sfft

    def shaped_noise(fc_row, seed_noise):
        # white noise low-passed at the per-trace corner frequency (2-pole)
        # with a 0.1 Hz causal-highpass-like rolloff; (n, channels, t)
        spec = sfft.rfft(seed_noise.astype(np.float32), axis=-1, workers=-1)
        lowpass = 1.0 / (1.0 + (freqs_r[None, None, :] / fc_row[:, None, None]) ** 2)
        highpass = (freqs_r[None, None, :] / 0.1) ** 2
        highpass = highpass / (1.0 + highpass)
        spec *= (lowpass * highpass).astype(np.float32)
        return sfft.irfft(spec, n=t, axis=-1, workers=-1).astype(np.float32)

    waveforms = np.empty((n, channels, t), np.float32)
    # channel polarization: P mostly vertical (last ch), S mostly horizontal
    s_pol = np.ones(channels, np.float32)
    p_pol = np.full(channels, 0.3, np.float32)
    if channels >= 3:
        s_pol[-1], p_pol[-1] = 0.4, 1.0
    for s in range(0, n, 1024):  # chunked: rfft of the full array is ~GBs
        e = min(s + 1024, n)
        p_wave = shaped_noise(2.5 * fc[s:e], rng.standard_normal((e - s, channels, t)))
        s_wave = shaped_noise(fc[s:e], rng.standard_normal((e - s, channels, t)))
        tr = (
            0.35 * p_pol[None, :, None] * burst_envelope(p_onset[s:e], tau_p[s:e]) * p_wave
            + s_pol[None, :, None] * burst_envelope(s_onset[s:e], tau_s[s:e]) * s_wave
        )
        rms = np.sqrt(np.mean(tr**2, axis=(1, 2), keepdims=True)) + 1e-12
        waveforms[s:e] = amp[s:e, None, None] * tr / rms
    waveforms += 0.002 * rng.standard_normal((n, channels, t)).astype(np.float32)

    feats = np.stack([dist, mag, vs30, depth, azgap], axis=1)
    norm_feats = (feats - feats.mean(0)) / (feats.std(0) + 1e-8)

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("waveforms", data=waveforms)
        f.create_dataset("normalized_features", data=norm_feats.astype(np.float32))
        f.create_dataset("indices_valid_waveforms", data=np.full(n, t, dtype=np.int64))
        for name, arr in zip(
            ("hypocentral_distance", "magnitude", "vs30", "hypocentre_depth", "azimuthal_gap"),
            (dist, mag, vs30, depth, azgap),
        ):
            f.create_dataset(name, data=arr)
        # ground-truth phase arrivals (seconds) — extra keys beyond the
        # storage contract; used to validate the STA/LTA picking fallback
        # against known onsets (tests/test_preprocessing.py)
        f.create_dataset("p_onset_s", data=p_onset)
        f.create_dataset("s_onset_s", data=s_onset)
    return path
