"""`tqdne-build-dataset` — raw_waveforms.h5 -> preprocessed_waveforms.h5.

Parity with /root/reference/experiments/build_dataset.py: drop samples
with vs30 <= 0, copy per-feature arrays and validity indices, z-score
the stacked features into `normalized_features`, transpose waveforms
(b, t, c) -> (b, c, t) in batches with NaN scrubbing.
"""

from __future__ import annotations

import argparse
import numpy as np

from tqdne_tpu import configs


def run(workdir: str, batch_size: int = 1000):
    import h5py

    config = configs.Config(workdir=workdir)
    with h5py.File(config.original_datapath, "r") as f:
        mask = f["vs30"][:] > 0
        indices = np.arange(len(mask))[mask]
        with h5py.File(config.datapath, "w") as f_new:
            features = []
            for key in config.features_keys:
                print(key, f[key].shape)
                feature = f[key][mask]
                f_new.create_dataset(key, data=feature)
                features.append(feature)

            f_new.create_dataset(
                "indices_valid_waveforms", data=f["indices_valid_waveforms"][mask]
            )

            features = np.stack(features, axis=1)
            normalized = (features - features.mean(axis=0)) / features.std(axis=0)
            f_new.create_dataset("normalized_features", data=normalized)

            _, t, channels = f["waveforms"].shape
            f_new.create_dataset("waveforms", (len(indices), channels, t))
            for i in range(0, len(indices), batch_size):
                wf = f["waveforms"][indices[i : i + batch_size], ...]
                wf = np.nan_to_num(np.swapaxes(wf, 1, 2))  # (b, t, c) -> (b, c, t)
                f_new["waveforms"][i : i + batch_size] = wf
                print(f"{min(i + batch_size, len(indices))}/{len(indices)}")


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-build-dataset", description=__doc__)
    parser.add_argument("--workdir", type=str, required=True,
                        help="working directory containing data/raw_waveforms.h5")
    args = parser.parse_args(argv)
    run(args.workdir)


if __name__ == "__main__":
    main()
