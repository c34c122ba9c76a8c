"""tqdne-tpu: TPU-native generative seismic-waveform framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
highfem/tqdne ("This Quake Does Not Exist"): latent EDM diffusion models
that synthesize 3-component, 100 Hz seismic accelerograms conditioned on
scalar source/site features, plus the training, evaluation, data and CLI
stack around them.
"""

__version__ = "0.1.0"
