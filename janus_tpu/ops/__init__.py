"""JAX/XLA/Pallas compute kernels: DSP frontend + NN building blocks."""

from janus_tpu.ops.stft import frame_signal, stft, hann_window  # noqa: F401
from janus_tpu.ops.mel import mel_filterbank, log_mel_spectrogram  # noqa: F401
from janus_tpu.ops.resample import resample_poly, decimate_48k_to_16k  # noqa: F401
from janus_tpu.ops.energy import rms_energy, classify_energy  # noqa: F401
from janus_tpu.ops.yin import yin_track, mean_voiced_pitch, classify_pitch  # noqa: F401
