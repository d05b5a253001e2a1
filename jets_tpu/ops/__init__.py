"""Operator packs — the in-repo equivalent of the reference ecosystem's
companion packages (``JetPack``, ``JetPackDSP``, ``JetPackTransforms``,
``JetPackWaveFD``, named in ``/root/reference/docs/src/index.md:14-19``).

Submodules are importable directly (``jets_tpu.ops.diagonal`` …); the
common constructors are re-exported here for convenience.
"""
from .acquisition import blend_operator, lmo_operator, reghost_operator
from .causal import difference_operator, integration_operator, nim_operator
from .conv import conv1d_operator, convnd_operator, derivative_operator, gradient_operator
from .diagonal import diagonal_operator
from .dsp import (
    bandpass_operator,
    envelope_operator,
    mix_operator,
    roughness_operator,
    translation_operator,
    mute_operator,
    resample_operator,
    shift_operator,
    taper_operator,
)
from .elementwise import (
    atan_operator,
    cos_operator,
    exp_operator,
    log_operator,
    nonlinear_elementwise,
    power_operator,
    sigmoid_operator,
    sin_operator,
    sqrt_operator,
    square_operator,
    tanh_operator,
)
from .fft import fft_operator, rfft_operator
from .interp import interp_operator
from .matrix import matrix_operator
from .radon import radon_operator
from .stencil import blur2d_operator, laplacian_operator, stencil_operator
from .transforms import (
    circshift_operator,
    projection_operator,
    dct_operator,
    flip_operator,
    permutation_operator,
    transpose_operator,
    identity_operator,
    imag_operator,
    pad_operator,
    real_operator,
    reshape_operator,
    restriction_operator,
)
from .sampling import (
    kaiser_sinc_matrix,
    sinc_point_sampling_operator,
    sinc_sampling_operator,
)
from .wave import (
    born_operator,
    multishot_tti_wave_operator,
    multishot_vti_wave_operator,
    tti_wave_propagator,
    cpml_wave_propagator,
    multishot_wave_operator,
    offgrid_wave_propagator,
    q_wave_propagator,
    vd_wave_propagator,
    vdq_wave_propagator,
    vti_wave_propagator,
    wave_propagator,
)
from .wavelet import WAVELETS, wavelet_operator

__all__ = [
    "blend_operator",
    "lmo_operator",
    "reghost_operator",
    "difference_operator",
    "integration_operator",
    "nim_operator",
    "interp_operator",
    "envelope_operator",
    "mix_operator",
    "roughness_operator",
    "circshift_operator",
    "projection_operator",
    "translation_operator",
    "conv1d_operator",
    "convnd_operator",
    "derivative_operator",
    "gradient_operator",
    "diagonal_operator",
    "bandpass_operator",
    "mute_operator",
    "resample_operator",
    "shift_operator",
    "taper_operator",
    "atan_operator",
    "cos_operator",
    "exp_operator",
    "log_operator",
    "nonlinear_elementwise",
    "power_operator",
    "sigmoid_operator",
    "sin_operator",
    "sqrt_operator",
    "square_operator",
    "tanh_operator",
    "fft_operator",
    "rfft_operator",
    "matrix_operator",
    "radon_operator",
    "blur2d_operator",
    "laplacian_operator",
    "stencil_operator",
    "dct_operator",
    "identity_operator",
    "imag_operator",
    "pad_operator",
    "real_operator",
    "reshape_operator",
    "restriction_operator",
    "transpose_operator",
    "flip_operator",
    "permutation_operator",
    "WAVELETS",
    "wavelet_operator",
    "kaiser_sinc_matrix",
    "sinc_point_sampling_operator",
    "sinc_sampling_operator",
    "born_operator",
    "cpml_wave_propagator",
    "multishot_tti_wave_operator",
    "multishot_vti_wave_operator",
    "multishot_wave_operator",
    "offgrid_wave_propagator",
    "tti_wave_propagator",
    "q_wave_propagator",
    "vd_wave_propagator",
    "vdq_wave_propagator",
    "vti_wave_propagator",
    "wave_propagator",
]
