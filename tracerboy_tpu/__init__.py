"""tracerboy-tpu: a TPU-native physically-based progressive path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of wallisc/TracerBoy
(C++/DX12/HLSL GPU path tracer). The reference's megakernel + DXR design is
replaced by a wavefront pipeline (raygen -> traverse -> shade -> compact) over
flat ray pools, with the BVH stored as a flattened structure-of-arrays in HBM
and traversed by vectorized masked kernels. See SURVEY.md at the repo root for
the full component inventory being rebuilt.
"""

__version__ = "0.1.0"

from tracerboy_tpu.renderer import Renderer, RenderState  # noqa: F401
from tracerboy_tpu.utils.config import (  # noqa: F401
    OutputSettings,
    CameraSettings,
    PostProcessSettings,
    DenoiserSettings,
    PerformanceSettings,
    DebugSettings,
    FilterType,
    TonemapType,
    RenderMode,
    OutputType,
    default_output_settings,
)
