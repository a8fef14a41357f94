from nngp_tpu.models.kernel_spec import (
    Dense,
    Erf,
    KernelSpec,
    Relu,
    mlp,
    reference_kernel,
)

__all__ = ["Dense", "Erf", "KernelSpec", "Relu", "mlp", "reference_kernel"]
