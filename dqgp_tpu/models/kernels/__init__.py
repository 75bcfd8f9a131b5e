from .outer import OUTER_KERNELS, outer_gram
from .quantum_kernel import (
    QuantumKernel,
    QuantumKernelSpec,
    create_quantum_kernel,
    gram,
    gram_and_shift_grads,
    kernel_features,
)
