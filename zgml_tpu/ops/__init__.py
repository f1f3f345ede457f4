"""TPU compute ops: Pallas kernels with pure-jnp reference oracles.

Every hot kernel has two implementations with identical semantics:
  - ``zgml_tpu.ops.refs``  — pure jnp (the conformance oracle; the analog of the
    reference executor, src/backend/reference.zig, SURVEY.md §4.4)
  - a Pallas TPU kernel in its own module, tested against the oracle in
    interpret mode on CPU and compiled on real TPU.

Dispatch between them is via ``zgml_tpu.ops.dispatch`` (env/config controlled), so
CPU tests and TPU benchmarks run the same model code.
"""
from zgml_tpu.ops import refs  # noqa: F401
from zgml_tpu.ops.dispatch import (  # noqa: F401
    qmatmul, rmsnorm, rope_apply, flash_attention, decode_attention,
    use_pallas,
)
