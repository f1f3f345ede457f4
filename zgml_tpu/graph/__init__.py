from zgml_tpu.graph.tensor import LazyTensor, var, const  # noqa: F401
from zgml_tpu.graph.graph import ComputeGraph  # noqa: F401
from zgml_tpu.graph.op import Op  # noqa: F401
