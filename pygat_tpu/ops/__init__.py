"""Kernel layer: XLA baselines + Pallas TPU kernels for the three sparse
primitives GAT needs — SDDMM (per-edge logits), segment-softmax (normalize
over incoming edges), SpMM (attention-weighted aggregation).

TPU-native replacements for the reference's native ops:
* ``torch_scatter.scatter_max`` (reference layers.py:145,285) -> segment_max
  inside :mod:`pygat_tpu.ops.segment` / fused Pallas segment-softmax.
* ``SpecialSpmmFunction`` sparse matmul + dense-backward hack (reference
  layers.py:70-95) -> :mod:`pygat_tpu.ops.spmm` with a custom VJP whose
  edge-value gradient is an SDDMM, never a dense [N, N] product.
"""

from pygat_tpu.ops.segment import (  # noqa: F401
    gather_receivers,
    gather_senders,
    segment_max,
    segment_softmax_stable,
    segment_sum,
    segment_sum_receivers,
    segment_sum_senders,
    set_segment_impl,
)
from pygat_tpu.ops.spmm import spmm, spmm_graph  # noqa: F401
from pygat_tpu.ops.sddmm import sddmm, sddmm_graph  # noqa: F401
from pygat_tpu.ops.stream import (  # noqa: F401
    build_stream_layout,
    stream_scatter,
    stream_segment_sum,
)
from pygat_tpu.ops.fused_stream import (  # noqa: F401
    fused_v1_attention,
    fused_v2_attention,
    set_fused_attention,
)
from pygat_tpu.ops.panel import (  # noqa: F401
    build_panel_layout,
    panel_spmm,
    panel_spmm_graph,
)
from pygat_tpu.ops.corner import (  # noqa: F401
    corner_permute,
    permute_rows,
    plan_corner_turn,
    plan_pair,
)
from pygat_tpu.ops.large import (  # noqa: F401
    plan_csc_to_csr,
    spmm_corner_graph,
    stream_expand,
)
from pygat_tpu.ops.fused_corner import (  # noqa: F401
    fused_v1_attention_corner,
    fused_v2_attention_corner,
)
from pygat_tpu.ops.large import (  # noqa: F401
    maybe_plan_corner,
    set_corner,
)
