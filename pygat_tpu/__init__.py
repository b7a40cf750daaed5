"""pygat_tpu — a TPU-native graph-attention (GAT) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ArielleRosinski/pyGAT reference (GATv1/GATv2, dense + sparse edge-list
attention, transductive citation training, inductive PPI training),
architected TPU-first:

* static padded CSR/COO graph containers (`pygat_tpu.graph`)
* XLA + Pallas kernels for SDDMM / segment-softmax / SpMM (`pygat_tpu.ops`)
* head-batched functional GAT layers and models (`pygat_tpu.models`)
* mesh/pjit/shard_map parallelism: data-, head- and edge-partitioned
  execution with halo exchange (`pygat_tpu.parallel`)
* jitted training loops, checkpointing, early stopping (`pygat_tpu.train`)
"""

__version__ = "0.1.0"

from pygat_tpu.graph import Graph, GraphBatch  # noqa: F401
