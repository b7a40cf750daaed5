"""Round-1 BCSR one-hot attention kernel, retired from production in round 4.

This package preserves the comparison-only kernel family (BCSR tiling, the
fused SDDMM/one-hot-matmul Pallas kernel, and its custom-VJP wrapper) that
lost to the stream/fused-stream path in every benchmark since round 2
(BENCH_r02.json: 6.29 ms vs 2.70 ms on Cora). It lives under tests/ because
the suite still uses it two ways:

* as an independent oracle (``sparse_attention._xla_forward``) for the ring
  edge-partition tests, and
* to pin the RCM reorder's effect on tile utilization (tests/test_native.py,
  tests/test_data.py).

Production dispatch no longer reaches any of this: apply_gat has exactly two
sparse paths — the fused/stream Pallas pipeline and the XLA scatter fallback
(VERDICT round 3, item 8).
"""
