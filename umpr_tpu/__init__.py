"""UMPR-TPU: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of iamwinter/UMPR.

This is a from-scratch rebuild of the UMPR multi-modal recommendation framework
(paper: "Recommendation by Users' Multi-modal Preferences for Smart City
Applications", Xu et al., IEEE TII 2020) designed TPU-first:

- Static-shape batching with runtime "exists" masks that reproduce the
  reference's per-batch dynamic-padding numerics exactly under one compiled
  executable (reference: src/dataset.py:146-182 dynamic padding).
- Variable-length bidirectional GRU as a masked `lax.scan` / fused Pallas
  kernel instead of cuDNN `pack_padded_sequence` (reference: src/model.py:6-21).
- Data parallelism via `jax.sharding.Mesh` + `jit` with XLA collectives over
  ICI instead of `torch.nn.DataParallel` (reference: main.py:81-84).
- Prefetched, double-buffered host input pipeline instead of per-batch
  synchronous cv2 reads (reference: src/dataset.py:146-151).

Layout:
    config.py   -- reflection-argparse Config (flag-compatible with reference)
    text/       -- vocabulary, GloVe loading, offline preprocessing (bit-for-bit)
    data/       -- dataset construction, static-shape batching, image pipeline
    ops/        -- masked GRU (scan + Pallas), attention, masking primitives
    models/     -- ReviewNet / ControlNet / VisualNet / UMPR (Flax)
    parallel/   -- mesh + sharding definitions
    train/      -- optimizer, train/eval driver, checkpointing (Orbax)
    pretrain/   -- ABAE aspect autoencoder + R-Net pretrainer
"""

__version__ = "0.1.0"
