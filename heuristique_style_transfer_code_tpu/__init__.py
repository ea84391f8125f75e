"""TPU-native rebuild of the `heuristique_style_transfer_code` capabilities.

A JAX / XLA / Pallas / pjit framework for style-feature (Gram matrix) weather
classification, heuristic style transfer, and realtime camera inference.

Layers (see SURVEY.md):
  core/        dtypes, PRNG, mesh & sharding setup
  ops/         XLA/Pallas kernels: conv, norm, pooling, attention, gram, resize
  nn/          functional network builders (ResNet50, patch discriminators)
  models/      the three model families as configs over nn/
  data/        imagefolder indexing, augmentation product, host loader
  parallel/    pjit/shard_map data-parallel training
  train/       jitted train/eval steps, k-fold driver
  tasks/       classification harness, style transfer, camera, tsne, clustering,
               gradcam, embeddings
  checkpoint/  npz/orbax IO + .pth converter
  config/      dataclass schemas + JSON loaders
  metrics/     classification metrics + timers
  cli/         entry points preserving the reference flag surface
"""

__version__ = "0.1.0"
