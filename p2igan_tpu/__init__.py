"""p2igan_tpu — TPU-native rainfall point-to-image reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
P2I-GAN benchmark reference (NTU-CompHydroMet-Lab/P2I-GAN-benchmark):
sparse-observation video-inpainting GANs for spatio-temporal rainfall
fields, with event datastores, mask generators, a GAN training loop,
sliding-window ensemble inference, and an offline evaluation suite.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
  L1 data      p2igan_tpu.data      (zarrlite store, event readers, masks, datamodule)
  L2 ops       p2igan_tpu.ops       (DOConv, spectral norm, IDW k-NN, Wendland bases, Pallas kernels)
  L3 models    p2igan_tpu.models    (p2igan / dk / stdk / simple + registry)
  L4 eval      p2igan_tpu.losses, p2igan_tpu.metrics, experiments/
  L5 orch      p2igan_tpu.training, p2igan_tpu.inference
  L6 cli       scripts/
"""

__version__ = "0.1.0"
